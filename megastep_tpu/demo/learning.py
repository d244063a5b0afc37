"""RL math: TD deltas, discounted returns, GAE, and V-trace.

Counterpart of the reference ``megastep/demo/learning.py:5-91``: identical semantics
(including the reset conventions — ``reset[t]`` means state ``t`` began a new
episode, so no value flows across ``t-1 → t``), with the reverse-time recurrences
written as ``lax.scan`` instead of Python loops so they compile into single fused
device programs.

``v_trace_ref`` is the naive O(T²) oracle the tests validate against, mirroring the
reference's test strategy (``learning.py:75-91``).
"""
import numpy as np
import jax
import jax.numpy as jnp


def batch_indices(n_envs, batch_size, T, key):
    """Random partition of env indices into learner minibatches of
    ``batch_size // T`` envs each (reference ``learning.py:5-10``)."""
    batch_width = max(batch_size // T, 1)
    indices = jax.random.permutation(key, n_envs)
    return [indices[i:i + batch_width] for i in range(0, n_envs, batch_width)]


def gather(arr, indices):
    """Gathers along the final axis, treewise (reference ``learning.py:12-15``)."""
    if isinstance(arr, dict):
        return type(arr)({k: gather(arr[k], indices[k]) for k in arr})
    return jnp.take_along_axis(arr, indices.astype(jnp.int32)[..., None], -1)[..., 0]


def flatten(arr):
    """Concatenates tree leaves along the final axis (reference ``learning.py:17-20``)."""
    if isinstance(arr, dict):
        return jnp.concatenate([flatten(v) for v in arr.values()], -1)
    return arr


def deltas(value, reward, target, reset, gamma=.99):
    """One-step TD errors ``r + γ·target' − value`` with resets cutting the bootstrap
    (reference ``learning.py:26-29``)."""
    reward, reset = reward[1:], reset[1:]
    regular = (reward + gamma * target[1:]) - value[:-1]
    return jnp.where(reset, reward - value[:-1], regular)


def present_value(dv, finals, reset, alpha):
    """Reverse discounted accumulation: ``acc[t] = dv[t] + α·(1−reset[t])·acc[t+1]``
    seeded with ``finals`` (reference ``learning.py:31-40``), as a reverse scan."""
    def step(acc, inp):
        dv_t, reset_t = inp
        acc = dv_t + acc * alpha * (1 - reset_t.astype(dv_t.dtype))
        return acc, acc
    _, out = jax.lax.scan(step, finals, (dv, reset), reverse=True)
    return out


def generalized_advantages(value, reward, v, reset, gamma, lambd=.97):
    """GAE(γ, λ) with terminal advantage zero (reference ``learning.py:42-47``)."""
    dv = deltas(value, reward, v, reset, gamma=gamma)
    finals = jnp.zeros_like(dv[-1])
    adv = jnp.concatenate(
        [present_value(dv, finals, reset[1:], lambd * gamma), finals[None]], 0)
    return jax.lax.stop_gradient(adv)


def reward_to_go(reward, value, reset, gamma):
    """Discounted returns bootstrapped from the final value
    (reference ``learning.py:49-50``)."""
    out = jnp.concatenate(
        [present_value(reward[1:], value[-1], reset[1:], gamma), value[-1:]], 0)
    return jax.lax.stop_gradient(out)


def v_trace(ratios, value, reward, reset, gamma, max_rho=1, max_c=1):
    """V-trace value targets with clipped importance weights ρ and c
    (IMPALA; reference ``learning.py:52-69``)."""
    rho = jnp.clip(ratios, 0, max_rho)
    c = jnp.clip(ratios, 0, max_c)
    dV = rho[:-1] * deltas(value, reward, value, reset, gamma=gamma)

    discount = (1 - reset[1:].astype(value.dtype)) * gamma
    A = value[:-1] + dV - discount * c[:-1] * value[1:]
    B = discount * c[:-1]

    def step(v_next, inp):
        a, b = inp
        v_t = a + b * v_next
        return v_t, v_t
    _, head = jax.lax.scan(step, value[-1], (A, B), reverse=True)
    return jax.lax.stop_gradient(jnp.concatenate([head, value[-1:]], 0))


def v_trace_ref(ratios, value, reward, reset, gamma=.99, max_rho=1, max_c=1):
    """Naive O(T²) numpy V-trace oracle for testing (reference
    ``learning.py:75-91``)."""
    ratios, value, reward, reset = map(np.asarray, (ratios, value, reward, reset))
    rho = ratios.clip(0, max_rho)
    c = ratios.clip(0, max_c)

    v = value.copy().astype(float)
    for s in range(len(v) - 1):
        for t in range(s, len(v) - 1):
            prod_c = c[s:t].prod()
            if reset[t + 1]:
                dV = rho[t] * (reward[t + 1] - value[t])
                v[s] += gamma**(t - s) * prod_c * dV
                break
            else:
                dV = rho[t] * (reward[t + 1] + gamma * value[t + 1] - value[t])
                v[s] += gamma**(t - s) * prod_c * dV
    return v
