"""FSM testbed tests: builder tables, value-iteration oracle, step dynamics
(mirrors the role of ``/root/reference/rebar/fsm.py``)."""
import numpy as np
import jax
import jax.numpy as jnp

from megastep_tpu.arrdict import arrdict
from megastep_tpu.rebar import fsm


def test_builder_tables():
    t = (fsm.Builder()
         .state('start', obs=0., start=1.).to('end', reward=1.)
         .build())
    assert t.n_states == 2
    assert t.n_actions == 1
    i = t.indices['start']
    assert t.start[i] == 1.
    assert t.reward[i, 0] == 1.
    assert t.terminal[t.indices['end']]


def test_solve_chain():
    """Value iteration on ObliviousChain: V(state i) = gamma^(n-1-i)."""
    n = 4
    env = fsm.ObliviousChain(8, n=n)
    soln = env.solve(gamma=.9, eps=1e-6)
    names = {env._names[i]: i for i in range(env.n_states)}
    for i in range(n):
        idx = names[str(i)] if str(i) in names else names[i]
        np.testing.assert_allclose(soln.value[idx], .9**(n - 1 - i), atol=1e-3)


def test_step_reward():
    env = fsm.ObliviousConstantReward(16)
    key = jax.random.PRNGKey(0)
    state, world = env.reset(key)
    assert world.reset.all()
    decision = arrdict(actions=jnp.zeros((16, 1), jnp.int32))
    state, world = jax.jit(env.step)(state, decision, key)
    # Every env moves start -> end, collecting reward 1 and resetting.
    np.testing.assert_allclose(np.asarray(world.reward), 1.)
    assert bool(world.reset.all())


def test_match_coin_oracle():
    env = fsm.MatchCoin(4)
    soln = env.solve(gamma=1.)
    # Optimal policy earns +1 from both coin states.
    for name in ('heads', 'tails'):
        idx = env._indices[name]
        np.testing.assert_allclose(soln.value[idx], 1., atol=1e-2)


def test_scan_rollout():
    """FSM envs compose with lax.scan like the geometric envs."""
    env = fsm.ObliviousCoin(8)
    key = jax.random.PRNGKey(1)
    state, world = env.reset(key)

    def step(carry, key_t):
        state, world = carry
        decision = arrdict(actions=jnp.zeros((8, 1), jnp.int32))
        state, world = env.step(state, decision, key_t)
        return (state, world), world.reward

    (_, _), rewards = jax.jit(
        lambda c, ks: jax.lax.scan(step, c, ks))((state, world), jax.random.split(key, 10))
    assert rewards.shape == (10, 8)
    assert set(np.unique(np.asarray(rewards))) <= {-1., 1.}
