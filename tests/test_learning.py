"""RL-math tests: V-trace/GAE/reward-to-go vs the naive oracle and the reference's
hand fixtures (mirrors ``/root/reference/megastep/demo/learning.py:93-159``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from megastep_tpu.demo import learning


def test_v_trace_fixture():
    ratios = jnp.array([1., 1., 1.])
    reward = jnp.array([1., 2., 3.])
    value = jnp.array([4., 5., 6.])

    reset = jnp.array([False, False, False])
    actual = learning.v_trace(ratios, value, reward, reset, gamma=1.)
    np.testing.assert_allclose(np.asarray(actual), [11., 9., 6.], rtol=1e-6)

    reset = jnp.array([False, True, False])
    actual = learning.v_trace(ratios, value, reward, reset, gamma=1.)
    np.testing.assert_allclose(np.asarray(actual), [2., 9., 6.], rtol=1e-6)


def test_v_trace_ref_fixture():
    ratios = np.array([1., 1., 1.])
    reward = np.array([1., 2., 3.])
    value = np.array([4., 5., 6.])

    actual = learning.v_trace_ref(ratios, value, reward, np.array([False] * 3), gamma=1.)
    np.testing.assert_allclose(actual, [11., 9., 6.])

    actual = learning.v_trace_ref(ratios, value, reward, np.array([False, True, False]), gamma=1.)
    np.testing.assert_allclose(actual, [2., 9., 6.])


def test_v_trace_equivalent():
    """The scan implementation matches the naive O(T²) oracle on random cases
    (reference ``test_v_trace_equivalent``)."""
    R, T = 50, 10
    rng = np.random.RandomState(0)
    for _ in range(R):
        ratios = rng.rand(T).astype(np.float32)
        value = rng.rand(T).astype(np.float32)
        reward = rng.rand(T).astype(np.float32)
        reset = rng.rand(T) > .8
        gamma = float(rng.rand())

        expected = learning.v_trace_ref(ratios, value, reward, reset, gamma)
        actual = learning.v_trace(
            jnp.asarray(ratios), jnp.asarray(value), jnp.asarray(reward),
            jnp.asarray(reset), gamma)
        np.testing.assert_allclose(np.asarray(actual), expected, rtol=1e-4, atol=1e-5)


def test_reward_to_go():
    reward = jnp.array([1., 2., 3.])
    value = jnp.array([4., 5., 6.])

    actual = learning.reward_to_go(reward, value, jnp.array([False] * 3), gamma=1.)
    np.testing.assert_allclose(np.asarray(actual), [11., 9., 6.])

    actual = learning.reward_to_go(reward, value, jnp.array([False, True, False]), gamma=1.)
    np.testing.assert_allclose(np.asarray(actual), [2., 9., 6.])


def test_generalized_advantages():
    reward = jnp.array([1., 2., 3.])
    value = jnp.array([4., 5., 6.])

    adv = learning.generalized_advantages(
        value, reward, value, jnp.array([False] * 3), gamma=1., lambd=1.)
    np.testing.assert_allclose(np.asarray(adv), [7., 4., 0.])

    adv = learning.generalized_advantages(
        value, reward, value, jnp.array([False, True, False]), gamma=1., lambd=1.)
    np.testing.assert_allclose(np.asarray(adv), [-2., 4., 0.])


def test_batched_v_trace():
    """The scan vectorizes over trailing batch dims."""
    T, B = 8, 5
    rng = np.random.RandomState(1)
    ratios = rng.rand(T, B).astype(np.float32)
    value = rng.rand(T, B).astype(np.float32)
    reward = rng.rand(T, B).astype(np.float32)
    reset = rng.rand(T, B) > .8

    batched = learning.v_trace(
        jnp.asarray(ratios), jnp.asarray(value), jnp.asarray(reward),
        jnp.asarray(reset), gamma=.9)
    for b in range(B):
        single = learning.v_trace_ref(ratios[:, b], value[:, b], reward[:, b],
                                      reset[:, b], gamma=.9)
        np.testing.assert_allclose(np.asarray(batched[:, b]), single, rtol=1e-4, atol=1e-5)


def test_gather_flatten():
    from megastep_tpu.dotdict import dotdict
    logits = jnp.arange(12, dtype=jnp.float32).reshape(2, 3, 2)
    actions = jnp.array([[0, 1, 0], [1, 0, 1]])
    out = learning.gather(logits, actions)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(out[0]), [0., 3., 4.])

    tree = dotdict(a=jnp.ones((2, 3)), b=jnp.zeros((2, 1)))
    flat = learning.flatten(tree)
    assert flat.shape == (2, 4)
