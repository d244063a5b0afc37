"""Network-stack tests: reset-aware LSTM semantics, transformer memory/reset
masking, head shapes (mirrors the reference's ``demo/lstm.py:97-119`` and
``demo/transformer.py:240-291`` fixtures)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from megastep_tpu import spaces
from megastep_tpu.arrdict import arrdict
from megastep_tpu.dotdict import dotdict
from megastep_tpu.models import heads
from megastep_tpu.models.lstm import LSTM
from megastep_tpu.models.transformer import Transformer, visibility


def test_lstm_reset_equivalence():
    """A reset at step t makes steps t.. identical to a fresh-state run — the exact
    property the reference's Packer machinery exists to guarantee."""
    T, B, D = 6, 3, 8
    m = LSTM(D)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (T, B, D))
    s0 = m.initial_state(B)
    params = m.init(key, x, jnp.zeros((T, B), bool), s0)

    t_reset = 3
    reset = jnp.zeros((T, B), bool).at[t_reset].set(True)
    y_full, _ = m.apply(params, x, reset, s0)

    # Fresh run over just the tail.
    y_tail, _ = m.apply(params, x[t_reset:], jnp.zeros((T - t_reset, B), bool), s0)
    np.testing.assert_allclose(np.asarray(y_full[t_reset:]), np.asarray(y_tail),
                               rtol=1e-5, atol=1e-6)
    # And the head must differ from a no-reset run's tail.
    y_none, _ = m.apply(params, x, jnp.zeros((T, B), bool), s0)
    assert np.abs(np.asarray(y_none[t_reset:]) - np.asarray(y_full[t_reset:])).max() > 1e-6


def test_lstm_state_carry():
    """Splitting a sequence across two calls with carried state matches one call."""
    T, B, D = 6, 2, 4
    m = LSTM(D)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (T, B, D))
    reset = jnp.zeros((T, B), bool)
    s0 = m.initial_state(B)
    params = m.init(key, x, reset, s0)

    y_once, _ = m.apply(params, x, reset, s0)
    y_a, s_mid = m.apply(params, x[:3], reset[:3], s0)
    y_b, _ = m.apply(params, x[3:], reset[3:], s_mid)
    np.testing.assert_allclose(np.asarray(y_once), np.concatenate([y_a, y_b]),
                               rtol=1e-5, atol=1e-6)


def test_visibility_reset_masking():
    """Keys before an episode boundary are invisible to queries after it
    (the reference's ResetMasker semantics, ``transformer.py:48-78``)."""
    M, B, T = 2, 1, 4
    mem_reset = jnp.zeros((M, B), bool)
    mem_valid = jnp.ones((M, B), bool)
    reset = jnp.zeros((T, B), bool).at[2].set(True)

    vis = visibility(mem_reset, mem_valid, reset, mem_len=10)  # (T, M+T, B)
    v = np.asarray(vis[..., 0])
    # Query t=1 (abs pos 3) sees memory and steps 0..1.
    assert v[1, :4].all() and not v[1, 4:].any()
    # Query t=2 (the reset step) sees only itself.
    assert v[2, 4] and not v[2, :4].any() and not v[2, 5:].any()
    # Query t=3 sees steps 2..3 but nothing before the boundary.
    assert v[3, 4] and v[3, 5] and not v[3, :4].any()


def test_visibility_invalid_memory():
    """Unfilled memory slots are never visible."""
    M, B, T = 3, 2, 2
    vis = visibility(jnp.zeros((M, B), bool), jnp.zeros((M, B), bool),
                     jnp.zeros((T, B), bool), mem_len=10)
    assert not np.asarray(vis[:, :M]).any()


def test_transformer_memory_carry():
    """With memory, the second chunk attends into the first chunk's activations."""
    B, D = 2, 8
    m = Transformer(D, mem_len=4, n_layers=1)
    key = jax.random.PRNGKey(2)
    x1 = jax.random.normal(key, (3, B, D))
    x2 = jax.random.normal(jax.random.fold_in(key, 1), (3, B, D))
    reset = jnp.zeros((3, B), bool)
    s0 = m.initial_state(B)
    params = m.init(key, x1, reset, s0)

    _, s1 = m.apply(params, x1, reset, s0)
    y_with_mem, _ = m.apply(params, x2, reset, s1)
    y_fresh, _ = m.apply(params, x2, reset, s0)
    assert np.abs(np.asarray(y_with_mem) - np.asarray(y_fresh)).max() > 1e-6

    # But if every env resets at the chunk head, memory must be invisible.
    reset_head = reset.at[0].set(True)
    y_reset, _ = m.apply(params, x2, reset_head, s1)
    y_reset_fresh, _ = m.apply(params, x2, reset_head, s0)
    np.testing.assert_allclose(np.asarray(y_reset), np.asarray(y_reset_fresh),
                               rtol=1e-5, atol=1e-6)


def test_intake_output_shapes():
    obs_space = dotdict(
        rgb=spaces.MultiImage(1, 3, 1, 64),
        imu=spaces.MultiVector(1, 3))
    action_space = spaces.MultiDiscrete(1, 7)
    T, B, W = 2, 3, 16

    obs = dotdict(rgb=jnp.zeros((T, B, 1, 3, 1, 64)), imu=jnp.zeros((T, B, 1, 3)))
    m = heads.intake(obs_space, W)
    params = m.init(jax.random.PRNGKey(0), obs)
    y = m.apply(params, obs)
    assert y.shape == (T, B, W)

    out = heads.output(action_space, W)
    oparams = out.init(jax.random.PRNGKey(1), y)
    logits = out.apply(oparams, y)
    assert logits.shape == (T, B, 1, 7)
    np.testing.assert_allclose(np.asarray(jnp.exp(logits).sum(-1)), 1., rtol=1e-5)

    actions = out.sample(jax.random.PRNGKey(2), logits)
    assert actions.shape == (T, B, 1)
    assert out.sample(None, logits, test=True).shape == (T, B, 1)


def test_value_output():
    v = heads.ValueOutput(8)
    x = jnp.ones((4, 8))
    params = v.init(jax.random.PRNGKey(0), x)
    assert v.apply(params, x).shape == (4,)
