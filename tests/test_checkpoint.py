"""Orbax sharded-checkpoint round-trip (megastep_tpu.parallel.checkpoint)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from megastep_tpu.arrdict import arrdict
from megastep_tpu.parallel import checkpoint


def test_save_restore_roundtrip(tmp_path):
    carry = arrdict(
        params={'w': jnp.arange(6.).reshape(2, 3), 'b': jnp.zeros(3)},
        step_count=jnp.asarray(7))
    step = checkpoint.save(tmp_path / 'ckpt', 3, carry)
    assert step == 3
    assert checkpoint.latest_step(tmp_path / 'ckpt') == 3

    target = jax.tree_util.tree_map(jnp.zeros_like, carry)
    restored = checkpoint.restore(tmp_path / 'ckpt', target)
    np.testing.assert_allclose(np.asarray(restored.params['w']),
                               np.arange(6.).reshape(2, 3))
    assert int(restored.step_count) == 7


def test_restore_missing(tmp_path):
    assert checkpoint.restore(tmp_path / 'none', {'x': jnp.zeros(2)}) is None


def test_train_full_checkpoint_resume(tmp_path, monkeypatch):
    """train(full_checkpoint=...) saves the whole carry and a fresh train()
    resumes from it with identical state (demo/train.py)."""
    monkeypatch.chdir(tmp_path)
    import numpy as np
    import jax
    from megastep_tpu.rebar import fsm
    import importlib
    dt = importlib.import_module('megastep_tpu.demo.train')

    ckpt = str(tmp_path / 'carry-ckpt')
    env = fsm.MatchCoin(8)
    carry1 = dt.train(env=env, width=8, steps=2, run_name='ck-run-1',
                      buffer_size=4, batch_size=16, full_checkpoint=ckpt,
                      checkpoint_every=2)

    from megastep_tpu.parallel import checkpoint as ck
    assert ck.latest_step(ckpt) == 2

    env2 = fsm.MatchCoin(8)
    carry2 = dt.train(env=env2, width=8, steps=0, run_name='ck-run-2',
                      buffer_size=4, batch_size=16, full_checkpoint=ckpt)
    # steps=0: the second train() only restores — the carries must match.
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(carry1.params),
            jax.tree_util.tree_leaves_with_path(carry2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p1))
    np.testing.assert_array_equal(np.asarray(carry1.env_state.token),
                                  np.asarray(carry2.env_state.token))

    # A resumed run continues step numbering, so new checkpoints are written
    # (orbax silently drops saves at steps <= latest otherwise).
    dt.train(env=fsm.MatchCoin(8), width=8, steps=2, run_name='ck-run-3',
             buffer_size=4, batch_size=16, full_checkpoint=ckpt,
             checkpoint_every=2)
    assert ck.latest_step(ckpt) == 4
