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
