"""Ragged-array tests (mirrors the reference's inline tests,
``/root/reference/megastep/ragged.py:77-103``)."""
import numpy as np
import jax.numpy as jnp
import pytest

from megastep_tpu.ragged import Ragged, RaggedNumpy


@pytest.fixture
def r():
    vals = np.arange(10)
    widths = np.array([3, 0, 4, 3])
    return Ragged(vals, widths)


def test_derived_indices(r):
    np.testing.assert_array_equal(r.starts, [0, 3, 3, 7])
    np.testing.assert_array_equal(r.ends, [3, 3, 7, 10])
    np.testing.assert_array_equal(r.inverse, [0, 0, 0, 2, 2, 2, 2, 3, 3, 3])


def test_int_indexing(r):
    np.testing.assert_array_equal(r[0], [0, 1, 2])
    np.testing.assert_array_equal(r[1], [])
    np.testing.assert_array_equal(r[2], [3, 4, 5, 6])


def test_slice_indexing(r):
    s = r[1:3]
    assert len(s) == 2
    np.testing.assert_array_equal(s.widths, [0, 4])
    np.testing.assert_array_equal(s[1], [3, 4, 5, 6])


def test_width_mismatch():
    with pytest.raises(AssertionError):
        Ragged(np.arange(5), np.array([3, 3]))


def test_jax_roundtrip(r):
    j = r.jaxify()
    np.testing.assert_array_equal(np.asarray(j.inverse), r.inverse)
    back = j.numpyify()
    np.testing.assert_array_equal(back.vals, r.vals)


def test_jax_factory():
    j = Ragged(jnp.arange(6), jnp.array([2, 4]))
    np.testing.assert_array_equal(np.asarray(j.starts), [0, 2])
    np.testing.assert_array_equal(np.asarray(j.inverse), [0, 0, 1, 1, 1, 1])


def test_padded(r):
    vals, mask = r.padded()
    assert vals.shape == (4, 4)
    np.testing.assert_array_equal(mask.sum(1), r.widths)
    np.testing.assert_array_equal(vals[2], [3, 4, 5, 6])
    np.testing.assert_array_equal(vals[0, :3], [0, 1, 2])
