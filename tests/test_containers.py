import numpy as np
import jax
import jax.numpy as jnp
import pytest

from megastep_tpu.dotdict import dotdict
from megastep_tpu.arrdict import arrdict, stack, cat, jaxify, numpyify, postpad


def test_dotdict_attr_access():
    d = dotdict(a=1, b=dotdict(c=2))
    assert d.a == 1
    assert d.b.c == 2
    with pytest.raises(AttributeError):
        d.missing


def test_dotdict_map_starmap_pipe():
    d = dotdict(a=1, b=dotdict(c=2))
    assert d.map(lambda x: x + 1) == dotdict(a=2, b=dotdict(c=3))
    assert d.starmap(lambda x, y: x + y, d) == dotdict(a=2, b=dotdict(c=4))
    assert d.pipe(len) == 2


def test_dotdict_method_forwarding():
    d = dotdict(a=np.array([1., 2.]), b=np.array([3., 4.]))
    sums = d.sum()
    assert sums.a == 3. and sums.b == 7.


def test_arrdict_indexing():
    d = arrdict(a=np.arange(10), b=np.arange(10) * 2)
    assert d[3].a == 3 and d[3].b == 6
    assert (d[2:4].b == np.array([4, 6])).all()


def test_arrdict_binary_ops():
    d = arrdict(a=np.array([1., 2.]))
    assert ((d + 1).a == np.array([2., 3.])).all()
    assert ((1 + d).a == np.array([2., 3.])).all()
    assert ((d + d).a == np.array([2., 4.])).all()
    assert ((d < 2).a == np.array([True, False])).all()


def test_arrdict_stack_cat():
    ds = [arrdict(a=np.array([i, i])) for i in range(3)]
    assert stack(ds).a.shape == (3, 2)
    assert cat(ds).a.shape == (6,)


def test_arrdict_is_pytree():
    d = arrdict(a=jnp.ones(3), b=arrdict(c=jnp.zeros(2)))
    leaves = jax.tree_util.tree_leaves(d)
    assert len(leaves) == 2
    out = jax.jit(lambda t: t.map(lambda x: x * 2))(d)
    assert isinstance(out, arrdict)
    assert (out.a == 2).all()


def test_arrdict_vmap_scan():
    d = arrdict(x=jnp.arange(6.).reshape(3, 2))

    def step(carry, el):
        return carry + el.x.sum(), el.x * 0
    total, _ = jax.lax.scan(step, 0., d)
    assert total == 15.


def test_jaxify_numpyify_roundtrip():
    d = arrdict(a=np.arange(3, dtype=np.int64), b=np.ones(2, dtype=np.float64))
    j = jaxify(d)
    assert j.a.dtype == jnp.int32 and j.b.dtype == jnp.float32
    n = numpyify(j)
    assert isinstance(n.a, np.ndarray)


def test_postpad():
    x = np.ones((3, 2))
    assert postpad(x, 5).shape == (5, 2)
    assert postpad(x, 4, axis=1).shape == (3, 4)
