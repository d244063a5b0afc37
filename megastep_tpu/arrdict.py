"""Array-valued dotdicts, registered as JAX pytrees.

Counterpart of the reference ``rebar/arrdict.py`` (``/root/reference/rebar/arrdict.py:
11-162``): a :class:`~megastep_tpu.dotdict.dotdict` whose values are arrays, supporting
leafwise indexing, arithmetic, ``stack``/``cat``, and conversion between numpy and
device arrays. Being a registered pytree, an ``arrdict`` can be passed directly through
``jax.jit``/``vmap``/``lax.scan`` — this replaces the reference's mutable
torch-tensor trees with immutable functional state.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .dotdict import dotdict, mapping, starmapping

__all__ = ['arrdict', 'stack', 'cat', 'jaxify', 'numpyify', 'clone', 'postpad']

_BINARY = ['add', 'sub', 'mul', 'truediv', 'floordiv', 'mod', 'pow',
           'and', 'or', 'xor', 'lt', 'le', 'gt', 'ge', 'eq', 'ne',
           'matmul', 'lshift', 'rshift']


class arrdict(dotdict):
    """A dotdict of arrays. Indexing with a non-string key indexes every leaf;
    arithmetic operators broadcast leafwise (against scalars, arrays, or parallel
    arrdicts)."""

    def __getitem__(self, x):
        if isinstance(x, str):
            return super().__getitem__(x)
        return type(self)({k: v[x] for k, v in self.items()})

    def __setitem__(self, x, y):
        # String keys assign an item; any other key writes leafwise (numpy only —
        # device arrays are immutable, use .at[] functional updates instead).
        if isinstance(x, str):
            super().__setitem__(x, y)
        elif isinstance(y, type(self)):
            for k in self:
                self[k][x] = y[k]
        else:
            raise ValueError('Leafwise setitem needs an arrdict of matching values')

    def __binary_op__(self, name, rhs):
        if isinstance(rhs, dict):
            return self.starmap(name, rhs)
        return self.map(name, rhs)


def _bind(name):
    dunder = f'__{name}__'
    def op(self, rhs):
        return self.__binary_op__(dunder, rhs)
    setattr(arrdict, dunder, op)
    if name not in ('lt', 'le', 'gt', 'ge', 'eq', 'ne', 'matmul'):
        rdunder = f'__r{name}__'
        def rop(self, lhs):
            return self.__binary_op__(rdunder, lhs)
        setattr(arrdict, rdunder, rop)


for _name in _BINARY:
    _bind(_name)


# Pytree registration flattens in *sorted* key order so that two arrdicts with the
# same keys have identical treedefs regardless of insertion order — otherwise
# lax.scan/jit would reject e.g. a step function whose output arrdict was built in a
# different order than its input.
def _sorted_keys(d):
    return tuple(sorted(d.keys()))


def _keys_and_children(d):
    keys = _sorted_keys(d)
    return [(jax.tree_util.DictKey(k), d[k]) for k in keys], keys


jax.tree_util.register_pytree_with_keys(
    arrdict,
    flatten_with_keys=_keys_and_children,
    unflatten_func=lambda keys, children: arrdict(zip(keys, children)),
    flatten_func=lambda d: (tuple(d[k] for k in _sorted_keys(d)), _sorted_keys(d)),
)


@mapping
def jaxify(x):
    """Converts a tree of numpy arrays/scalars to device arrays. Float64 is narrowed
    to float32 and int64 to int32, matching TPU-native widths."""
    if isinstance(x, (jnp.ndarray, jax.Array)):
        return x
    a = np.asarray(x)
    if a.dtype == np.float64:
        a = a.astype(np.float32)
    elif a.dtype == np.int64:
        a = a.astype(np.int32)
    return jnp.asarray(a)


@mapping
def numpyify(x):
    """Converts a tree of device arrays back to numpy."""
    if isinstance(x, (jnp.ndarray, jax.Array)):
        return np.asarray(x)
    return x


@mapping
def clone(x):
    """Copies a tree of arrays. Device arrays are immutable so are returned as-is;
    numpy leaves are copied."""
    if isinstance(x, np.ndarray):
        return x.copy()
    return x


def _treedef(x):
    return jax.tree_util.tree_structure(x) if isinstance(x, dict) else None


def stack(xs, axis=0):
    """Stacks a sequence of parallel trees leafwise along a new axis."""
    first = xs[0]
    if isinstance(first, dict):
        return type(first)({k: stack([x[k] for x in xs], axis) for k in first})
    if isinstance(first, (jnp.ndarray, jax.Array)):
        return jnp.stack(xs, axis)
    return np.stack(xs, axis)


def cat(xs, axis=0):
    """Concatenates a sequence of parallel trees leafwise along an existing axis."""
    first = xs[0]
    if isinstance(first, dict):
        return type(first)({k: cat([x[k] for x in xs], axis) for k in first})
    if isinstance(first, (jnp.ndarray, jax.Array)):
        return jnp.concatenate(xs, axis)
    return np.concatenate(xs, axis)


def postpad(x, length, axis=0, value=0):
    """Pads a numpy array with ``value`` at the end of ``axis`` up to ``length``.

    The workhorse of the ragged-to-padded scene compilation: per-env variable-length
    wall/light/texel arrays are padded to a common static shape so the whole env batch
    is one fixed-shape device array (see SURVEY.md §7)."""
    pad = length - x.shape[axis]
    assert pad >= 0, f'Cannot pad axis {axis} of shape {x.shape} down to {length}'
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=value)
