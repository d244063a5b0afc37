"""Register plain classes as JAX pytrees by naming their array fields.

Why this exists: a jitted function that *closes over* an env object bakes every
device array it touches (the whole padded scenery) into the compiled program as
literal constants — megabytes of HLO at small batches, and a hard failure at large
ones. Registering envs and modules as pytrees lets callers pass them *through* the
jit boundary as arguments instead (``jax.jit(lambda env, ...: env.step(...))``), so
scenery and spawn tables stay runtime buffers.

Usage::

    @pytree('core', '_spawns')
    class RandomSpawns: ...

Fields named in the decorator become pytree children; everything else in
``__dict__`` is auxiliary (static) data compared by ``==`` for jit caching.
"""
import jax
import numpy as np


class _Static:
    """Hashable wrapper for the aux __dict__ (compared by value)."""

    __slots__ = ('d',)

    def __init__(self, d):
        self.d = d

    def __hash__(self):
        return hash(tuple(sorted(self.d)))

    def __eq__(self, other):
        if not isinstance(other, _Static) or set(self.d) != set(other.d):
            return False
        for k, v in self.d.items():
            w = other.d[k]
            if isinstance(v, np.ndarray) or isinstance(w, np.ndarray):
                if not (isinstance(v, np.ndarray) and isinstance(w, np.ndarray)
                        and v.shape == w.shape and (v == w).all()):
                    return False
            elif v != w:
                return False
        return True


def pytree(*array_fields):
    """Class decorator registering ``array_fields`` as pytree children."""
    fields = tuple(array_fields)

    def deco(cls):
        def flatten_with_keys(obj):
            children = tuple((jax.tree_util.GetAttrKey(f), getattr(obj, f))
                             for f in fields)
            aux = {k: v for k, v in obj.__dict__.items() if k not in fields}
            return children, _Static(aux)

        def flatten(obj):
            children = tuple(getattr(obj, f) for f in fields)
            aux = {k: v for k, v in obj.__dict__.items() if k not in fields}
            return children, _Static(aux)

        def unflatten(aux, children):
            obj = object.__new__(cls)
            obj.__dict__.update(aux.d)
            for f, c in zip(fields, children):
                obj.__dict__[f] = c
            return obj

        jax.tree_util.register_pytree_with_keys(
            cls, flatten_with_keys, unflatten, flatten_func=flatten)
        return cls

    return deco
