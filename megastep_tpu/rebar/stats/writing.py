"""Stat writers, with deferred device-array batching.

Counterpart of the reference ``rebar/stats/writing.py``. The key performance device
carries over directly: inside a ``defer()`` block, recorded device arrays are only
*queued*; at block exit they're concatenated per-dtype and fetched with **one**
device→host transfer, instead of one sync per metric
(reference ``writing.py:56-125``).

Writer functions are generated per category: ``mean('loss', x)``,
``rate('sample-rate', n)``, etc.
"""
from contextlib import contextmanager
from functools import partial

import numpy as np

try:
    import jax
    import jax.numpy as jnp
    _HAVE_JAX = True
except ImportError:  # pragma: no cover
    _HAVE_JAX = False

from .. import numpy as rnumpy
from . import categories

__all__ = ['to_dir', 'defer', 'record']

WRITER = None


@contextmanager
def to_dir(run_name):
    global WRITER
    old = WRITER
    WRITER = rnumpy.Writer(run_name, 'stats')
    try:
        yield
    finally:
        WRITER = old


def _is_device_array(x):
    return _HAVE_JAX and isinstance(x, jax.Array)


def clean(x):
    if _is_device_array(x):
        x = np.asarray(x)
    if isinstance(x, np.ndarray) and x.ndim == 0:
        x = x.item()
    if isinstance(x, dict):
        return {k: clean(v) for k, v in x.items()}
    return x


def _write(category, field, args, kwargs):
    row = categories.CATEGORIES[category].row(*args, **kwargs)
    row = {'_time': np.datetime64('now'), **row}
    WRITER.write(f'{category}/{field}', row)


def eager_record(category, field, *args, **kwargs):
    if WRITER is None:
        return
    if not isinstance(field, str):
        raise ValueError(f'Field should be a string, is actually {field}')
    args = tuple(clean(a) for a in args)
    kwargs = {k: clean(v) for k, v in kwargs.items()}
    _write(category, field, args, kwargs)


_record = eager_record
QUEUE = None


def record(*args, **kwargs):
    return _record(*args, **kwargs)


def deferred_record(category, field, *args, **kwargs):
    if not isinstance(field, str):
        raise ValueError(f'Field should be a string, is actually {field}')
    QUEUE.append((category, field, args, kwargs))


def _mono_getter(collection, x):
    """Registers a flattened device array in the per-dtype collection; returns a
    closure recovering it from the concatenated fetch."""
    dtype = np.dtype(x.dtype)
    bucket = collection.setdefault(dtype, [])
    start = sum(int(np.prod(c.shape)) for c in bucket)
    end = start + int(np.prod(x.shape))
    bucket.append(x.reshape(-1))

    def get(fetched):
        return fetched[dtype][start:end].reshape(x.shape)
    return get


def _dummy_getter(x):
    return lambda fetched: x


def _multi_getter(collection, *args, **kwargs):
    arggetters = [(_mono_getter(collection, a) if _is_device_array(a)
                   else _dummy_getter(a)) for a in args]
    kwarggetters = {k: (_mono_getter(collection, v) if _is_device_array(v)
                        else _dummy_getter(v)) for k, v in kwargs.items()}

    def get(fetched):
        return (tuple(g(fetched) for g in arggetters),
                {k: g(fetched) for k, g in kwarggetters.items()})
    return get


def _gather(queue):
    collection = {}
    getters = []
    for category, field, args, kwargs in queue:
        getters.append((category, field, _multi_getter(collection, *args, **kwargs)))
    # One concatenate + one transfer per dtype.
    fetched = {dt: np.asarray(jnp.concatenate(vs)) for dt, vs in collection.items()}
    return fetched, getters


@contextmanager
def defer():
    """Queues all records inside the block; flushes with one device→host copy per
    dtype at exit."""
    global _record, QUEUE
    _record = deferred_record
    QUEUE = []
    try:
        yield
    finally:
        fetched, getters = _gather(QUEUE)
        for category, field, getter in getters:
            args, kwargs = getter(fetched)
            args = tuple(clean(a) for a in args)
            kwargs = {k: clean(v) for k, v in kwargs.items()}
            if WRITER is not None:
                _write(category, field, args, kwargs)
        QUEUE = None
        _record = eager_record


for _c in categories.CATEGORIES:
    globals()[_c] = partial(record, _c)
    __all__.append(_c)
