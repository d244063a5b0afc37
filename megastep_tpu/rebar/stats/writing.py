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


def _flush(queue):
    """Replaces every queued device array with its host value, using ONE
    device→host transfer per dtype.

    The whole queue is treated as a single pytree: its device-array leaves
    (wherever they sit — positional args, kwargs, nested dicts) are flattened,
    concatenated per dtype, fetched once, split back by running offset, and
    the queue is rebuilt with host values in place.
    """
    if not _HAVE_JAX:
        return queue
    leaves, treedef = jax.tree_util.tree_flatten(queue)
    by_dtype = {}
    for i, leaf in enumerate(leaves):
        if _is_device_array(leaf):
            by_dtype.setdefault(np.dtype(leaf.dtype), []).append(i)
    for idxs in by_dtype.values():
        host = np.asarray(jnp.concatenate([leaves[i].reshape(-1)
                                           for i in idxs]))
        offset = 0
        for i in idxs:
            shape = leaves[i].shape
            size = int(np.prod(shape))
            leaves[i] = host[offset:offset + size].reshape(shape)
            offset += size
    return jax.tree_util.tree_unflatten(treedef, leaves)


@contextmanager
def defer():
    """Queues all records inside the block; flushes with one device→host copy per
    dtype at exit (through the eager writer, which re-cleans host values)."""
    global _record, QUEUE
    _record = deferred_record
    QUEUE = []
    try:
        yield
    finally:
        flushed, QUEUE = _flush(QUEUE), None
        _record = eager_record
        for category, field, args, kwargs in flushed:
            eager_record(category, field, *args, **kwargs)


for _c in categories.CATEGORIES:
    globals()[_c] = partial(record, _c)
    __all__.append(_c)
