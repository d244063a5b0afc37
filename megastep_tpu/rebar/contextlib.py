"""Context managers usable from both ``with`` and ``async with``.

Role counterpart of the reference ``rebar/contextlib.py`` (its
``maybeasynccontextmanager`` wraps the generator twice, once per protocol).
Here the async protocol simply delegates to the sync one: the managed bodies
(log/stat writer installation) are synchronous either way, so ``__aenter__`` /
``__aexit__`` are thin awaitable shims over ``__enter__`` / ``__exit__``.
"""
from contextlib import contextmanager
from functools import wraps


class _DualProtocol:
    """Adapts one sync context manager to both protocols."""

    __slots__ = ('_cm',)

    def __init__(self, cm):
        self._cm = cm

    def __enter__(self):
        return self._cm.__enter__()

    def __exit__(self, exc_type, exc, tb):
        return self._cm.__exit__(exc_type, exc, tb)

    async def __aenter__(self):
        return self.__enter__()

    async def __aexit__(self, exc_type, exc, tb):
        return self.__exit__(exc_type, exc, tb)


def maybeasynccontextmanager(func):
    """Like :func:`contextlib.contextmanager`, but the result also supports
    ``async with`` (entering/exiting synchronously)."""
    sync = contextmanager(func)

    @wraps(func)
    def make(*args, **kwargs):
        return _DualProtocol(sync(*args, **kwargs))
    return make
