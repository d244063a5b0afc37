"""Dual sync/async context managers.

Counterpart of the reference ``rebar/contextlib.py``: decorate a generator function
once and get a context manager usable with both ``with`` and ``async with``.
"""
from contextlib import asynccontextmanager, contextmanager
from functools import wraps


class MaybeAsyncGeneratorContextManager:

    def __init__(self, func, args, kwargs):
        self._func = func
        self._args = args
        self._kwargs = kwargs
        self._sync = None
        self._async = None

    def __enter__(self):
        if self._sync is None:
            self._sync = contextmanager(self._func)(*self._args, **self._kwargs)
        return self._sync.__enter__()

    def __exit__(self, t, v, tb):
        return self._sync.__exit__(t, v, tb)

    def __aenter__(self):
        if self._async is None:
            @asynccontextmanager
            async def asyncfunc(*args, **kwargs):
                with contextmanager(self._func)(*args, **kwargs) as v:
                    yield v
            self._async = asyncfunc(*self._args, **self._kwargs)
        return self._async.__aenter__()

    def __aexit__(self, t, v, tb):
        return self._async.__aexit__(t, v, tb)


def maybeasynccontextmanager(func):
    @wraps(func)
    def helper(*args, **kwargs):
        return MaybeAsyncGeneratorContextManager(func, args, kwargs)
    return helper
