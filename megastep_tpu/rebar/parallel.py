"""Executor sugar for host-side process/thread pools.

Counterpart of the reference ``rebar/parallel.py:10-99``: a ``SerialExecutor`` you
can actually step through in a debugger, a ``VariableExecutor`` that switches between
serial/thread/process backends by name, and :func:`parallel` — submit-everything,
reraise-the-first-exception, cancel-the-rest sugar. Used by the cubicasa geometry
pipeline and the video encoder; device work never goes through here.
"""
import logging
from concurrent.futures import (FIRST_EXCEPTION, Future, ProcessPoolExecutor,
                                ThreadPoolExecutor, wait)
from contextlib import contextmanager

log = logging.getLogger(__name__)


class SerialExecutor:
    """Runs submissions immediately on the calling thread — debuggable and
    deterministic."""

    def __init__(self, *args, **kwargs):
        pass

    def submit(self, f, *args, **kwargs):
        fut = Future()
        try:
            fut.set_result(f(*args, **kwargs))
        except Exception as e:
            fut.set_exception(e)
        return fut

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def shutdown(self, wait=True, cancel_futures=False):
        pass


BACKENDS = {
    'serial': SerialExecutor,
    'thread': ThreadPoolExecutor,
    'process': ProcessPoolExecutor}


class VariableExecutor:
    """An executor whose backend ('serial'/'thread'/'process') is chosen at
    construction."""

    def __init__(self, n_workers=None, backend='process', **kwargs):
        cls = BACKENDS[backend]
        self._executor = cls() if backend == 'serial' else cls(n_workers, **kwargs)

    def submit(self, *args, **kwargs):
        return self._executor.submit(*args, **kwargs)

    def __enter__(self):
        self._executor.__enter__()
        return self

    def __exit__(self, *exc):
        return self._executor.__exit__(*exc)

    def shutdown(self, **kwargs):
        self._executor.shutdown(**kwargs)


@contextmanager
def parallel(f, progress=True, **kwargs):
    """Context manager yielding a callable proxy for ``f``; exit waits on all
    submissions, re-raises the first failure, and cancels the rest.

    >>> with parallel(f) as p:
    ...     futures = {x: p(x) for x in xs}
    ...     results = p.wait(futures)
    """
    with VariableExecutor(**kwargs) as executor:
        futures = []

        def submit(*args, **kw):
            fut = executor.submit(f, *args, **kw)
            futures.append(fut)
            return fut

        def wait_all(tree):
            if isinstance(tree, dict):
                return type(tree)({k: wait_all(v) for k, v in tree.items()})
            if isinstance(tree, (list, tuple)):
                return type(tree)(wait_all(v) for v in tree)
            return tree.result()

        submit.wait = wait_all
        try:
            yield submit
            done, not_done = wait(futures, return_when=FIRST_EXCEPTION)
            for fut in done:
                exc = fut.exception()
                if exc is not None:
                    raise exc
        finally:
            for fut in futures:
                fut.cancel()
