"""Distributed/multiprocess plumbing, TPU-native.

Counterpart of the reference ``rebar/processes.py``. The reference's pieces map as:

  * NCCL process-group init + ``DDP2`` gradient sync (``processes.py:18-70``) →
    :func:`initialize` wraps ``jax.distributed.initialize`` for multi-host
    rendezvous; gradient sync is a ``psum`` inside the pjit'd train step (see
    :mod:`megastep_tpu.parallel`), so no wrapper module is needed or possible;
  * ``consensus`` all-reduce(PRODUCT) for coordinated cancellation
    (``processes.py:87-105``) → :func:`consensus`, a min-reduce over hosts via
    ``multihost_utils`` (falling back to local when single-host);
  * ``ProcessSentinel``/``SerialSentinel`` child supervisors with graceful-cancel
    escalation (``processes.py:125-266``) → ported directly (host-side logic).
"""
import asyncio
import inspect
import logging
import multiprocessing as mp
import time
from contextlib import contextmanager

log = logging.getLogger(__name__)


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host rendezvous via ``jax.distributed`` (the NCCL-init counterpart).
    No-ops on a single host with no coordinator configured."""
    import jax
    if num_processes is None or num_processes == 1:
        log.info('Single-process run; skipping jax.distributed init')
        return
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


@contextmanager
def processgroup(*args, **kwargs):
    import jax
    try:
        initialize(*args, **kwargs)
        yield
    finally:
        if jax.process_count() > 1:
            jax.distributed.shutdown()


def consensus(b):
    """True only if every host says True — so either the whole job cancels or none
    of it does, and no host is left hanging in a collective."""
    import jax
    import jax.numpy as jnp
    if jax.process_count() == 1:
        return bool(b)
    from jax.experimental import multihost_utils
    out = multihost_utils.process_allgather(jnp.asarray(float(b)))
    return bool(out.min())


def cancel(canceller):
    """Group-safe cancellation check for a training loop (reference
    ``processes.py:92-105``)."""
    import jax
    if jax.process_count() > 1:
        is_set = canceller.is_set()
        if is_set:
            log.info('Canceller set, trying to break')
        if consensus(is_set):
            log.info('Everyone has cancelled, breaking')
            return True
    elif canceller.is_set():
        log.info('Cancelled, breaking')
        return True
    return False


async def surrender():
    await asyncio.sleep(0)


class DeadStrand(Exception):
    """A supervised child died without being cancelled."""


def coroutine_runner(f, *args, **kwargs):
    co = f(*args, **kwargs)
    try:
        while True:
            co.send(None)
    except StopIteration:
        pass


def set_start_method():
    """Enforce spawn-family start methods (fork is unsafe once a device runtime is
    live, exactly as with CUDA — reference ``processes.py:72-85``)."""
    from multiprocessing import context
    ctx = context._default_context
    if ctx._actual_context is None:
        mp.set_start_method('spawn')
    else:
        assert ctx._actual_context._name in ('spawn', 'forkserver')


class ProcessSentinel:
    """Supervises child processes: launch, graceful-cancel with a 15 s escalation to
    terminate, and dead-child detection (reference ``processes.py:125-189``)."""

    def __init__(self, wait=15):
        self._wait = wait
        self._processes = {}
        self._references = []
        self.canceller = mp.Event()
        set_start_method()
        self.serial = False

    def pin(self, obj):
        """Keeps an object (e.g. a queue) alive for as long as the children."""
        self._references.append(obj)

    def launch(self, f, *args, **kwargs):
        if (self.canceller not in args) and (self.canceller not in kwargs.values()):
            log.warning("Sentinel's canceller has not been passed to a launched process")
        count = len([n for n, _ in self._processes if n == f.__qualname__])
        target = coroutine_runner if inspect.iscoroutinefunction(f) else f
        args = (f, *args) if inspect.iscoroutinefunction(f) else args
        proc = mp.Process(name=f'{f.__qualname__}-{count}', target=target,
                          args=args, kwargs=kwargs)
        proc.start()
        self._processes[f.__qualname__, count] = proc
        log.info(f'Launched process {f.__qualname__}-{count}')

    def wait(self):
        alive = []
        for _ in range(int(self._wait)):
            alive = [(n, c) for (n, c), p in self._processes.items() if p.is_alive()]
            if not alive:
                log.info('All processes gracefully cancelled')
                break
            strs = [f'{n}-{c}' for n, c in alive]
            log.info(f'Waiting for cancellations: {", ".join(strs)} still alive')
            time.sleep(1)
        else:
            for n, c in alive:
                log.info(f'Failed to cancel "{n}-{c}"; terminating')
                self._processes[n, c].terminate()
        self._references = []

    def cancel(self):
        log.info('Setting canceller')
        self.canceller.set()
        self.wait()

    def check(self):
        for (n, c), p in self._processes.items():
            if not p.is_alive():
                log.info(f'Process "{n}-{c}" died unexpectedly; cancelling')
                self.cancel()
                raise DeadStrand(f'Process "{n}-{c}" died unexpectedly')


class SerialSentinel:
    """The debuggable variant: children are coroutines stepped in-process
    (reference ``processes.py:191-247``)."""

    def __init__(self, wait=15):
        self._wait = wait
        self.canceller = mp.Event()
        self._coroutines = {}
        self.serial = True

    def launch(self, f, *args, **kwargs):
        if (self.canceller not in args) and (self.canceller not in kwargs.values()):
            log.warning("Sentinel's canceller has not been passed to a launched process")
        count = len([n for n, _ in self._coroutines if n == f.__qualname__])
        self._coroutines[f.__qualname__, count] = f(*args, **kwargs)
        log.info(f'Launched coroutine {f.__qualname__}-{count}')

    def wait(self):
        alive = []
        for _ in range(int(self._wait)):
            alive = []
            for (n, c), co in self._coroutines.items():
                try:
                    co.send(None)
                except (RuntimeError, StopIteration):
                    pass
                else:
                    alive.append((n, c))
            if not alive:
                log.info('All coroutines gracefully cancelled')
                break
            strs = [f'{n}-{c}' for n, c in alive]
            log.info(f'Waiting for cancellations: {", ".join(strs)} still alive')
        else:
            for n, c in alive:
                log.info(f'Failed to cancel "{n}-{c}"; closing')
                try:
                    self._coroutines[n, c].close()
                except RuntimeError:
                    pass

    def cancel(self):
        log.info('Setting canceller')
        self.canceller.set()
        self.wait()

    def check(self):
        for (n, c), co in self._coroutines.items():
            try:
                co.send(None)
            except StopIteration:
                pass
            except Exception as e:
                log.info(f'Coroutine "{n}-{c}" died unexpectedly; cancelling')
                self.cancel()
                raise e


@contextmanager
def sentinel(serial=False):
    """Run supervised children; any exit path cancels them all cleanly
    (reference ``processes.py:249-266``)."""
    s = SerialSentinel() if serial else ProcessSentinel()
    try:
        yield s
    except KeyboardInterrupt:
        log.info('Got a keyboard interrupt, cancelling processes')
        s.cancel()
    except DeadStrand:
        raise
    except Exception:
        s.cancel()
        raise
    else:
        s.cancel()
