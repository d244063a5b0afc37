"""Actor/learner IPC queues with a deadlock-free shutdown protocol.

Counterpart of the reference ``rebar/queuing.py``: size-1 queues (serial and
multiprocess) carrying an ``__END__`` sentinel, and a three-phase :func:`close` —
keep draining your intakes while trying to send ENDs, then wait for ENDs back, then
wait for your outputs to drain — so no pair of processes can deadlock on full queues
(reference ``queuing.py:122-169``).

Uses plain ``multiprocessing`` (the reference needs ``torch.multiprocessing`` for
CUDA tensor sharing; host-side numpy needs nothing special — device arrays should
be fetched before queueing).
"""
import asyncio
import logging
import multiprocessing as mp
import queue
import time
import traceback
from contextlib import asynccontextmanager

from ..dotdict import dotdict

log = logging.getLogger(__name__)

_END = '__END__'


class SerialQueue:
    """The debuggable single-process variant."""

    def __init__(self):
        self._queue = []
        self._put_end = False
        self._got_end = False

    def get(self):
        if self._queue:
            item = self._queue.pop(0)
            if isinstance(item, str) and item == _END:
                log.info('Got END')
                self._got_end = True
                return None
            return item
        return None

    def put(self, item):
        if isinstance(item, (str, type(None))) and item in (_END, None):
            raise ValueError(f'Tried to put sentinel value "{item}"')
        if len(self._queue) < 1:
            self._queue.append(item)
            return True
        return False

    def put_end(self):
        if self._put_end:
            return True
        if len(self._queue) < 1:
            self._queue.append(_END)
            log.info('Put END')
            self._put_end = True
            return True
        return False

    def get_end(self):
        self.get()
        return self._got_end

    def join(self, timeout=None):
        return len(self._queue) == 0


class MultiprocessQueue:
    """A size-1 JoinableQueue with non-blocking get/put and END bookkeeping."""

    def __init__(self):
        self.queue = mp.JoinableQueue(1)
        self._put_end = False
        self._got_end = False

    def get(self):
        try:
            item = self.queue.get_nowait()
            self.queue.task_done()
            if isinstance(item, str) and item == _END:
                log.info('Got END')
                self._got_end = True
                return None
            return item
        except queue.Empty:
            return None

    def put(self, item):
        if isinstance(item, (str, type(None))) and item in (_END, None):
            raise ValueError(f'Tried to put sentinel value "{item}"')
        try:
            self.queue.put_nowait(item)
            return True
        except queue.Full:
            return False

    def put_end(self):
        try:
            if not self._put_end:
                self.queue.put_nowait(_END)
                log.info('Put END')
                self._put_end = True
            return True
        except queue.Full:
            return False

    def get_end(self):
        self.get()
        return self._got_end

    def join(self, timeout=None):
        try:
            with self.queue._cond:
                if not self.queue._unfinished_tasks._semlock._is_zero():
                    self.queue._cond.wait(timeout=timeout)
            return True
        except RuntimeError:
            return False


async def close(intakes, outputs, timeout=5):
    """Three-phase shutdown: send ENDs downstream (draining intakes so no one is
    stuck on a full queue), collect ENDs from upstream, wait for outputs to drain."""
    log.info(f'Closing; draining intakes and waiting to send ENDs. {timeout}s timeout.')
    cutoff = time.time() + timeout
    while True:
        for intake in intakes:
            intake.get()
        if all(o.put_end() for o in outputs):
            break
        if time.time() > cutoff:
            log.warning('Timed out while waiting to send ENDs')
            return
        await asyncio.sleep(0)
        time.sleep(.1)

    log.info('Sent ENDs to outputs; waiting to get ENDs from intakes')
    while True:
        if all(i.get_end() for i in intakes):
            break
        if time.time() > cutoff:
            log.warning('Timed out while waiting to get ENDs')
            return
        await asyncio.sleep(0)
        time.sleep(.1)

    log.info('Intakes emptied; waiting for outputs to drain')
    while True:
        if all(o.join(.1) for o in outputs):
            break
        if time.time() > cutoff:
            log.warning('Timed out while waiting to drain outputs')
            return
        await asyncio.sleep(0)
        time.sleep(.1)
    log.info('Outputs drained.')


def create(x, serial=False):
    """Builds a tree of queues from a spec of names (reference
    ``queuing.py:171-178``)."""
    if isinstance(x, dict):
        return dotdict({n: create(v, serial) for n, v in x.items()})
    if isinstance(x, (list, tuple)):
        return dotdict({n: create(n, serial) for n in x})
    if isinstance(x, str):
        return SerialQueue() if serial else MultiprocessQueue()
    raise ValueError(f"Can't handle {type(x)}")


@asynccontextmanager
async def cleanup(intakes, outputs):
    intakes = [intakes] if isinstance(intakes, (SerialQueue, MultiprocessQueue)) else intakes
    outputs = [outputs] if isinstance(outputs, (SerialQueue, MultiprocessQueue)) else outputs
    try:
        yield
    except Exception:
        log.info(f'Got an exception, cleaning up queues:\n{traceback.format_exc()}')
        raise
    finally:
        await close(intakes, outputs)
