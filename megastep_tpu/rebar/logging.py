"""File-based multi-process logging.

Counterpart of the reference ``rebar/logging.py``: each process logs to its own
``logs/<procname>-<pid>.txt`` via a root-logger file handler (:func:`to_dir`); a
background thread tails all processes' files and merges them into a notebook pane
or stdout (:func:`from_dir`); :func:`via_dir` combines the two.
"""
import logging
import logging.handlers
import sys
import threading
import time
import traceback
import _thread
from collections import defaultdict, deque
from contextlib import contextmanager

from logging import getLogger  # re-export

from . import paths
from .contextlib import maybeasynccontextmanager

log = getLogger(__name__)

_CONFIGURED = False


def configure():
    """Basic stdout logging config, applied once on first use."""
    global _CONFIGURED
    if not _CONFIGURED:
        logging.basicConfig(
            stream=sys.stdout,
            level=logging.INFO,
            format='%(asctime)s %(levelname)s %(name)s: %(message)s',
            datefmt=r'%Y-%m-%d %H:%M:%S')
        logging.getLogger('parso').setLevel('WARN')
        _CONFIGURED = True


def in_ipython():
    try:
        __IPYTHON__  # noqa: F821
        return True
    except NameError:
        return False


class StdoutRenderer:

    def emit(self, path, line):
        source = '{procname}/#{pid}'.format(**paths.parse(path))
        print(f'{source}: {line}')

    def close(self):
        pass


class IPythonRenderer:
    """Merges per-process log tails into one notebook pane, dropping sources that
    have been quiet for two minutes."""

    def __init__(self, compositor=None):
        from . import widgets
        self._out = (compositor or widgets.Compositor()).output()
        self._lasts = {}
        self._buffers = defaultdict(
            lambda: deque([''] * self._out.lines, maxlen=self._out.lines))

    def _format_block(self, name):
        n_lines = max(self._out.lines // (len(self._buffers) + 2), 1)
        lines = '\n'.join(list(self._buffers[name])[-n_lines:])
        return f'{name}:\n{lines}'

    def _display(self):
        content = '\n\n'.join(self._format_block(n) for n in self._buffers)
        self._out.refresh(content)
        for name, last in list(self._lasts.items()):
            if time.time() - last > 120:
                del self._buffers[name]
                del self._lasts[name]

    def emit(self, path, line):
        source = '{procname}/#{pid}'.format(**paths.parse(path))
        self._buffers[source].append(line)
        self._lasts[source] = time.time()
        self._display()

    def close(self):
        self._display()


@contextmanager
def handlers(*new_handlers):
    logger = logging.getLogger()
    old_handlers = [*logger.handlers]
    old_level = logger.level
    try:
        logger.handlers = list(new_handlers)
        # The handlers filter by their own level; make sure records reach them
        # even if some earlier config raised the root level.
        if logger.level > logging.INFO:
            logger.setLevel(logging.INFO)
        yield
    finally:
        logger.setLevel(old_level)
        for h in new_handlers:
            try:
                h.acquire()
                h.flush()
                h.close()
            except (OSError, ValueError):
                pass
            finally:
                h.release()
        logger.handlers = old_handlers


@maybeasynccontextmanager
def to_dir(run_name):
    """Routes this process's root logger into its own run-dir file."""
    configure()
    path = paths.path(run_name, 'logs').with_suffix('.txt')
    handler = logging.FileHandler(path)
    handler.setLevel(logging.INFO)
    handler.setFormatter(logging.Formatter(
        fmt='%(asctime)s %(levelname)s %(name)s: %(message)s',
        datefmt=r'%H:%M:%S'))

    with handlers(handler):
        try:
            yield
        except Exception:
            log.info(f'Trace:\n{traceback.format_exc()}')
            raise


class Reader:
    """Tails all processes' log files of a run."""

    def __init__(self, run_name):
        self._dir = paths.subdirectory(run_name, 'logs')
        self._files = {}

    def read(self):
        for path in self._dir.glob('*.txt'):
            if path not in self._files:
                self._files[path] = path.open('r')
        for path, f in self._files.items():
            for line in f.readlines():
                yield path, line.rstrip('\n')


def _tail_loop(canceller, renderer, reader):
    while True:
        for path, line in reader.read():
            renderer.emit(path, line)
        if canceller.is_set():
            break
        time.sleep(.01)


def _tail_entry(canceller, renderer, reader):
    try:
        _tail_loop(canceller, renderer, reader)
    except KeyboardInterrupt:
        log.info('Interrupting main')
        _thread.interrupt_main()
        _tail_loop(canceller, renderer, reader)


@contextmanager
def from_dir(run_name, compositor=None):
    """Spawns the tail-and-render thread for a run's logs."""
    renderer = IPythonRenderer(compositor) if in_ipython() else StdoutRenderer()
    with to_dir(run_name):
        try:
            reader = Reader(run_name)
            canceller = threading.Event()
            thread = threading.Thread(
                target=_tail_entry, args=(canceller, renderer, reader))
            thread.start()
            yield
        finally:
            log.info('Cancelling log forwarding thread')
            time.sleep(.25)
            canceller.set()
            thread.join(1)
            if thread.is_alive():
                log.error("Logging thread won't die")
            else:
                log.info('Log forwarding thread cancelled')


@contextmanager
def via_dir(run_name, compositor=None):
    with to_dir(run_name), from_dir(run_name, compositor):
        yield
