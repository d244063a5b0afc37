"""Deferred SIGINT handling for long device loops.

Role counterpart of the reference ``rebar/interrupting.py:7-33``: while active, a
first Ctrl-C only records the request; the loop polls :meth:`Interrupter.check`
at safe points (between jitted steps, after checkpoint writes) and the
KeyboardInterrupt is raised there instead of mid-dispatch. Unlike the reference,
a *second* Ctrl-C before the next check escalates and raises immediately — so a
loop stuck inside one long dispatch can still be killed from the keyboard.
"""
import logging
import signal

from .contextlib import maybeasynccontextmanager

log = logging.getLogger(__name__)


class Interrupter:
    """Counts SIGINTs between checks; see module docstring."""

    def __init__(self):
        self._pending = 0

    def _on_signal(self, signum, frame):
        self._pending += 1
        if self._pending == 1:
            log.info('interrupt requested; will raise at the next check()')
        else:
            log.warning('second interrupt; raising immediately')
            self._pending = 0
            raise KeyboardInterrupt()

    def check(self):
        """Raises KeyboardInterrupt here if Ctrl-C arrived since the last check."""
        if self._pending:
            self._pending = 0
            raise KeyboardInterrupt()


@maybeasynccontextmanager
def interrupter():
    """Installs deferred SIGINT handling for the block; yields the
    :class:`Interrupter` whose ``check()`` the loop should poll."""
    state = Interrupter()
    previous = signal.signal(signal.SIGINT, state._on_signal)
    try:
        yield state
    finally:
        signal.signal(signal.SIGINT, previous)
