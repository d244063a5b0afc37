"""Stat readers: npr streams → pandas, plus the live display thread.

Counterpart of the reference ``rebar/stats/reading.py``: a :class:`Reader` that
merges all processes' ``.npr`` channels and resamples each by its category's
reduction, plus a background thread rendering the latest values into a widget/stdout
pane.
"""
import re
import threading
import time
import _thread
from contextlib import contextmanager

import numpy as np
import pandas as pd

from .. import numpy as rnumpy, paths, widgets
from ..logging import in_ipython, getLogger
from ...arrdict import arrdict
from . import categories

log = getLogger(__name__)


def format(v):
    if isinstance(v, int):
        return f'{v}'
    if isinstance(v, float):
        return f'{v:.6g}'
    if isinstance(v, list):
        return ', '.join(format(vv) for vv in v)
    if isinstance(v, dict):
        return '{' + ', '.join(f'{k}: {format(vv)}' for k, vv in v.items()) + '}'
    return str(v)


def adaptive_rule(df):
    timespan = (df.index[-1] - df.index[0]).total_seconds()
    if timespan < 600:
        return '15s'
    elif timespan < 7200:
        return '1min'
    return '10min'


class Reader:
    """Reads and resamples a run's stats channels."""

    def __init__(self, run_name, prefix=''):
        self._reader = rnumpy.Reader(run_name, 'stats')
        self._prefix = prefix
        self._arrs = {}

    def arrays(self):
        for channel, new in self._reader.read().items():
            category, field = re.match(r'^(.*?)/(.*)$', channel).groups()
            if field.startswith(self._prefix):
                current = [self._arrs[category, field]] if (category, field) in self._arrs else []
                self._arrs[category, field] = np.concatenate(current + new)
        return arrdict(self._arrs)

    def pandas(self):
        dfs = {}
        for (category, field), arr in self.arrays().items():
            df = pd.DataFrame.from_records(arr, index='_time')
            df.index.name = 'time'
            dfs[category, field] = df
        return arrdict(dfs)

    def resample(self, rule='60s', **kwargs):
        kwargs = {'rule': rule, **kwargs}
        results = {}
        for (category, field), df in self.pandas().items():
            cat = categories.CATEGORIES[category]
            if cat.reducible:
                results[field] = cat.reduce(df, **kwargs)

        if results:
            df = pd.concat(results, axis=1)
            df.index = df.index - df.index[0]
            return df
        return pd.DataFrame(index=pd.TimedeltaIndex([], name='time'))


def arrays(prefix='', run_name=-1):
    return Reader(run_name, prefix).arrays()


def pandas(name, run_name=-1):
    dfs = Reader(run_name, name).pandas()
    for (_, field), df in dfs.items():
        return df
    raise KeyError(f"Couldn't find a statistic matching {name}")


def resample(prefix='', run_name=-1, rule='60s'):
    return Reader(run_name, prefix).resample(rule)


def tdformat(td):
    x = td.total_seconds()
    x, _ = divmod(x, 1)
    x, s = divmod(x, 60)
    if x < 1:
        return f'{s:.0f}s'
    h, m = divmod(x, 60)
    if h < 1:
        return f'{m:.0f}m{s:02.0f}s'
    return f'{h:.0f}h{m:02.0f}m{s:02.0f}s'


def _display_loop(canceller, run_name, out, rule, throttle=1):
    reader = Reader(run_name)
    start = pd.Timestamp.now()
    nxt = time.time()
    while True:
        if time.time() > nxt:
            nxt = nxt + throttle
            values = reader.resample(rule=rule)
            if len(values) > 0:
                values = values.ffill(limit=1).iloc[-1].to_dict()
                key_length = max([len(str(k)) for k in values], default=0) + 1
                content = '\n'.join(f'{{:{key_length}s}} {{}}'.format(k, format(values[k]))
                                    for k in sorted(values))
            else:
                content = 'No stats yet'

            size = paths.size(run_name, 'stats')
            age = pd.Timestamp.now() - start
            out.refresh(f'{run_name}: {tdformat(age)} old, {rule} rule, '
                        f'{size:.0f}MB on disk\n\n{content}')
        if canceller.is_set():
            break
        time.sleep(.1)


def _display_entry(*args, **kwargs):
    try:
        _display_loop(*args, **kwargs)
    except KeyboardInterrupt:
        log.info('Interrupting main')
        _thread.interrupt_main()


@contextmanager
def from_dir(run_name, compositor=None, rule='60s'):
    """Spawns the live stats pane thread while in a notebook; a no-op on consoles
    (reference ``reading.py:101-159``)."""
    if in_ipython():
        try:
            canceller = threading.Event()
            out = (compositor or widgets.Compositor()).output()
            thread = threading.Thread(
                target=_display_entry, args=(canceller, run_name, out, rule))
            thread.start()
            yield
        finally:
            canceller.set()
            thread.join(1)
            if thread.is_alive():
                log.error("Stat display thread won't die")
            else:
                log.info('Stat display thread cancelled')
    else:
        log.info('No stats emitted in console mode')
        yield
