"""Coverage for the remaining rebar subsystems: logging, plots, multiprocess
queues, sentinels, and the pytree registry."""
import time

import numpy as np
import pytest

from megastep_tpu.rebar import logging as rlogging
from megastep_tpu.rebar import paths, plots, processes, queuing, stats


@pytest.fixture(autouse=True)
def tmp_cwd(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)


def test_logging_to_dir():
    """Root-logger lines land in the run's per-process file (reference
    ``rebar/logging.py:105-119``)."""
    log = rlogging.getLogger('test-logger')
    with rlogging.to_dir('test-log-run'):
        log.info('hello from the test')
    files = paths.glob('test-log-run', 'logs', pattern='*.txt')
    assert len(files) == 1
    assert 'hello from the test' in files[0].read_text()


def test_logging_reader_tails():
    log = rlogging.getLogger('test-logger2')
    with rlogging.to_dir('test-log-run2'):
        log.info('line one')
        reader = rlogging.Reader('test-log-run2')
        lines = [l for _, l in reader.read()]
        assert any('line one' in l for l in lines)
        log.info('line two')
        lines = [l for _, l in reader.read()]
        assert any('line two' in l for l in lines)


def test_plots_review():
    """The matplotlib dashboard renders from written stats."""
    import matplotlib
    matplotlib.use('Agg')
    with stats.to_dir('test-plot-run'):
        for i in range(3):
            stats.mean('loss/total', 1. / (i + 1))
            stats.rate('sample-rate', 100)
    fig = plots.review('test-plot-run', rule='1s')
    assert fig is not None
    assert len(plots.timegroups(stats.Reader('test-plot-run').resample('1s'))) >= 2


def test_multiprocess_queue():
    q = queuing.MultiprocessQueue()
    assert q.put({'x': np.arange(3)})
    time.sleep(.05)  # mp queues are async underneath
    assert not q.put('second')  # size 1
    item = q.get()
    assert list(item['x']) == [0, 1, 2]
    assert q.put_end()
    time.sleep(.05)
    assert q.get_end()


def test_queuing_three_phase_close():
    """The deadlock-free shutdown protocol (reference ``queuing.py:122-169``):
    `close` drains intakes while sending ENDs, collects ENDs back, and waits for
    outputs to drain — even when the peer's queues start out full."""
    import asyncio

    up = queuing.SerialQueue()      # peer -> me
    down = queuing.SerialQueue()    # me -> peer
    assert down.put('stuck-item')   # my output is full: END can't go yet
    assert up.put('unread-item')    # my intake holds data, then the peer's END

    async def run():
        # Simulate the peer draining my output and ENDing my intake while my
        # close() is mid-dance.
        async def peer():
            await asyncio.sleep(0)
            assert down.get() == 'stuck-item'
            for _ in range(100):
                if up.put_end() and down.get_end():
                    return
                await asyncio.sleep(0)
            raise AssertionError('peer never completed the END exchange')
        await asyncio.gather(queuing.close([up], [down], timeout=5), peer())

    asyncio.run(run())
    assert up.get_end()             # END was received
    assert down.get_end()           # ...in both directions
    assert down.join()              # my output drained


def test_logging_from_dir_merges_to_stdout(capsys):
    """`from_dir` pumps every process's log lines to the console, labeled by
    source (reference ``logging.py:121-168``)."""
    log = rlogging.getLogger('pump-test')
    with rlogging.from_dir('test-pump-run'):
        log.info('pumped line one')
        time.sleep(.4)  # let the tail thread pick it up
    out = capsys.readouterr().out
    assert 'pumped line one' in out
    assert 'MainProcess/#' in out


def test_serial_sentinel():
    """Coroutine children run under the sentinel and cancel cleanly
    (reference ``rebar/processes.py:191-266``)."""
    ticks = []

    def child(canceller):
        while not canceller.is_set():
            ticks.append(1)
            yield

    with processes.sentinel(serial=True) as s:
        s.launch(child, s.canceller)
        for _ in range(3):
            s.check()
    assert len(ticks) >= 3


def test_sentinel_detects_death():
    def dying(canceller):
        yield
        raise ValueError('child died')

    with pytest.raises(ValueError):
        with processes.sentinel(serial=True) as s:
            s.launch(dying, s.canceller)
            for _ in range(3):
                s.check()


def test_consensus_single_host():
    assert processes.consensus(True) is True
    assert processes.consensus(False) is False


def test_device_vitals_records_channel(monkeypatch):
    """`stats.device.vitals` (wired into each train() chunk, like the
    reference's per-chunk GPU scrape, ``demo/__init__.py:147-148``) records a
    per-device memory channel. CPU devices report no memory_stats, so stub one
    that does."""
    import jax
    from megastep_tpu.rebar.stats import device

    class FakeDev:
        def memory_stats(self):
            return {'bytes_limit': 100, 'bytes_in_use': 25}

    monkeypatch.setattr(jax, 'devices', lambda: [FakeDev()])
    monkeypatch.setattr(device, '_last', -1e9)
    with stats.to_dir('test-vitals-run'):
        device.vitals(throttle=0)
    df = stats.Reader('test-vitals-run').resample('1s')
    assert 'device/memory/0' in df.columns
    assert float(df['device/memory/0'].iloc[-1]) == 25.


def test_pytree_static_equality():
    """Two identical envs hash/compare equal statically; arrays ride as leaves."""
    import jax
    from megastep_tpu.rebar import fsm
    env = fsm.ObliviousCoin(4)
    leaves, treedef = jax.tree_util.tree_flatten(env)
    assert len(leaves) == 5
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.n_envs == 4
    # The same instance flattens to an equal treedef (jit cache hit).
    _, treedef2 = jax.tree_util.tree_flatten(env)
    assert treedef == treedef2


def test_interrupter_defers_and_escalates():
    """First SIGINT defers to check(); second raises immediately
    (``rebar/interrupting.py``)."""
    import os
    import signal
    from megastep_tpu.rebar import interrupting

    with interrupting.interrupter() as interrupt:
        interrupt.check()  # nothing pending
        os.kill(os.getpid(), signal.SIGINT)
        with pytest.raises(KeyboardInterrupt):
            interrupt.check()
        interrupt.check()  # flag cleared by the raise
        # Second Ctrl-C before a check escalates inside the handler itself.
        os.kill(os.getpid(), signal.SIGINT)
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGINT)


def test_maybeasync_context_both_protocols():
    """The dual context manager runs its body under both ``with`` and
    ``async with`` (``rebar/contextlib.py``)."""
    import asyncio
    from megastep_tpu.rebar.contextlib import maybeasynccontextmanager

    events = []

    @maybeasynccontextmanager
    def ctx(tag):
        events.append(f'enter-{tag}')
        try:
            yield tag
        finally:
            events.append(f'exit-{tag}')

    with ctx('sync') as v:
        assert v == 'sync'

    async def use():
        async with ctx('async') as v:
            assert v == 'async'
    asyncio.run(use())
    assert events == ['enter-sync', 'exit-sync', 'enter-async', 'exit-async']


def test_category_schema_binding():
    """Writer-side schema binding: positional/keyword/defaulted fields, with
    errors on missing or unknown fields (``rebar/stats/categories.py``)."""
    from megastep_tpu.rebar.stats import categories

    mean = categories.CATEGORIES['mean']
    assert mean.row(3.) == {'total': 3., 'count': 1}
    assert mean.row(3., 2) == {'total': 3., 'count': 2}
    assert mean.row(total=3., count=5) == {'total': 3., 'count': 5}
    with pytest.raises(TypeError):
        mean.row()
    with pytest.raises(TypeError):
        mean.row(1., bogus=2)
    with pytest.raises(TypeError):
        mean.row(1., 2, total=3.)
    assert not categories.CATEGORIES['dist'].reducible


def test_category_reductions():
    """Reader-side reductions: mean is Σtotal/Σcount per bucket; cumsum is a
    running total; rate divides by wall-clock."""
    import pandas as pd
    from megastep_tpu.rebar.stats import categories

    idx = pd.to_datetime(['2026-01-01 00:00:00', '2026-01-01 00:00:30',
                          '2026-01-01 00:01:10'])
    mean = categories.CATEGORIES['mean'].reduce(
        pd.DataFrame({'total': [2., 4., 9.], 'count': [1, 1, 3]}, index=idx),
        rule='60s')
    np.testing.assert_allclose(mean.values, [3., 3.])  # (2+4)/2, 9/3

    cum = categories.CATEGORIES['cumsum'].reduce(
        pd.DataFrame({'total': [1., 2., 3.]}, index=idx), rule='60s')
    np.testing.assert_allclose(cum.values, [3., 6.])

    rate = categories.CATEGORIES['rate'].reduce(
        pd.DataFrame({'count': [10, 20, 40]}, index=idx), rule='60s')
    # 70 events over the 70 s span, bucketed 60 s: first bucket 30 events.
    np.testing.assert_allclose(rate.values[0], 30 / 60)


def test_plots_stream_incremental():
    """Stream pushes new resampled rows into the existing figure without a
    rebuild; a new column triggers one (``rebar/plots.py``)."""
    import matplotlib
    matplotlib.use('Agg')

    with stats.to_dir('test-stream-run'):
        for i in range(3):
            stats.mean('loss/total', 1. / (i + 1))
        stream = plots.Stream('test-stream-run', backend='matplotlib')
        n0 = stream.update(rule='1s')
        assert n0 > 0
        fig0 = stream._fig
        pts0 = len(stream._lines['loss/total'].get_xdata())

        time.sleep(1.1)
        for i in range(3):
            stats.mean('loss/total', 2. / (i + 1))
        n1 = stream.update(rule='1s')
        assert n1 >= n0
        assert stream._fig is fig0  # same columns: no rebuild
        assert len(stream._lines['loss/total'].get_xdata()) >= pts0

        stats.mean('reward/mean', 1.)
        stream.update(rule='1s')
        assert stream._fig is not fig0  # new column: rebuilt
        assert 'reward/mean' in stream._lines


def test_rate_caps_by_raw_span():
    """A run shorter than one resample bucket is rated over its real span,
    not the full bucket (``rebar/stats/categories.py``)."""
    import pandas as pd
    from megastep_tpu.rebar.stats import categories

    idx = pd.to_datetime(['2026-01-01 00:00:00', '2026-01-01 00:00:03'])
    rate = categories.CATEGORIES['rate'].reduce(
        pd.DataFrame({'count': [100, 300]}, index=idx), rule='60s')
    np.testing.assert_allclose(rate.values, [400 / 3])
