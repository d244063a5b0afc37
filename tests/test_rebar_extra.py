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
