"""rebar tests: npr round-trips, stats write→resample, storing, paths, executors,
queues, recording (mirrors ``/root/reference/rebar/numpy.py:123-146`` etc.)."""
import os

import numpy as np
import pytest

from megastep_tpu.rebar import (fsm, numpy as rnumpy, parallel, paths, queuing,
                                recording, stats, storing)


@pytest.fixture(autouse=True)
def tmp_cwd(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)


def test_npr_roundtrip():
    d = {'total': 65536, 'count': 14, '_time': np.datetime64('now')}
    paths.clear('test', 'stats')
    p = paths.path('test', 'stats', 'mean/traj-length').with_suffix('.npr')

    writer = rnumpy.FileWriter(p)
    writer.write(d)
    writer.write(d)

    reader = rnumpy.FileReader(p)
    rows = reader.read()
    assert len(rows) == 2
    assert rows['total'][0] == 65536
    # Incremental: nothing new yet.
    assert len(reader.read()) == 0
    writer.write(d)
    assert len(reader.read()) == 1


def test_writer_reader():
    paths.clear('test', 'stats')
    writer = rnumpy.Writer('test', 'stats')
    writer.write('mean/traj-length', {'total': 65536, 'count': 14, '_time': np.datetime64('now')})
    writer.write('max/reward', {'x': 50000.5, '_time': np.datetime64('now')})

    reader = rnumpy.Reader('test', 'stats')
    r = reader.read()
    assert len(r) == 2


def test_stats_roundtrip():
    paths.clear('test-run', 'stats')
    with stats.to_dir('test-run'):
        for i in range(5):
            stats.mean('count', i)
            stats.cumsum('total', 2)
            stats.last('lr', 3e-4)
    df = stats.Reader('test-run').resample('1s')
    assert set(df.columns) >= {'count', 'total', 'lr'}
    assert df['total'].iloc[-1] == 10
    np.testing.assert_allclose(df['count'].mean(), 2.)


def test_stats_defer():
    import jax.numpy as jnp
    paths.clear('test-run', 'stats')
    with stats.to_dir('test-run'):
        with stats.defer():
            stats.mean('devarray', jnp.float32(3.), jnp.float32(1.))
            stats.mean('host', 5.)
    df = stats.Reader('test-run').resample('1s')
    np.testing.assert_allclose(df['devarray'].iloc[-1], 3.)
    np.testing.assert_allclose(df['host'].iloc[-1], 5.)


def test_storing():
    paths.clear('test-run', 'storing')
    stored = storing.store_latest('test-run', {'agent': {'w': np.arange(3)}})
    assert stored
    # Throttled: a second store within 60s is skipped.
    assert not storing.store_latest('test-run', {'agent': {}}, throttle=60)
    out = storing.load('test-run')
    np.testing.assert_allclose(out['agent']['w'], np.arange(3))


def test_paths_parse():
    p = paths.path('run', 'stats', 'mean/x')
    parts = paths.parse(p)
    assert parts.run_name == 'run'
    assert parts.group == 'stats'
    assert parts.channel == 'mean/x'
    assert parts.pid == str(os.getpid())


def test_serial_executor():
    with parallel.parallel(lambda x: x * 2, backend='serial') as p:
        futs = [p(i) for i in range(5)]
        assert [f.result() for f in futs] == [0, 2, 4, 6, 8]


def test_parallel_exception():
    def boom(x):
        raise ValueError('boom')
    with pytest.raises(ValueError):
        with parallel.parallel(boom, backend='serial') as p:
            p(1)


def test_serial_queue():
    q = queuing.SerialQueue()
    assert q.put('a')
    assert not q.put('b')  # size 1
    assert q.get() == 'a'
    assert q.get() is None
    assert q.put_end()
    assert q.get_end()
    with pytest.raises(ValueError):
        q.put(None)


def test_encoder_array_frames():
    """Encoder works with whatever backend is available (gif fallback here)."""
    frames = [np.full((32, 32, 3), i * 40, np.uint8) for i in range(5)]
    with recording.Encoder(fps=5) as enc:
        for f in frames:
            enc(f)
    assert len(enc.value) > 0
    assert enc.mimetype in ('mp4', 'gif')
    tag = recording.html_tag(enc)
    assert 'base64' in tag


def test_fsm_dataframe():
    env = fsm.ObliviousCoin(4)
    df = env.dataframe()
    assert len(df) == env.n_states
