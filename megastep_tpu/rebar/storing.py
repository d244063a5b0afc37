"""Checkpointing: throttled atomic pickles of state trees.

Counterpart of the reference ``rebar/storing.py:6-34``, generalized for JAX: objects
may be raw pytrees (params, optimizer state) or anything with a ``state_dict()``.
Writes are atomic (tmp + rename) and mtime-throttled. For large sharded checkpoints
prefer :mod:`megastep_tpu.parallel.checkpoint` (orbax), which this module
deliberately keeps independent of.
"""
import pickle
import time

from . import paths


def _extract(v):
    return v.state_dict() if hasattr(v, 'state_dict') else v


def store_latest(run_name, objs, throttle=0):
    """Atomically pickles ``{name: state}`` into the run's storing group, unless a
    checkpoint younger than ``throttle`` seconds exists."""
    path = paths.path(run_name, 'storing').with_suffix('.pkl')
    if path.exists() and (time.time() - path.lstat().st_mtime) < throttle:
        return False

    state = {k: _extract(v) for k, v in objs.items()}
    tmp = path.with_suffix('.tmp')
    tmp.write_bytes(pickle.dumps(state))
    tmp.rename(path)
    return True


def stored(run_name=-1):
    """All checkpoints of a run, as a pandas frame."""
    import pandas as pd
    infos = [{**paths.parse(p), 'path': p}
             for p in paths.subdirectory(run_name, 'storing').glob('*.pkl')]
    return pd.DataFrame(infos)


def load(run_name=-1, procname='MainProcess'):
    """Loads the latest checkpoint of a run."""
    df = stored(run_name)
    path = df.loc[df.procname == procname].iloc[-1].path
    return pickle.loads(path.read_bytes())


def runs():
    return paths.runs()
