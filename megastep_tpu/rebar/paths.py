"""Run-directory conventions.

Counterpart of the reference ``rebar/paths.py``: every run owns
``output/traces/<run>/<group>/<channel>/<procname>-<pid>`` files, runs resolve by
name or negative age index, and each process writes only its own files (which is what
makes the whole telemetry stack multi-process-safe by construction).
"""
import multiprocessing as mp
import os
import re
import shutil
from pathlib import Path

from ..dotdict import dotdict

ROOT = 'output/traces'


def resolve(run_name):
    """A string names a run directly; an int indexes runs by creation time
    (-1 = latest)."""
    if isinstance(run_name, str):
        return run_name
    if isinstance(run_name, int):
        times = {p: p.stat().st_ctime for p in Path(ROOT).iterdir()}
        ordered = sorted(times, key=times.__getitem__)
        return ordered[run_name].parts[-1]
    raise ValueError(f"Can't find a run corresponding to {run_name}")


def run_dir(run_name):
    return Path(ROOT) / resolve(run_name)


def subdirectory(run_name, group, channel=''):
    d = run_dir(run_name) / group
    return d / channel if channel else d


def clear(run_name, group=None):
    """Deletes a run (or one group of it)."""
    target = run_dir(run_name) if group is None else subdirectory(run_name, group)
    shutil.rmtree(target, ignore_errors=True)


def path(run_name, group, channel=''):
    """This process's file in the given group/channel; parents are created."""
    run_name = resolve(run_name)
    proc = mp.current_process()
    for x in [run_name, group]:
        for c in ['_', os.sep]:
            assert c not in x, f'Can\'t have "{c}" in the file path'
    p = subdirectory(run_name, group, channel) / f'{proc.name}-{proc.pid}'
    p.parent.mkdir(exist_ok=True, parents=True)
    return p


def glob(run_name, group, channel='', pattern='*'):
    ps = subdirectory(run_name, group, channel).glob(pattern)
    return sorted(ps, key=lambda p: p.stat().st_mtime)


def parse(p):
    """Splits a trace path back into run/group/channel/procname/pid."""
    parts = p.relative_to(ROOT).with_suffix('').parts
    procname, pid = re.match(r'^(.*)-(.*)$', parts[-1]).groups()
    return dotdict(
        run_name=parts[0],
        group=parts[1],
        channel='/'.join(parts[2:-1]),
        filename=parts[-1],
        procname=procname,
        pid=pid)


def runs():
    """All runs with creation times, oldest first, as a pandas frame."""
    import pandas as pd
    rows = [{'path': p,
             'created': pd.Timestamp(p.stat().st_ctime, unit='s'),
             'run_name': p.parts[-1]}
            for p in Path(ROOT).iterdir()]
    return pd.DataFrame(rows).sort_values('created').reset_index(drop=True)


def size(run_name, group):
    """Total size of a group's files, in MB."""
    b = sum(item.stat().st_size
            for item in subdirectory(resolve(run_name), group).glob('**/*.*'))
    return b / 1e6
