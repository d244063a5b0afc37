"""Append-only ``.npr`` record streams.

Counterpart of the reference ``rebar/numpy.py:12-120``: a ``.npr`` file is a standard
npy header written with shape ``(0,)``, followed by raw structured rows appended over
time; the true length is deduced from the file size at read time. One file per
(channel, process), so concurrent writers never contend.
"""
import time
from collections import defaultdict
from io import BytesIO

import numpy as np
from numpy.lib import format as npformat

from . import paths


def infer_dtype(exemplar):
    """Structured dtype matching a flat dict of scalars."""
    return np.dtype([(k, v.dtype if isinstance(v, np.generic) else type(v))
                     for k, v in exemplar.items()])


def make_header(dtype):
    """A v3 npy header with shape (0,); length is recovered from the file size."""
    assert not dtype.hasobject, \
        "Arrays with objects get pickled, so can't be appended to"
    bs = BytesIO()
    npformat._write_array_header(
        bs, {'descr': dtype.descr, 'fortran_order': False, 'shape': (0,)},
        version=(3, 0))
    return bs.getvalue()


class FileWriter:
    """Appends dict-rows to one ``.npr`` file; the header is written lazily from the
    first row's dtypes."""

    def __init__(self, path):
        self._path = path
        self._file = None
        self._dtype = None

    def _init(self, exemplar):
        self._file = self._path.open('wb', buffering=4096)
        self._dtype = infer_dtype(exemplar)
        self._file.write(make_header(self._dtype))
        self._file.flush()

    def write(self, d):
        if self._file is None:
            self._init(d)
        assert set(d) == set(self._dtype.names)
        row = np.array([tuple(d[k] for k in self._dtype.names)], self._dtype)
        self._file.write(row.tobytes())
        self._file.flush()

    def close(self):
        if self._file is not None:
            self._file.close()
            self._file = None


class Writer:
    """Multi-channel writer: one FileWriter per channel under a run/group."""

    def __init__(self, run_name, group):
        self._run_name = run_name
        self._group = group
        self._writers = {}

    def _writer(self, channel):
        if channel not in self._writers:
            p = paths.path(self._run_name, self._group, channel).with_suffix('.npr')
            self._writers[channel] = FileWriter(p)
        return self._writers[channel]

    def write(self, channel, d):
        self._writer(channel).write(d)

    def write_many(self, ds):
        for channel, d in ds.items():
            self._writer(channel).write(d)

    def close(self):
        for w in self._writers.values():
            w.close()
        self._writers = {}


class FileReader:
    """Incrementally reads rows appended to one ``.npr`` file."""

    def __init__(self, path):
        self._path = path
        self._file = None
        self._dtype = None

    def _init(self):
        self._file = self._path.open('rb')
        version = npformat.read_magic(self._file)
        _, _, dtype = npformat._read_array_header(self._file, version)
        self._dtype = dtype

    def read(self):
        """All rows appended since the last call."""
        if self._file is None:
            self._init()
        return np.fromfile(self._file, dtype=self._dtype)

    def close(self):
        if self._file is not None:
            self._file.close()
            self._file = None


class Reader:
    """Multi-process reader: globs all processes' files for a run/group and merges
    per-channel."""

    def __init__(self, run_name, group):
        self._run_name = paths.resolve(run_name)
        self._group = group
        self._readers = {}

    def read(self):
        for p in paths.subdirectory(self._run_name, self._group).glob('**/*.npr'):
            parts = paths.parse(p)
            if (parts.channel, parts.filename) not in self._readers:
                self._readers[parts.channel, parts.filename] = FileReader(p)

        results = defaultdict(list)
        for (channel, _), reader in self._readers.items():
            arr = reader.read()
            if len(arr) > 0:
                results[channel].append(arr)
        return results
