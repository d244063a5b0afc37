"""The cubicasa5k floorplan dataset pipeline.

Counterpart of the reference ``megastep/cubicasa.py`` (``/root/reference/megastep/
cubicasa.py:39-224``): a license-gated download of the 5k-floorplan SVG dataset, a
cached SVG→geometry conversion, and a deterministic 90/10 train/test sampler.

Differences from the reference, by design:
  * the SVG→geometry conversion needs only ``bs4`` (markup) — the polygon
    booleans for door subtraction are dependency-free
    (:mod:`megastep_tpu.polygons`), so the whole path runs everywhere;
  * when neither the geometry cache nor network access is available,
    :func:`sample` falls back to :mod:`megastep_tpu.floorplans` procedural layouts
    (same schema) with a warning, so the demo envs and benchmarks run offline.
"""
import gzip
import logging
import os
import pickle
from pathlib import Path

import numpy as np

from . import geometry, floorplans
from .dotdict import dotdict

log = logging.getLogger(__name__)

ROOT = Path(os.environ.get('MEGASTEP_TPU_CACHE', '.cache/megastep_tpu')) / 'cubicasa'

URL = 'https://zenodo.org/record/2613548/files/cubicasa5k.zip?download=1'

LICENSE_TEXT = """The cubicasa5k dataset is derived from real Finnish floorplans and
is distributed under the CC BY-NC 4.0 license (non-commercial use, attribution
required): https://zenodo.org/record/2613548 . Set the environment variable
MEGASTEP_TPU_CUBICASA_AGREE=1 to confirm you accept these terms."""

N_TEST = 500

#: Bump when the SVG→geometry conversion changes meaning (coordinates,
#: booleans, door handling) — stale geometry caches are ignored by name.
CACHE_VERSION = 2


def confirm():
    """License confirmation gate (reference ``cubicasa.py:39-63``): refuses to
    download until the CC BY-NC terms are accepted via env var or interactively."""
    if os.environ.get('MEGASTEP_TPU_CUBICASA_AGREE') == '1':
        return True
    try:
        answer = input(LICENSE_TEXT + '\nAccept? [y/N] ')
    except (EOFError, OSError):
        raise RuntimeError(LICENSE_TEXT)
    if answer.strip().lower() not in ('y', 'yes'):
        raise RuntimeError('cubicasa license not accepted')
    return True


def download(url=URL, dest=None):
    """Streams the 5 GB dataset zip to the cache (reference ``cubicasa.py:65-75``)."""
    import urllib.request
    confirm()
    dest = Path(dest) if dest else ROOT / 'cubicasa5k.zip'
    dest.parent.mkdir(parents=True, exist_ok=True)
    log.info('Downloading %s to %s', url, dest)
    urllib.request.urlretrieve(url, dest)
    return dest


def _points(attr):
    return np.array([list(map(float, p.split(','))) for p in attr.split()])


def _classes(e):
    """Class tokens of an element, parser-agnostic: bs4's xml parser keeps
    ``class`` a plain string while the html parsers split it into a list."""
    if e is None:
        return []
    c = e.get('class', '')
    return c.split() if isinstance(c, str) else list(c)


def svg_elements(svg):
    """Extracts the raw cubicasa SVG elements (pure bs4 + numpy, no geometry
    dependencies): wall/railing polygons, door polygons, and space outlines.

    Selection matches the reference's CSS rules (``geometry.py:43-57``:
    ``.Wall>polygon``, ``.Door>polygon``, ``.Space>polygon``) on real cubicasa
    markup, where Door groups nest *inside* Wall groups and Space groups carry
    multi-token classes (``Space LivingRoom``) plus nested FixedFurniture — only
    polygons whose *direct parent* carries the class count, one polygon each.

    :return: dotdict of ``walls``/``doors``/``spaces`` — lists of (P, 2) point
        arrays in SVG (cm) coordinates.
    """
    from bs4 import BeautifulSoup

    soup = BeautifulSoup(svg, features='xml')

    walls, doors, spaces = [], [], []
    buckets = [(('Wall', 'Railing'), walls), (('Door',), doors),
               (('Space',), spaces)]
    for poly in soup.select('polygon'):
        pts = _points(poly.get('points', ''))
        if len(pts) < 3:
            continue
        parent = set(_classes(poly.parent))
        for names, bucket in buckets:
            if parent & set(names):
                bucket.append(pts)
                break
    return dotdict(walls=walls, doors=doors, spaces=spaces)


def svg_walls(svg, door_dilation=5.):
    """Parses wall segments from a cubicasa SVG: boundary of the wall-polygon
    union minus dilated door polygons (reference ``geometry.py:43-57``, which
    used shapely; here :mod:`megastep_tpu.polygons` computes it exactly with
    zero dependencies). Doors are dilated 5 cm before subtraction because
    real-dataset door polygons are often slightly misaligned with their wall."""
    from . import polygons

    els = svg_elements(svg)
    doors = [polygons.dilate_convex(pts, door_dilation) for pts in els.doors]
    walls = polygons.boundary_segments(els.walls, doors)
    return walls, els.spaces


def svg_geometry(id, svg):
    """One SVG → geometry dict: cm→m scaling with a y-flip (SVG coordinates are
    centimeters from the top-left, the engine wants meters from the bottom-left
    — reference ``geometry.py:62-72``), wall dedupe, masks, centroid lights."""
    from .constants import SVG_SCALE, MARGIN
    walls, spaces = svg_walls(svg)
    joint = np.concatenate([walls.reshape(-1, 2)] +
                           [np.asarray(s) for s in spaces])
    left, bot = joint[:, 0].min(), joint[:, 1].max()

    def to_meters(ps):
        ps = np.asarray(ps)
        flipped = np.stack([ps[..., 0] - left, bot - ps[..., 1]], -1)
        return flipped / SVG_SCALE + MARGIN

    walls = geometry.unique(to_meters(walls))
    spaces = [to_meters(s) for s in spaces]
    masks = geometry.masks(walls, spaces)
    lights = geometry.centroids(spaces)
    return dotdict(id=id, walls=walls, lights=lights, masks=masks, res=geometry.RES)


def safe_geometry(id, svg):
    """:func:`svg_geometry` that returns None (with a warning) on malformed
    markup instead of killing the batch conversion (the dataset has a handful
    of broken files — reference ``cubicasa.py:128-136``)."""
    try:
        return svg_geometry(id, svg)
    except Exception as e:  # noqa: BLE001 — any parse failure just skips the file
        log.warning('Skipping %s: %s', id, e)
        return None


def geometry_data(regenerate=False, backend='process'):
    """Loads (building if needed) the geometry cache: a gzipped pickle of geometry
    dicts converted from the dataset SVGs. Conversion fans out over a process
    pool like the reference's regeneration path (``cubicasa.py:149-160``).

    :param backend: pool backend for the conversion ('process'/'thread'/'serial').
    """
    # The version is part of the cache name: conversion-semantics changes
    # (y-flip, hole rings, door dilation) must not be served from a stale
    # cache built by an older parser.
    cache = ROOT / f'geometries-v{CACHE_VERSION}.pkl.gz'
    if cache.exists() and not regenerate:
        with gzip.open(cache, 'rb') as f:
            return pickle.load(f)

    import zipfile
    from .rebar.parallel import parallel
    zpath = ROOT / 'cubicasa5k.zip'
    if not zpath.exists():
        download()
    # Stream entries out of the zip in bounded batches — the full dataset's
    # SVGs are hundreds of MB and pending submissions pin their arguments, so
    # an unbounded fan-out would hold them all resident at once.
    geoms = []
    with zipfile.ZipFile(zpath) as z, \
            parallel(safe_geometry, backend=backend) as pool:
        names = sorted(n for n in z.namelist() if n.endswith('model.svg'))
        for i in range(0, len(names), 64):
            batch = names[i:i + 64]
            geoms += pool.wait([pool(n, z.read(n).decode('utf8'))
                                for n in batch])
    geoms = [g for g in geoms if g is not None]
    cache.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(cache, 'wb') as f:
        pickle.dump(geoms, f)
    return geoms


def sample(n, split='training', fallback='procedural'):
    """Deterministically samples ``n`` geometries from the given split
    (reference ``cubicasa.py:177-224``: last 500 of a seeded shuffle are test).

    When the dataset cache is missing and can't be fetched, falls back to
    :func:`megastep_tpu.floorplans.sample` procedural geometries (same schema) so
    everything downstream runs offline; pass ``fallback=None`` to forbid that.
    """
    try:
        geoms = geometry_data()
    except Exception as e:
        if fallback != 'procedural':
            raise
        log.warning('cubicasa unavailable (%s); using procedural floorplans', e)
        return floorplans.sample(n, seed=1 if split == 'training' else 2)

    order = np.random.RandomState(1).permutation(len(geoms))
    pool = order[:-N_TEST] if split == 'training' else order[-N_TEST:]
    picks = np.random.RandomState(2).choice(pool, n, replace=n > len(pool))
    return [geoms[i] for i in picks]
