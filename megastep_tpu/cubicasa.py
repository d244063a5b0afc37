"""The cubicasa5k floorplan dataset pipeline.

Counterpart of the reference ``megastep/cubicasa.py`` (``/root/reference/megastep/
cubicasa.py:39-224``): a license-gated download of the 5k-floorplan SVG dataset, a
cached SVG→geometry conversion, and a deterministic 90/10 train/test sampler.

Differences from the reference, by design:
  * the SVG→geometry conversion requires ``shapely`` (polygon booleans for door
    subtraction) and ``bs4``; both are optional extras, and the module stays
    importable without them;
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


def svg_walls(svg):
    """Parses wall segments from a cubicasa SVG (reference ``geometry.py:43-57``).
    Requires bs4 and shapely."""
    from bs4 import BeautifulSoup
    import shapely.geometry as sg
    import shapely.ops

    soup = BeautifulSoup(svg, features='xml')
    polys = []
    for e in soup.select('polygon'):
        cls = ' '.join(e.parent.get('class', []) if e.parent else [])
        if 'Wall' in cls or 'Railing' in cls:
            pts = np.array([list(map(float, p.split(','))) for p in e['points'].split()])
            if len(pts) >= 3:
                polys.append(sg.Polygon(pts).buffer(0))
    doors = []
    for e in soup.select('g'):
        if 'Door' in ' '.join(e.get('class', [])):
            pts = [p for poly in e.select('polygon')
                   for p in poly.get('points', '').split()]
            pts = np.array([list(map(float, p.split(','))) for p in pts]) if pts else None
            if pts is not None and len(pts) >= 3:
                doors.append(sg.Polygon(pts).buffer(.5))
    spaces = []
    for e in soup.select('g'):
        cls = ' '.join(e.get('class', []))
        if 'Space' in cls:
            poly = e.select_one('polygon')
            if poly is not None:
                pts = np.array([list(map(float, p.split(','))) for p in poly['points'].split()])
                if len(pts) >= 3:
                    spaces.append(pts)

    merged = shapely.ops.unary_union(polys)
    for d in doors:
        merged = merged.difference(d)

    walls = []
    geoms = getattr(merged, 'geoms', [merged])
    for g in geoms:
        if g.is_empty:
            continue
        for ring in [g.exterior, *g.interiors]:
            coords = np.array(ring.coords)
            walls.extend(np.stack([coords[:-1], coords[1:]], 1))
    return np.array(walls), spaces


def svg_geometry(id, svg):
    """One SVG → geometry dict: cm→m scaling, wall dedupe, masks, centroid lights
    (reference ``geometry.py:62-97``)."""
    from .constants import SVG_SCALE, MARGIN
    walls, spaces = svg_walls(svg)
    lo = walls.reshape(-1, 2).min(0)
    walls = (walls - lo) / SVG_SCALE + MARGIN
    spaces = [(np.asarray(s) - lo) / SVG_SCALE + MARGIN for s in spaces]
    walls = geometry.unique(walls)
    masks = geometry.masks(walls, spaces)
    lights = geometry.centroids(spaces)
    return dotdict(id=id, walls=walls, lights=lights, masks=masks, res=geometry.RES)


def geometry_data(regenerate=False):
    """Loads (building if needed) the geometry cache: a gzipped pickle of geometry
    dicts converted from the dataset SVGs (reference ``cubicasa.py:149-174``)."""
    cache = ROOT / 'geometries.pkl.gz'
    if cache.exists() and not regenerate:
        with gzip.open(cache, 'rb') as f:
            return pickle.load(f)

    import zipfile
    zpath = ROOT / 'cubicasa5k.zip'
    if not zpath.exists():
        download()
    geoms = []
    with zipfile.ZipFile(zpath) as z:
        names = sorted(n for n in z.namelist() if n.endswith('model.svg'))
        for n in names:
            try:
                geoms.append(svg_geometry(n, z.read(n).decode('utf8')))
            except Exception as e:
                log.warning('Skipping %s: %s', n, e)
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
