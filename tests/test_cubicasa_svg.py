"""Cubicasa SVG parser tests on synthetic fixtures (reference behavior:
``megastep/geometry.py:43-97``). The element extraction (bs4) is always
tested; the polygon-boolean stage (shapely) is exercised when available."""
import numpy as np
import pytest

from megastep_tpu import cubicasa
from megastep_tpu.constants import MARGIN, SVG_SCALE

# A minimal cubicasa-style model.svg: a 6x6 m outer wall ring (four 20 cm-thick
# wall rectangles in cm units), one door through the south wall, two rooms.
APARTMENT_SVG = """<?xml version="1.0"?>
<svg xmlns="http://www.w3.org/2000/svg">
 <g class="FloorPlan">
  <g class="Wall"><polygon points="0,0 620,0 620,20 0,20"/></g>
  <g class="Wall"><polygon points="600,0 620,0 620,620 600,620"/></g>
  <g class="Wall"><polygon points="0,600 620,600 620,620 0,620"/></g>
  <g class="Wall"><polygon points="0,0 20,0 20,620 0,620"/></g>
  <g class="Wall"><polygon points="300,20 320,20 320,600 300,600"/></g>
  <g class="Door Swing"><polygon points="300,200 320,200 320,300 300,300"/></g>
  <g class="Space Kitchen"><polygon points="20,20 300,20 300,600 20,600"/></g>
  <g class="Space LivingRoom"><polygon points="320,20 600,20 600,600 320,600"/></g>
  <g class="Decor"><polygon points="50,50 60,50 60,60"/></g>
 </g>
</svg>"""

# Railings count as walls; degenerate (< 3 point) polygons are dropped; doors
# with no polygon children are ignored.
RAILING_SVG = """<?xml version="1.0"?>
<svg xmlns="http://www.w3.org/2000/svg">
 <g class="Railing"><polygon points="0,0 100,0 100,10 0,10"/></g>
 <g class="Wall"><polygon points="0,0 10,0"/></g>
 <g class="Door"></g>
 <g class="Space Bedroom"><polygon points="10,10 90,10 90,90 10,90"/></g>
</svg>"""


def test_svg_elements_extraction():
    els = cubicasa.svg_elements(APARTMENT_SVG)
    assert len(els.walls) == 5          # the Decor polygon is not a wall
    assert len(els.doors) == 1
    assert len(els.spaces) == 2
    np.testing.assert_allclose(els.walls[0][1], [620., 0.])
    np.testing.assert_allclose(els.doors[0][0], [300., 200.])
    assert all(w.shape[1] == 2 for w in els.walls)


def test_svg_elements_railing_and_degenerates():
    els = cubicasa.svg_elements(RAILING_SVG)
    assert len(els.walls) == 1          # railing kept, 2-point wall dropped
    assert len(els.doors) == 0          # empty door group ignored
    assert len(els.spaces) == 1


def test_svg_walls_boolean_stage():
    walls, spaces = cubicasa.svg_walls(APARTMENT_SVG)
    assert walls.ndim == 3 and walls.shape[1:] == (2, 2)
    assert len(spaces) == 2
    # The door subtraction must cut the inner dividing wall: some wall segment
    # endpoints appear at the door's dilated boundary y in [199.5, 300.5].
    ys = walls[..., 1].ravel()
    assert ((ys > 150) & (ys < 350)).any()


def test_svg_geometry_full():
    g = cubicasa.svg_geometry('fixture', APARTMENT_SVG)
    # cm -> m with a margin: the 620 cm extent becomes 6.2 m + 2*margin.
    hi = g.walls.reshape(-1, 2).max(0)
    np.testing.assert_allclose(hi, 620 / SVG_SCALE + MARGIN, rtol=1e-6)
    lo = g.walls.reshape(-1, 2).min(0)
    np.testing.assert_allclose(lo, MARGIN, rtol=1e-6)
    assert g.lights.shape == (2, 2)     # one centroid light per space
    assert (g.masks == 0).any() and (g.masks == -1).any() and (g.masks > 0).any()


# ---------------------------------------------------------------------------
# Real-markup goldens: faithful cubicasa5k model.svg excerpts (the dataset
# itself is license-gated, CC BY-NC). These exercise the structures real files
# have that the synthetic fixtures above don't: Door groups nested inside Wall
# groups, ThresholdArea sub-groups, multi-token Space classes, FixedFurniture
# polygons inside spaces, Window groups, text labels, misaligned doors,
# railings, and fully-enclosed cavities. Reference behavior:
# ``megastep/geometry.py:43-97``, ``megastep/cubicasa.py:149-174``.
# ---------------------------------------------------------------------------
from pathlib import Path

FIXTURES = Path(__file__).parent / 'fixtures' / 'cubicasa'


def _fixture(name):
    return (FIXTURES / name / 'model.svg').read_text()


def test_real_markup_elements_apartment():
    els = cubicasa.svg_elements(_fixture('apartment_a'))
    # 6 Wall groups; ThresholdArea/Window/FixedFurniture polygons excluded.
    assert len(els.walls) == 6
    assert len(els.doors) == 3
    assert len(els.spaces) == 3


def test_real_markup_elements_studio():
    els = cubicasa.svg_elements(_fixture('studio_b'))
    assert len(els.walls) == 9   # 8 walls + 1 railing; degenerate dropped
    assert len(els.doors) == 1   # the empty Door group is ignored
    assert len(els.spaces) == 1


def test_real_markup_geometry_apartment_golden():
    g = cubicasa.svg_geometry('apartment_a', _fixture('apartment_a'))
    lengths = np.linalg.norm(g.walls[:, 1] - g.walls[:, 0], axis=1)
    assert len(g.walls) == 36
    np.testing.assert_allclose(lengths.sum(), 73.65, atol=1e-6)
    # cm→m with y-flip: the 902.5 x 601 cm plan spans [1, 10.025] x [1, 7.01].
    lo = g.walls.reshape(-1, 2).min(0)
    hi = g.walls.reshape(-1, 2).max(0)
    np.testing.assert_allclose(lo, [1., 1.], atol=1e-9)
    np.testing.assert_allclose(hi, [10.025, 7.01], atol=1e-9)
    # Centroid lights, y-flipped: the living room centroid is at svg
    # (210.25, 300.5) cm -> (3.1025, 4.005) m.
    np.testing.assert_allclose(
        sorted(g.lights.tolist()),
        [[3.1025, 4.005], [7.5125, 2.505], [7.5125, 5.4075]], atol=1e-6)
    # Mask histogram frozen: walls -1, free 0, three spaces 1..3.
    assert g.masks.shape == (41, 56)
    vals, counts = np.unique(g.masks, return_counts=True)
    assert dict(zip(vals.tolist(), counts.tolist())) == {
        -1: 515, 0: 813, 1: 451, 2: 270, 3: 247}


def test_real_markup_geometry_studio_golden():
    g = cubicasa.svg_geometry('studio_b', _fixture('studio_b'))
    lengths = np.linalg.norm(g.walls[:, 1] - g.walls[:, 0], axis=1)
    assert len(g.walls) == 40
    np.testing.assert_allclose(lengths.sum(), 42.6, atol=1e-6)
    np.testing.assert_allclose(sorted(g.lights.tolist()), [[3.5, 3.0]])

    # The misaligned door (3 cm off its wall plane) must still cut a passage:
    # no wall segment spans the door's x-range on the south wall (svg y≈380-400
    # -> engine y in [1, 1.2]).
    south = g.walls[(g.walls[..., 1] <= 1.25).all(1)]
    xs = np.sort(south[..., 0].ravel())
    in_opening = (xs > 3.06) & (xs < 3.84)  # door 200..290 cm dilated by 5
    assert not in_opening.any()

    # The enclosed closet's cavity ring survives (80 x 80 cm hole => 3.2 m).
    closet = g.walls[((g.walls[..., 0] > 4.55) & (g.walls[..., 0] < 5.45)
                      & (g.walls[..., 1] > 3.5) & (g.walls[..., 1] < 4.45)).all(1)]
    cavity_len = np.linalg.norm(closet[:, 1] - closet[:, 0], axis=1).sum()
    np.testing.assert_allclose(cavity_len, 3.2, atol=1e-6)


def test_real_markup_rowhouse_transform_and_class_variants():
    """Markup variants: a ``transform`` attribute on the Floor group (the
    reference reads polygon points RAW and never applies transforms —
    ``geometry.py:27``; a global translate is also normalized away by the
    min-rebase), multi-token class lists (``Wall ExteriorWall``,
    ``Door ParallelOpposite``, ``Space Bath Scale1``), an unclassed stray
    polygon (ignored), and an L-shaped Space whose area centroid is the light."""
    els = cubicasa.svg_elements(_fixture('rowhouse_c'))
    assert len(els.walls) == 7   # ExteriorWall multi-token classes still match
    assert len(els.doors) == 2
    assert len(els.spaces) == 2  # the unclassed stray polygon is not a space

    g = cubicasa.svg_geometry('rowhouse_c', _fixture('rowhouse_c'))
    lengths = np.linalg.norm(g.walls[:, 1] - g.walls[:, 0], axis=1)
    assert len(g.walls) == 35
    np.testing.assert_allclose(lengths.sum(), 55.2, atol=1e-6)
    # Raw-points parity: the 800 x 400 cm plan spans [1, 9] x [1, 5] exactly —
    # the Floor group's translate(10, 20) must NOT shift relative geometry.
    np.testing.assert_allclose(g.walls.reshape(-1, 2).min(0), [1., 1.], atol=1e-9)
    np.testing.assert_allclose(g.walls.reshape(-1, 2).max(0), [9., 5.], atol=1e-9)
    # L-shaped living room: the AREA centroid (6.708621, 3.237069), not the
    # vertex mean — hand-computed from the two-rectangle decomposition.
    np.testing.assert_allclose(
        sorted(g.lights.tolist()),
        [[2.6, 3.0], [6.708621, 3.237069]], atol=1e-6)
    # door-1 (svg 300..320 x 100..180, dilated 5) cuts wall-5 clean through:
    # no wall segment inside the opening x in (4.0, 4.2), y in (3.15, 4.05).
    in_open = ((g.walls[..., 0] > 3.99) & (g.walls[..., 0] < 4.21)
               & (g.walls[..., 1] > 3.16) & (g.walls[..., 1] < 4.04)).all(1)
    assert not in_open.any()


def test_real_markup_loft_pillar_ring_and_railing():
    """A free-standing Wall pillar inside a Space: the union boundary emits the
    pillar's own ring and the mask paints its outline -1 over the room; a
    Railing merged into the west wall detours the inner ring; a Window nested
    in a Wall is excluded from every bucket."""
    els = cubicasa.svg_elements(_fixture('loft_d'))
    assert len(els.walls) == 6   # 5 walls + 1 railing; the Window is excluded
    assert len(els.doors) == 1
    assert len(els.spaces) == 1

    g = cubicasa.svg_geometry('loft_d', _fixture('loft_d'))
    lengths = np.linalg.norm(g.walls[:, 1] - g.walls[:, 0], axis=1)
    assert len(g.walls) == 28
    np.testing.assert_allclose(lengths.sum(), 51.6, atol=1e-6)
    # The pillar (svg 280..340 square, 0.6 m sides) survives as its own ring.
    ring = ((g.walls[..., 0] >= 3.79) & (g.walls[..., 0] <= 4.41)
            & (g.walls[..., 1] >= 3.79) & (g.walls[..., 1] <= 4.41)).all(1)
    assert ring.sum() == 4
    np.testing.assert_allclose(lengths[ring].sum(), 2.4, atol=1e-6)
    # Mask: pillar edges paint -1 over the room (reference masks() buffers
    # wall SEGMENTS, so the thick pillar's interior cell stays room-colored
    # in both implementations — pinned).
    from megastep_tpu import geometry
    edges = geometry.indices(
        np.array([[3.8, 4.1], [4.4, 4.1], [4.1, 4.405], [4.1, 3.805]]),
        g.masks.shape, g.res)
    assert all(g.masks[i, j] == -1 for i, j in edges)
    center = geometry.indices(np.array([[4.1, 4.105]]), g.masks.shape, g.res)
    assert g.masks[center[0, 0], center[0, 1]] == 1


def test_real_markup_duplex_disjoint_components():
    """Two disjoint wall unions (the reference's MultiPolygon skeleton branch,
    ``geometry.py:49-52``): each building contributes its own rings; a door
    through an exterior wall opens to the outside; a Door polygon outside
    every wall is a no-op cut; the corridor between buildings is free space."""
    els = cubicasa.svg_elements(_fixture('duplex_e'))
    assert len(els.walls) == 8
    assert len(els.doors) == 2   # the orphan door still parses
    assert len(els.spaces) == 2  # trailing-whitespace class token list

    g = cubicasa.svg_geometry('duplex_e', _fixture('duplex_e'))
    w = g.walls
    lengths = np.linalg.norm(w[:, 1] - w[:, 0], axis=1)
    assert len(w) == 36
    np.testing.assert_allclose(lengths.sum(), 67.2, atol=1e-6)
    # Component split at the corridor: building A (door-cut) 32.8 m of 20
    # segments, building B (intact, orphan-door no-op) 34.4 m of 16.
    a = (w[..., 0] <= 6.0).all(1)
    b = (w[..., 0] >= 8.4).all(1)
    assert (a | b).all() and a.sum() == 20 and b.sum() == 16
    np.testing.assert_allclose(lengths[a].sum(), 32.8, atol=1e-6)
    np.testing.assert_allclose(lengths[b].sum(), 34.4, atol=1e-6)
    np.testing.assert_allclose(
        sorted(g.lights.tolist()), [[3.5, 3.0], [10.9, 3.0]], atol=1e-6)
    # The corridor between buildings is free space in the mask.
    from megastep_tpu import geometry
    idx = geometry.indices(np.array([[7.2, 3.0]]), g.masks.shape, g.res)
    assert g.masks[idx[0, 0], idx[0, 1]] == 0


def test_geometry_data_zip_to_cache(tmp_path, monkeypatch):
    """The dataset pipeline end-to-end minus the download: a zip of model.svg
    entries (the dataset's layout) converts to the geometry cache, the cache
    round-trips, and `sample` draws from it deterministically (reference
    ``cubicasa.py:149-174, 177-224``)."""
    import zipfile
    monkeypatch.setattr(cubicasa, 'ROOT', tmp_path)
    monkeypatch.setattr(cubicasa, 'N_TEST', 1)
    zpath = tmp_path / 'cubicasa5k.zip'
    with zipfile.ZipFile(zpath, 'w') as z:
        for i, name in enumerate(['apartment_a', 'studio_b']):
            z.writestr(f'cubicasa5k/plans/{i}/model.svg', _fixture(name))
        z.writestr('cubicasa5k/plans/2/model.svg', '<svg></svg>')  # bad entry

    geoms = cubicasa.geometry_data()
    assert len(geoms) == 2              # the bad entry is skipped with a warning
    assert (tmp_path / f'geometries-v{cubicasa.CACHE_VERSION}.pkl.gz').exists()
    assert {g.id for g in geoms} == {'cubicasa5k/plans/0/model.svg',
                                     'cubicasa5k/plans/1/model.svg'}
    # Cache round-trip: a second call must not need the zip.
    zpath.unlink()
    again = cubicasa.geometry_data()
    np.testing.assert_array_equal(again[0].walls, geoms[0].walls)

    train = cubicasa.sample(3, fallback=None)
    test = cubicasa.sample(2, split='test', fallback=None)
    assert len(train) == 3 and len(test) == 2
    # Deterministic: same picks on a re-draw.
    np.testing.assert_array_equal(train[0].walls,
                                  cubicasa.sample(3, fallback=None)[0].walls)


def test_real_markup_drives_engine():
    """The parsed geometry must feed the engine end-to-end: scenery build, Core,
    one physics step, one render."""
    import jax.numpy as jnp
    from megastep_tpu import core, scene

    g = cubicasa.svg_geometry('apartment_a', _fixture('apartment_a'))
    scn = scene.scenery([g], n_agents=1, random=np.random.RandomState(0))
    c = core.Core(scn, res=32, fov=130, fps=10)
    agents = c.init_agents()
    agents['positions'] = jnp.asarray(g.lights[:1][None])  # spawn at a light
    agents, progress = c.physics(agents)
    r = c.render(agents)
    assert (r.indices >= 0).all()       # closed apartment: every ray hits
    assert float(r.distances.min()) > 0
