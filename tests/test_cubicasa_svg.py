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
