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
    sg = pytest.importorskip('shapely')  # noqa: F841
    walls, spaces = cubicasa.svg_walls(APARTMENT_SVG)
    assert walls.ndim == 3 and walls.shape[1:] == (2, 2)
    assert len(spaces) == 2
    # The door subtraction must cut the inner dividing wall: some wall segment
    # endpoints appear at the door's dilated boundary y in [199.5, 300.5].
    ys = walls[..., 1].ravel()
    assert ((ys > 150) & (ys < 350)).any()


def test_svg_geometry_full():
    pytest.importorskip('shapely')
    g = cubicasa.svg_geometry('fixture', APARTMENT_SVG)
    # cm -> m with a margin: the 620 cm extent becomes 6.2 m + 2*margin.
    hi = g.walls.reshape(-1, 2).max(0)
    np.testing.assert_allclose(hi, 620 / SVG_SCALE + MARGIN, rtol=1e-6)
    lo = g.walls.reshape(-1, 2).min(0)
    np.testing.assert_allclose(lo, MARGIN, rtol=1e-6)
    assert g.lights.shape == (2, 2)     # one centroid light per space
    assert (g.masks == 0).any() and (g.masks == -1).any() and (g.masks > 0).any()
