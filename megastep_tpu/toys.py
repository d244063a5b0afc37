"""Procedural toy geometries: the two single-room scenes every engine test
starts from (role of ``/root/reference/megastep/toys.py``)."""
import numpy as np

from . import geometry
from .dotdict import dotdict

#: Corner offsets of an axis-aligned unit square, CCW from the top-right —
#: the corner order the frozen goldens pin.
_CORNERS = np.array([[1., 1.], [-1., 1.], [-1., -1.], [1., -1.]])


def _square(half_side, center):
    """(4, 2) corner array of an axis-aligned square."""
    return half_side * _CORNERS + center


def _ring(corners):
    """Closed wall loop through the corners, as (4, 2, 2) segments."""
    return np.stack(geometry.cyclic_pairs(corners))


def box(width=5):
    """One square room of side ``width`` with a single centered light."""
    center = width / 2 + geometry.MARGIN
    room = _square(width / 2, center)
    return dotdict(
        walls=_ring(room),
        lights=np.full((1, 2), center),
        masks=geometry.masks(_ring(room), [room]),
        res=geometry.RES)


def column(width=5, column_width=.1):
    """A free-standing square column of side ``column_width`` in the middle of
    an (unwalled) square room, lit from four surrounding corners."""
    center = width / 2 + geometry.MARGIN
    pillar = _square(column_width / 2, center)
    room = _square(width / 2, center)
    return dotdict(
        walls=_ring(pillar),
        lights=_square(1., center),
        masks=geometry.masks(_ring(pillar), [room]),
        res=geometry.RES)
