"""Procedural toy geometries (counterpart of ``/root/reference/megastep/toys.py``)."""
import numpy as np

from . import geometry
from .dotdict import dotdict


def box(width=5):
    """A geometry which is just a simple box, with one room and one light inside it."""
    corners = [(np.cos(t), np.sin(t)) for t in np.arange(np.pi / 4, 2 * np.pi, np.pi / 2)]
    corners = width / 2**.5 * np.array(corners) + width / 2 + geometry.MARGIN
    walls = np.stack(geometry.cyclic_pairs(corners))
    spaces = [corners]

    return dotdict(
        walls=walls,
        lights=np.full((1, 2), width / 2 + geometry.MARGIN),
        masks=geometry.masks(walls, spaces),
        res=geometry.RES)


def column(width=5, column_width=.1):
    """A geometry which is just a small 'column' (a tiny box), with one room around it."""
    corners = [(np.cos(t), np.sin(t)) for t in np.arange(np.pi / 4, 2 * np.pi, np.pi / 2)]
    column_corners = column_width / 2**.5 * np.array(corners) + width / 2 + geometry.MARGIN
    walls = np.stack(geometry.cyclic_pairs(column_corners))
    spaces = [width / 2**.5 * np.array(corners) + width / 2 + geometry.MARGIN]

    return dotdict(
        walls=walls,
        lights=2**.5 * np.array(corners) + width / 2 + geometry.MARGIN,
        masks=geometry.masks(walls, spaces),
        res=geometry.RES)
