"""Pins `megastep_tpu.polygons` — the dependency-free boolean stage under the
cubicasa pipeline (replaces the reference's shapely usage,
``megastep/geometry.py:43-57``)."""
import numpy as np
import pytest

from megastep_tpu import polygons


def _total(segs):
    return np.linalg.norm(segs[:, 1] - segs[:, 0], axis=1).sum()


def test_single_square():
    segs = polygons.boundary_segments([[[0, 0], [10, 0], [10, 10], [0, 10]]])
    np.testing.assert_allclose(_total(segs), 40)
    # Orientation: solid on the left of every segment.
    mid = segs.mean(1)
    t = segs[:, 1] - segs[:, 0]
    left = mid + 1e-6 * np.stack([-t[:, 1], t[:, 0]], 1) / np.linalg.norm(t, axis=1, keepdims=True)
    assert polygons.points_in_polygon(
        left, np.array([[0, 0], [10, 0], [10, 10], [0, 10.]])).all()


def test_union_removes_seam():
    r1 = [[0, 0], [10, 0], [10, 5], [0, 5]]
    r2 = [[5, 0], [15, 0], [15, 5], [5, 5]]
    segs = polygons.boundary_segments([r1, r2])
    np.testing.assert_allclose(_total(segs), 2 * 15 + 2 * 5)


def test_difference_notch():
    sq = [[0, 0], [10, 0], [10, 10], [0, 10]]
    notch = [[4, -1], [6, -1], [6, 1], [4, 1]]
    segs = polygons.boundary_segments([sq], [np.array(notch, float)])
    # South edge loses the 2-wide gap; the notch contributes 2 verticals + top.
    np.testing.assert_allclose(_total(segs), 40 - 2 + 2 + 2)


def test_hole_ring_kept():
    outer = [[0, 0], [20, 0], [20, 20], [0, 20]]
    cavity = [[5, 5], [15, 5], [15, 15], [5, 15]]
    segs = polygons.boundary_segments([outer], [np.array(cavity, float)])
    np.testing.assert_allclose(_total(segs), 80 + 40)


def test_cut_outside_solid_is_noop():
    sq = [[0, 0], [10, 0], [10, 10], [0, 10]]
    far = [[50, 50], [60, 50], [60, 60], [50, 60]]
    segs = polygons.boundary_segments([sq], [np.array(far, float)])
    np.testing.assert_allclose(_total(segs), 40)


def test_orientation_insensitive_inputs():
    cw = [[0, 0], [0, 10], [10, 10], [10, 0]]  # clockwise vertex order
    segs = polygons.boundary_segments([cw])
    np.testing.assert_allclose(_total(segs), 40)


def test_rotated_polygons():
    c, s = np.cos(.3), np.sin(.3)
    R = np.array([[c, -s], [s, c]])
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10.]]) @ R.T
    segs = polygons.boundary_segments([sq])
    np.testing.assert_allclose(_total(segs), 40, rtol=1e-9)


def test_dilate_convex_rect():
    rect = np.array([[0, 0], [10, 0], [10, 4], [0, 4.]])
    fat = polygons.dilate_convex(rect, 1.)
    lo, hi = fat.min(0), fat.max(0)
    np.testing.assert_allclose(lo, [-1, -1])
    np.testing.assert_allclose(hi, [11, 5])


def test_points_in_polygon():
    tri = np.array([[0, 0], [4, 0], [0, 4.]])
    pts = np.array([[1, 1], [3, 3], [-1, 0], [2, 1.5]])
    np.testing.assert_array_equal(
        polygons.points_in_polygon(pts, tri), [True, False, False, True])


def _raster_region(solids, cuts, res=.05, pad=2.):
    """Grid-sample oracle for union(solids) - union(cuts)."""
    pts = np.concatenate([np.asarray(p, float) for p in solids])
    lo, hi = pts.min(0) - pad, pts.max(0) + pad
    xs = np.arange(lo[0], hi[0], res) + res / 2
    ys = np.arange(lo[1], hi[1], res) + res / 2
    gx, gy = np.meshgrid(xs, ys)
    grid = np.stack([gx.ravel(), gy.ravel()], -1)
    inside = np.zeros(len(grid), bool)
    for p in solids:
        inside |= polygons.points_in_polygon(grid, np.asarray(p, float))
    for p in cuts:
        inside &= ~polygons.points_in_polygon(grid, np.asarray(p, float))
    return inside.reshape(gy.shape[0], gx.shape[1]), res


@pytest.mark.parametrize('seed', range(5))
def test_random_rect_soup_vs_raster_oracle(seed):
    """Randomized cross-check: for soups of random axis-aligned + rotated
    rectangles with random cuts, the exact boundary length must match a
    fine-grid rasterization's perimeter estimate of the same region."""
    rng = np.random.RandomState(seed)

    def rect(rng, rotated):
        c = rng.uniform(0, 10, 2)
        w, h = rng.uniform(.8, 4, 2)
        pts = np.array([[-w, -h], [w, -h], [w, h], [-w, h]]) / 2
        if rotated:
            a = rng.uniform(0, np.pi)
            R = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
            pts = pts @ R.T
        return pts + c

    solids = [rect(rng, i % 2) for i in range(4)]
    cuts = [rect(rng, 0) * .5 for _ in range(2)]
    segs = polygons.boundary_segments(solids, cuts)
    exact = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=1).sum()

    mask, res = _raster_region(solids, cuts, res=.02)
    # Perimeter estimate: count exposed cell faces along both axes.
    faces = (np.abs(np.diff(mask.astype(int), axis=0)).sum()
             + np.abs(np.diff(mask.astype(int), axis=1)).sum())
    manhattan = faces * res
    # A grid perimeter overestimates diagonal boundaries by up to √2 and
    # resolution noise; the exact length must sit inside [manhattan/√2·(1-ε),
    # manhattan·(1+ε)].
    assert exact <= manhattan * 1.05, (exact, manhattan)
    assert exact >= manhattan / np.sqrt(2) * 0.95, (exact, manhattan)

    # Every kept segment is a true boundary: one side in, one side out.
    mid = segs.mean(1)
    t = segs[:, 1] - segs[:, 0]
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    n = np.stack([-t[:, 1], t[:, 0]], 1)

    def region(pts):
        inside = np.zeros(len(pts), bool)
        for p in solids:
            inside |= polygons.points_in_polygon(pts, np.asarray(p, float))
        for p in cuts:
            inside &= ~polygons.points_in_polygon(pts, np.asarray(p, float))
        return inside

    lhs, rhs = region(mid + 1e-6 * n), region(mid - 1e-6 * n)
    assert (lhs ^ rhs).all()
    assert lhs.all()   # solid on the left (orientation contract)


@pytest.mark.parametrize('seed', range(3))
def test_floorplan_scale_soup_vs_raster_oracle(seed):
    """Boolean stage at real-floorplan scale (reference workloads feed 20-60
    wall polygons + ~10 door cuts per plan, ``megastep/cubicasa.py:149-174``):
    a generated plan — outer ring, room-grid partition walls, pillars, a
    couple of rotated braces — with door cuts through random partition walls.
    Same raster-perimeter oracle and boundary-sidedness contract as the small
    soups above, at the polygon counts the dataset actually produces."""
    rng = np.random.RandomState(100 + seed)
    t = .2                          # wall thickness, m
    W, H = rng.uniform(8, 14), rng.uniform(6, 10)

    def hwall(x0, x1, y):
        return np.array([[x0, y], [x1, y], [x1, y + t], [x0, y + t]])

    def vwall(x, y0, y1):
        return np.array([[x, y0], [x + t, y0], [x + t, y1], [x, y1]])

    solids = [hwall(1, 1 + W, 1), hwall(1, 1 + W, 1 + H - t),
              vwall(1, 1, 1 + H), vwall(1 + W - t, 1, 1 + H)]
    # Room grid: 3-5 vertical + 2-3 horizontal partitions, jittered.
    vxs = np.sort(rng.uniform(2.5, W - .5, rng.randint(3, 6))) + 1
    hys = np.sort(rng.uniform(2, H - .5, rng.randint(2, 4))) + 1
    cuts = []
    for x in vxs:
        solids.append(vwall(x, 1 + t, 1 + H - t))
        y = rng.uniform(1.5, H - .5) + 1
        cuts.append(vwall(x, y, y + .9))    # door through it
    for y in hys:
        solids.append(hwall(1 + t, 1 + W - t, y))
        x = rng.uniform(1.5, W - 1.5) + 1
        cuts.append(hwall(x, x + .9, y))
    # Pillars + two rotated braces (off-axis vertices).
    for _ in range(rng.randint(2, 5)):
        c = rng.uniform(2.5, min(W, H) - .5, 2) + 1
        s = rng.uniform(.3, .7)
        solids.append(np.array([[0, 0], [s, 0], [s, s], [0, s]]) + c)
    for _ in range(2):
        c = rng.uniform(3, min(W, H) - 1, 2) + 1
        a = rng.uniform(0, np.pi)
        R = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
        pts = np.array([[-1.2, -t], [1.2, -t], [1.2, t], [-1.2, t]]) / 2
        solids.append(pts @ R.T + c)
    # Dilate cuts like the pipeline does (cubicasa.svg_walls, 5 cm).
    cuts = [polygons.dilate_convex(c, .05) for c in cuts]
    assert len(solids) >= 15 and len(cuts) >= 5

    segs = polygons.boundary_segments(solids, cuts)
    exact = _total(segs)
    mask, res = _raster_region(solids, cuts, res=.02)
    faces = (np.abs(np.diff(mask.astype(int), axis=0)).sum()
             + np.abs(np.diff(mask.astype(int), axis=1)).sum())
    manhattan = faces * res
    assert exact <= manhattan * 1.05, (exact, manhattan)
    assert exact >= manhattan / np.sqrt(2) * 0.95, (exact, manhattan)

    mid = segs.mean(1)
    tangents = segs[:, 1] - segs[:, 0]
    tangents /= np.linalg.norm(tangents, axis=1, keepdims=True)
    normals = np.stack([-tangents[:, 1], tangents[:, 0]], 1)

    def region(pts):
        inside = np.zeros(len(pts), bool)
        for p in solids:
            inside |= polygons.points_in_polygon(pts, np.asarray(p, float))
        for p in cuts:
            inside &= ~polygons.points_in_polygon(pts, np.asarray(p, float))
        return inside

    lhs, rhs = region(mid + 1e-6 * normals), region(mid - 1e-6 * normals)
    assert (lhs ^ rhs).all()
    assert lhs.all()
