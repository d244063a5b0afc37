import numpy as np

from megastep_tpu import geometry, toys


def test_cyclic_pairs():
    assert geometry.cyclic_pairs([1, 2, 3]) == [(1, 2), (2, 3), (3, 1)]


def test_signed_area_orientation():
    square = np.array([[0, 0], [1, 0], [1, 1], [0, 1]])
    assert geometry.signed_area(square) > 0
    assert (geometry.orient(square[::-1]) == square[::-1][::-1]).all()


def test_unique_walls():
    w = np.array([[[0, 0], [1, 0]], [[1, 0], [0, 0]], [[0, 0], [0, 1]]], dtype=float)
    u = geometry.unique(w)
    assert len(u) == 2


def test_point_in_polygon():
    square = np.array([[0, 0], [2, 0], [2, 2], [0, 2]])
    pts = np.array([[1, 1], [3, 1], [-1, -1], [1.9, 1.9]])
    inside = geometry.point_in_polygon(pts, square)
    assert inside.tolist() == [True, False, False, True]


def test_segment_point_distance():
    a, b = np.array([0., 0.]), np.array([2., 0.])
    pts = np.array([[1., 1.], [3., 0.], [-1., 0.], [1., 0.]])
    d = geometry.segment_point_distance(a, b, pts)
    np.testing.assert_allclose(d, [1., 1., 1., 0.], atol=1e-12)


def test_masks_box():
    g = toys.box()
    m = g.masks
    # Room cells, free cells, wall cells all present.
    assert (m == 1).sum() > 0
    assert (m == 0).sum() > 0
    assert (m == -1).sum() > 0
    # The center of the box is inside the room.
    center = np.array([[2.5 + 1., 2.5 + 1.]])
    ij = geometry.indices(center, m.shape, g.res)[0]
    assert m[ij[0], ij[1]] == 1
    # Room cells are clear of walls: every >0 cell center is at least half a cell
    # from every wall.
    centers = geometry.cell_centers(m.shape, g.res)
    room = centers[m > 0]
    d = geometry.segment_point_distance(
        g.walls[:, None, 0], g.walls[:, None, 1], room[None])
    assert d.min() > g.res / 2


def test_centers_indices_roundtrip():
    shape, res = (20, 30), .2
    ij = np.array([[3, 4], [10, 25]])
    xy = geometry.centers(ij, shape, res)
    back = geometry.indices(xy, shape, res)
    np.testing.assert_array_equal(ij, back)


def test_centroids():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]])
    c = geometry.centroids([sq])
    np.testing.assert_allclose(c, [[1., 1.]], atol=1e-12)
    assert geometry.centroids([]).shape == (0, 2)


def test_toys_column():
    g = toys.column()
    assert g.walls.shape == (4, 2, 2)
    assert (g.masks > 0).sum() > 0
