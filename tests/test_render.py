"""Renderer correctness: known distances in a box, hit bookkeeping, shading ranges,
and a scalar raycast oracle transcribing the reference kernel (kernels.cu:326-383)."""
import numpy as np
import jax.numpy as jnp
import pytest

from megastep_tpu import toys, scene, core
from megastep_tpu.ops import render as rnd

# toys.box(width=5) is the axis-aligned square [1, 6]^2.
CENTER = 3.5


def _core(n_envs=1, res=64, fov=130):
    geometries = [toys.box() for _ in range(n_envs)]
    scn = scene.scenery(geometries, 1, random=np.random.RandomState(0))
    return core.Core(scn, res=res, fov=fov)


def _agents_at(c, x, y, angle):
    agents = c.init_agents()
    agents['positions'] = jnp.broadcast_to(jnp.array([x, y]), agents.positions.shape)
    agents['angles'] = jnp.full_like(agents.angles, angle)
    return agents


def test_center_ray_distance():
    c = _core(res=65)  # odd res: middle ray passes near screen center
    agents = _agents_at(c, CENTER, CENTER, 0.)
    r = c.render(agents)
    d = np.asarray(r.distances)[0, 0]
    # Facing +x from the box center: wall x=6 is 2.5m away; the middle ray is close
    # to axis-aligned.
    mid = 65 // 2
    assert d[mid] == pytest.approx(2.5, abs=.01)
    # All rays hit (closed box), within [2.5, half-diagonal].
    assert (np.asarray(r.indices)[0, 0] >= 0).all()
    assert (d >= 2.5 - 1e-3).all() and (d <= 2.5 * 2**.5 + 1e-3).all()


def test_ray_angles():
    # With fov=90, the edge rays span just under ±45°: looking at a corner, the two
    # half-screens see the two adjoining walls symmetrically.
    c = _core(res=64, fov=90)
    agents = _agents_at(c, CENTER, CENTER, 45.)
    r = c.render(agents)
    d = np.asarray(r.distances)[0, 0]
    np.testing.assert_allclose(d, d[::-1], rtol=1e-4)
    # The central rays point near the corner (distance ~ 2.5*sqrt(2), a shade less
    # because with even res no ray hits 45° exactly).
    assert d.max() == pytest.approx(2.5 / np.cos(np.pi / 4 - np.arctan(1 / 64)), rel=1e-3)


def test_own_model_hidden_by_near_plane():
    # A single agent never sees its own body: no hits on dynamic line slots.
    c = _core()
    agents = _agents_at(c, CENTER, CENTER, 123.)
    r = c.render(agents)
    idx = np.asarray(r.indices)[0, 0]
    assert (idx >= c.scenery.n_dynamic).all()


def test_screen_ranges_and_miss_black():
    c = _core()
    agents = _agents_at(c, CENTER, CENTER, 0.)
    r = c.render(agents)
    screen = np.asarray(r.screen)
    assert screen.shape == (1, 1, 64, 3)
    assert (screen >= 0).all() and (screen <= 1).all()
    assert screen.max() > 0


def test_locations_dots_valid():
    c = _core()
    agents = _agents_at(c, CENTER, CENTER, 77.)
    r = c.render(agents)
    loc = np.asarray(r.locations)[0, 0]
    dots = np.asarray(r.dots)[0, 0]
    assert ((loc >= 0) & (loc <= 1)).all()
    assert ((dots >= -1 - 1e-5) & (dots <= 1 + 1e-5)).all()


def test_agents_see_each_other():
    # Two agents face each other: each sees the other's dynamic model lines.
    geometries = [toys.box()]
    scn = scene.scenery(geometries, 2, random=np.random.RandomState(0))
    c = core.Core(scn, res=64, fov=70)
    agents = c.init_agents()
    agents['positions'] = jnp.array([[[2.5, 3.5], [4.5, 3.5]]])
    agents['angles'] = jnp.array([[0., 180.]])
    r = c.render(agents)
    idx = np.asarray(r.indices)
    M = scn.n_model_lines
    # Agent 0 looks +x at agent 1: the central pixels hit agent 1's lines (slots
    # M..2M). The body is 0.15m wide at 2m with fov 70/64 per pixel => ~4 pixels.
    mid = idx[0, 0, 30:34]
    assert ((mid >= M) & (mid < 2 * M)).all()
    # And symmetrically.
    mid = idx[0, 1, 30:34]
    assert (mid < M).all()
    # Distance to the other agent's near edge: 2 - model half-width.
    d = np.asarray(r.distances)[0, 0, 31]
    assert d == pytest.approx(2 - .075, abs=.01)


def _raycast_oracle(lines, width, px, py, angle, res, hsw, radius):
    """Scalar transcription of raycast_kernel (kernels.cu:326-383)."""
    out = []
    for ri in range(res):
        ang = angle / 180 * np.pi
        c, s = np.cos(ang), np.sin(ang)
        uy = (res - 2 * ri - 1) * hsw / res
        ru = np.array([c - s * uy, s + c * uy])
        rlen = np.sqrt(ru @ ru)
        p = np.array([px, py])

        nearest_idx, nearest_s, nearest_loc, nearest_dot = -1, np.inf, np.nan, np.nan
        for l in range(width):
            a, b = lines[l, 0], lines[l, 1]
            v = b - a
            uxv = ru[0] * v[1] - ru[1] * v[0]
            if abs(uxv) < 1e-3:
                continue
            pq = a - p
            qs = (pq[0] * v[1] - pq[1] * v[0]) / uxv
            qt = (pq[0] * ru[1] - pq[1] * ru[0]) / uxv
            dt = (ru @ v) / (rlen * np.sqrt(v @ v) + 1e-6)
            if (0 <= qt <= 1) and (radius / rlen < qs) and (qs < nearest_s - 1e-4):
                nearest_idx, nearest_s, nearest_loc, nearest_dot = l, qs, qt, dt
        out.append((nearest_idx, nearest_s * rlen, nearest_loc, nearest_dot))
    return out


@pytest.mark.parametrize('angle', [0., 30., 123., -77.])
def test_raycast_vs_oracle(angle):
    c = _core(res=32)
    agents = _agents_at(c, 2.8, 4.1, angle)
    r = c.render(agents)
    lines = np.asarray(rnd.draw(c.scenery, agents))[0].astype(np.float64)
    expected = _raycast_oracle(lines, int(c.scenery.lines_width[0]), 2.8, 4.1,
                               angle, 32, c.half_screen_width, c.agent_radius)
    idx = np.asarray(r.indices)[0, 0]
    dist = np.asarray(r.distances)[0, 0]
    loc = np.asarray(r.locations)[0, 0]
    dots = np.asarray(r.dots)[0, 0]
    for ri, (ei, ed, el, edt) in enumerate(expected):
        assert idx[ri] == ei, f'ray {ri}'
        if ei >= 0:
            assert dist[ri] == pytest.approx(ed, rel=1e-4)
            assert loc[ri] == pytest.approx(el, rel=1e-3, abs=1e-4)
            assert dots[ri] == pytest.approx(edt, rel=1e-3, abs=1e-4)
