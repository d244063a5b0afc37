"""Scene compilation and light baking."""
import numpy as np
import jax.numpy as jnp
import pytest

from megastep_tpu import toys, scene, constants
from megastep_tpu.ops import bake


def _scn(n_envs=2, n_agents=1, baked=True):
    geometries = [toys.box() for _ in range(n_envs)]
    return scene.scenery(geometries, n_agents,
                         random=np.random.RandomState(0),
                         bake_fn='auto' if baked else None)


def test_shapes_and_layout():
    scn = _scn(3, n_agents=2)
    N, L = scn.lines.shape[:2]
    assert N == 3
    # 2 agents x 8 model lines of dynamic slots, then 4 box walls.
    assert scn.n_dynamic == 16
    assert (np.asarray(scn.lines_width) == 20).all()
    assert L >= 20 and L % 16 == 0
    # Texels pack line-major; each line's span is consistent.
    starts = np.asarray(scn.line_tex_starts[0])
    widths = np.asarray(scn.line_tex_widths[0])
    nl = int(scn.lines_width[0])
    assert starts[0] == 0
    np.testing.assert_array_equal(starts[1:nl], (starts + widths)[:nl - 1])
    assert starts[nl - 1] + widths[nl - 1] == int(scn.tex_width[0])
    # tex_line inverts the spans.
    tl = np.asarray(scn.tex_line[0])
    for l in range(nl):
        assert (tl[starts[l]:starts[l] + widths[l]] == l).all()


def test_texture_values():
    scn = _scn(1)
    tex = np.asarray(scn.textures[0, :int(scn.tex_width[0])])
    assert (tex >= 0).all() and (tex <= 1).all()
    # Agent texels (the dynamic head) have no wall pattern applied: the agent's
    # nose texels are pure red, gamma-decoded.
    widths = np.asarray(scn.line_tex_widths[0])
    starts = np.asarray(scn.line_tex_starts[0])
    nose = starts[3]  # line 3 of the model is the red nose edge
    np.testing.assert_allclose(tex[nose], constants.gamma_decode(np.array([1., 0., 0.])), atol=1e-6)


def test_texel_points_lie_on_lines():
    scn = _scn(1)
    T = int(scn.tex_width[0])
    C = np.asarray(bake.texel_points(scn.lines, scn.tex_line, scn.line_tex_starts,
                                     scn.line_tex_widths, 0, T))[0]
    lines = np.asarray(scn.lines[0])
    tl = np.asarray(scn.tex_line[0, :T])
    a, b = lines[tl, 0], lines[tl, 1]
    # Each texel center is on its owning segment.
    d = np.abs((C - a)[:, 0] * (b - a)[:, 1] - (C - a)[:, 1] * (b - a)[:, 0])
    assert d.max() < 1e-5
    t = ((C - a) * (b - a)).sum(-1) / ((b - a)**2).sum(-1)
    assert (t > 0).all() and (t < 1).all()


def _bake_oracle(scn, n):
    """Direct numpy transcription of the reference baking math (kernels.cu:238-284)."""
    nl = int(scn.lines_width[n])
    T = int(scn.tex_width[n])
    lines = np.asarray(scn.lines[n, :nl], dtype=np.float64)
    lights = np.asarray(scn.lights[n, :int(scn.lights_width[n])], dtype=np.float64)
    C = np.asarray(bake.texel_points(scn.lines, scn.tex_line, scn.line_tex_starts,
                                     scn.line_tex_widths, 0, T))[n].astype(np.float64)
    nd = scn.n_dynamic
    out = np.ones(T)
    for t in range(T):
        intensity = constants.AMBIENT
        for I in lights:
            u = C[t] - I[:2]
            unobstructed = True
            for l in range(nd, nl):
                a, v = lines[l, 0], lines[l, 1] - lines[l, 0]
                uxv = u[0] * v[1] - u[1] * v[0]
                if abs(uxv) < 1e-3:
                    continue
                pq = a - I[:2]
                s = (pq[0] * v[1] - pq[1] * v[0]) / uxv
                tt = (pq[0] * u[1] - pq[1] * u[0]) / uxv
                if (tt > 0) and (tt < 1) and (s > 0) and (s < .999):
                    unobstructed = False
            d2 = u @ u
            if unobstructed:
                intensity += constants.LUMINANCE * I[2] / max(d2, 1.)
        out[t] = min(intensity, 1.)
    return out


def test_bake_vs_oracle():
    scn = _scn(2)
    for n in range(2):
        expected = _bake_oracle(scn, n)
        actual = np.asarray(scn.baked[n, :len(expected)])
        np.testing.assert_allclose(actual, expected, rtol=1e-4, atol=1e-5)


def test_bake_occlusion():
    # A column inside a box casts a shadow: texels behind the column relative to the
    # light are ambient-only.
    g = toys.column()
    g['walls'] = np.concatenate([toys.box()['walls'], g['walls']])
    g['lights'] = np.array([[4.5, 3.5]])  # right of the column at (3.5, 3.5)
    scn = scene.scenery([g], 1, random=np.random.RandomState(0))
    baked = np.asarray(scn.baked[0, :int(scn.tex_width[0])])
    T = int(scn.tex_width[0])
    C = np.asarray(bake.texel_points(scn.lines, scn.tex_line, scn.line_tex_starts,
                                     scn.line_tex_widths, 0, T))[0]
    # Box texels on the far (left) side of the column, roughly behind it.
    shadowed = (C[:, 0] < 1.2) & (abs(C[:, 1] - 3.5) < .1)
    assert shadowed.any()
    np.testing.assert_allclose(baked[shadowed], constants.AMBIENT, atol=1e-6)


def test_state_snapshot():
    scn = _scn(2)
    st = scn.state(1)
    assert st.lines.shape == (12, 2, 2)
    assert st.textures.vals.shape[0] == int(scn.tex_width[1])
