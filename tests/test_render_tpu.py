"""TPU-path render tests, runnable on CPU: MXU one-hot lookups vs gathers, and the
Pallas raycast kernel (interpreter mode) vs the jnp reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from megastep_tpu import core, scene, toys
from megastep_tpu.ops import render, render_pallas


def test_onehot_lookup_matches_gather():
    key = jax.random.PRNGKey(0)
    N, T, K, P = 6, 37, 3, 11
    values = jax.random.normal(key, (N, T, K))
    idx = jax.random.randint(jax.random.fold_in(key, 1), (N, P), 0, T)

    got = render.onehot_lookup(values, idx, chunk=4)
    want = jnp.take_along_axis(values, idx[..., None], 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_onehot_any_matches_scatter():
    key = jax.random.PRNGKey(2)
    N, T, P = 5, 29, 17
    idx = jax.random.randint(key, (N, P), 0, T)
    mask = jax.random.uniform(jax.random.fold_in(key, 1), (N, P)) > .5

    got = render.onehot_any(idx, mask, T, chunk=4)
    want = jax.vmap(lambda i, m: jnp.zeros(T, bool).at[i].max(m))(idx, mask)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_shade_methods_agree():
    scn = scene.scenery([toys.box(), toys.column()], n_agents=1,
                        random=np.random.RandomState(3))
    c = core.Core(scn, res=32, fov=130)
    agents = c.init_agents()
    agents['positions'] = jnp.full_like(agents.positions, 3.4)
    lines_now = render.draw(scn, agents)
    rc = render.raycast(lines_now, scn.lines_width, agents.angles,
                        agents.positions, c.res, c.half_screen_width,
                        c.agent_radius)
    a = render.shade(scn, rc, scn.baked, method='gather')
    b = render.shade(scn, rc, scn.baked, method='onehot')
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_pallas_raycast_interpret():
    """The Pallas kernel reproduces the jnp raycast bit-for-bit (interpreter mode
    on CPU; the same assertions run against real Mosaic on TPU)."""
    scn = scene.scenery([toys.box() for _ in range(8)], n_agents=2,
                        random=np.random.RandomState(5))
    c = core.Core(scn, res=128, fov=130)
    agents = c.init_agents()
    key = jax.random.PRNGKey(0)
    agents['positions'] = 3. + jax.random.uniform(key, agents.positions.shape)
    agents['angles'] = jax.random.uniform(
        jax.random.fold_in(key, 1), agents.angles.shape, minval=-180, maxval=180)
    lines_now = render.draw(scn, agents)

    want = render.raycast(lines_now, scn.lines_width, agents.angles,
                          agents.positions, c.res, c.half_screen_width,
                          c.agent_radius)
    got = render_pallas.raycast(lines_now, scn.lines_width, agents.angles,
                                agents.positions, c.res, c.half_screen_width,
                                c.agent_radius, interpret=True)
    np.testing.assert_array_equal(np.asarray(want.indices), np.asarray(got.indices))
    # The kernel reads the winner's s/t off the masked (R, L) products instead of
    # recomputing the intersection, so values agree to f32 ULPs, not bits.
    np.testing.assert_allclose(np.asarray(want.locations), np.asarray(got.locations),
                               rtol=1e-5, atol=3e-6, equal_nan=True)
    np.testing.assert_allclose(np.asarray(want.distances), np.asarray(got.distances),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(want.dots), np.asarray(got.dots),
                               rtol=1e-5, atol=1e-6, equal_nan=True)


def test_pallas_supported_gate():
    assert render_pallas.supported(256, 48)
    assert not render_pallas.supported(100, 48)     # res not lane-aligned
    assert not render_pallas.supported(256, 4096)   # working set too big
