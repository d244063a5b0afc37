"""TPU-path render tests, runnable on CPU: MXU one-hot lookups vs gathers, and
the split-pipeline render() contract. (The standalone Pallas raycast kernel was
deleted — it measurably lost to XLA's fused reduction, PERF.md negative results;
the production TPU kernel is ops/fused.py, tested in test_fused.py.)"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from megastep_tpu import core, scene, toys
from megastep_tpu.ops import render


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


def test_render_rejects_unknown_backend():
    """`render(backend=)` is 'jnp'-only; anything else errors with a pointer to
    the fused kernel rather than silently running a slower path."""
    scn = scene.scenery([toys.box()], n_agents=1,
                        random=np.random.RandomState(5))
    c = core.Core(scn, res=32, fov=130)
    agents = c.init_agents()
    with pytest.raises(ValueError, match='fused'):
        render.render(scn, agents, c.res, c.half_screen_width, c.agent_radius,
                      backend='pallas')
