"""Demo-env tests: reset/step protocol, reward semantics, jit-ability
(mirrors the behavior of ``/root/reference/megastep/demo/envs/``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from megastep_tpu import envs, floorplans
from megastep_tpu.arrdict import arrdict


@pytest.fixture(scope='module')
def key():
    return jax.random.PRNGKey(0)


def test_minimal(key):
    env = envs.Minimal(2)
    state, world = env.reset(key)
    assert world.obs.shape == (2, 1, 3, 1, 64)

    decision = arrdict(actions=jnp.ones((2, 1), jnp.int32))
    state, world = jax.jit(env.step)(state, decision, key)
    assert world.obs.shape == (2, 1, 3, 1, 64)
    assert float(world.obs.max()) <= 1. and float(world.obs.min()) >= 0.


def test_minimal_plot(key):
    import matplotlib
    matplotlib.use('Agg')
    env = envs.Minimal(1)
    state, world = env.reset(key)
    fig = env.display(state, world, 0)
    assert fig is not None


@pytest.fixture(scope='module')
def explorer():
    return envs.Explorer(2, geometries=floorplans.sample(2), res=64)


def test_explorer_protocol(explorer, key):
    env = explorer
    state, world = env.reset(key)
    assert world.obs.rgb.shape == (2, 1, 3, 1, 16)
    assert world.obs.d.shape == (2, 1, 1, 1, 16)
    assert world.obs.imu.shape == (2, 1, 3)
    assert world.reset.shape == (2,) and bool(world.reset.all())
    # The first observation sees some texels.
    assert (np.asarray(state.potential) > 0).all()

    step = jax.jit(env.step)
    rewards = []
    for i in range(4):
        decision = arrdict(actions=jnp.ones((2, 1), jnp.int32))
        state, world = step(state, decision, jax.random.fold_in(key, i))
        rewards.append(np.asarray(world.reward))
    # Moving forward reveals new texels, so some positive reward must appear.
    assert np.stack(rewards).sum() > 0
    # Potential counts seen texels.
    np.testing.assert_allclose(
        np.asarray(state.potential), np.asarray(state.seen.sum(-1)), atol=0)


def test_explorer_reward_is_new_texels(explorer, key):
    env = explorer
    state, world = env.reset(key)
    p0 = np.asarray(state.potential)
    decision = arrdict(actions=jnp.zeros((2, 1), jnp.int32))
    state2, world2 = jax.jit(env.step)(state, decision, key)
    expected = (np.asarray(state2.potential) - p0) / (env.core.res // 4)
    np.testing.assert_allclose(np.asarray(world2.reward), expected, atol=1e-6)


def test_deathmatch(key):
    env = envs.Deathmatch(8, n_agents=4, geometries=floorplans.sample(2), res=64)
    assert env.n_envs == 8
    state, world = env.reset(key)
    assert world.obs.rgb.shape == (8, 1, 3, 1, 16)
    assert world.obs.health.shape == (8, 1, 1)
    assert world.reward.shape == (8,)
    assert world.reset.shape == (8,)

    step = jax.jit(env.step)
    decision = arrdict(actions=jnp.ones((8, 1), jnp.int32))
    h0 = np.asarray(state.health)
    state, world = step(state, decision, key)
    # Health decays by at least the .001 per-step tax.
    assert (np.asarray(state.health) <= h0 - .0009).all()
    assert np.asarray(state.matchings).shape == (2, 4, 4)


def test_deathmatch_respawn(key):
    env = envs.Deathmatch(4, n_agents=2, geometries=floorplans.sample(2), res=64)
    state, world = env.reset(key)
    state['health'] = jnp.zeros_like(state.health)
    decision = arrdict(actions=jnp.zeros((4, 1), jnp.int32))
    state2, world2 = jax.jit(env.step)(state, decision, key)
    assert bool(world2.reset.all())
    assert (np.asarray(state2.health) > .9).all()


def test_scene_order_attribution(key):
    """Envs sort scenes by size; scene_order maps env index -> the caller's
    original geometry list, and sort_scenes=False keeps the caller's order."""
    from megastep_tpu import scene

    geoms = floorplans.sample(4)
    sizes = scene.texel_sizes(geoms, 1)
    env = envs.Explorer(4, geometries=geoms, res=64)
    # scenery tex widths are ascending (sorted build)
    tw = np.asarray(env.core.scenery.tex_width)
    assert (np.diff(tw) >= 0).all()
    # env i was built from geoms[scene_order[i]]
    assert sorted(env.scene_order.tolist()) == [0, 1, 2, 3]
    got_sizes = sizes[env.scene_order]
    assert (np.diff(got_sizes) >= 0).all()

    unsorted = envs.Explorer(4, geometries=geoms, res=64, sort_scenes=False)
    assert unsorted.scene_order.tolist() == [0, 1, 2, 3]
