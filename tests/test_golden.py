"""Golden-trajectory regression tests: fixed seed + fixed action stream must keep
producing the same physics trajectory and render statistics (the SURVEY §7 step-11
"trajectory-level agreement" harness — the ground truth here is this engine's own
documented math, frozen at the values below)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from megastep_tpu import core, modules, scene, toys
from megastep_tpu.arrdict import arrdict


@pytest.fixture(scope='module')
def sim():
    scn = scene.scenery([toys.box()], n_agents=1, random=np.random.RandomState(7))
    c = core.Core(scn, res=64, fov=130, fps=10)
    mover = modules.SimpleMovement(c)
    return c, mover


def _rollout(c, mover, actions):
    agents = c.init_agents()
    agents['positions'] = jnp.full_like(agents.positions, 3.5)

    def step(agents, a):
        agents, progress = mover(agents, arrdict(actions=a[None, None]))
        return agents, (agents.positions[0, 0], progress[0, 0])

    agents, (pos, progress) = jax.lax.scan(step, agents, jnp.asarray(actions))
    return np.asarray(pos), np.asarray(progress)


def test_golden_free_flight(sim):
    """Forward motion in open space: exactly speed/fps per step, progress 1."""
    c, mover = sim
    pos, progress = _rollout(c, mover, [1] * 3)  # forward
    np.testing.assert_allclose(progress, 1., atol=1e-6)
    np.testing.assert_allclose(pos[:, 1] - 3.5, [.1, .2, .3], atol=1e-5)
    np.testing.assert_allclose(pos[:, 0], 3.5, atol=1e-6)


def test_golden_wall_stop(sim):
    """Driving at a wall: position freezes ~agent_radius short of the wall plane
    and progress collapses to 0 (the reference's collision semantics)."""
    c, mover = sim
    pos, progress = _rollout(c, mover, [3] * 40)  # strafe +x toward the x=6 wall
    assert progress[-1] == 0.
    # box(width=5) walls sit at x,y in {1, 6}; the stop point is the wall minus
    # the 0.99-margined agent radius (frozen golden: 5.89383).
    np.testing.assert_allclose(pos[-1, 0], 5.89383, atol=1e-4)
    np.testing.assert_allclose(pos[-1, 1], 3.5, atol=1e-6)
    np.testing.assert_allclose(pos[-1], pos[-5], atol=1e-6)  # fully stopped


def test_golden_turn(sim):
    """Turning: exactly ang_speed/fps degrees per step, no translation."""
    c, mover = sim
    agents = c.init_agents()
    agents['positions'] = jnp.full_like(agents.positions, 3.5)
    for _ in range(5):
        agents, progress = mover(agents, arrdict(actions=jnp.full((1, 1), 5)))
    # ang_speed=180 deg/s is a velocity target; physics integrates it by fps:
    # 1.8 deg per step (identical to the reference's SimpleMovement+physics).
    np.testing.assert_allclose(np.asarray(agents.angles[0, 0]), 5 * 1.8, atol=1e-4)
    np.testing.assert_allclose(np.asarray(agents.positions[0, 0]), 3.5, atol=1e-6)


def test_golden_render_stats(sim):
    """Frozen render statistics for a fixed pose — catches any silent change to
    raycast/shade semantics."""
    c, _ = sim
    agents = c.init_agents()
    agents['positions'] = jnp.full_like(agents.positions, 3.5)
    agents['angles'] = jnp.full_like(agents.angles, 30.)
    r = c.render(agents)

    assert bool((r.indices >= 8).all())           # walls only (8 model lines first)
    d = np.asarray(r.distances[0, 0])
    s = np.asarray(r.screen[0, 0])
    assert (s > 0).any() and s.max() <= 1. and s.min() >= 0.
    # Hard-coded frozen constants (box scenery, seed 7, pose (3.5, 3.5) @ 30°):
    # any silent change to raycast/shade math shows up here.
    np.testing.assert_allclose(d.mean(), 2.7179689, rtol=1e-5)
    np.testing.assert_allclose(d.min(), 2.5000422, rtol=1e-5)
    np.testing.assert_allclose(d.max(), 3.4305263, rtol=1e-5)
    np.testing.assert_allclose(s.sum(), 10.617100, rtol=1e-4)
    assert int(np.asarray(r.indices).sum()) == 620
    np.testing.assert_allclose(np.asarray(r.locations[0, 0]).mean(), 0.4114983,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r.dots[0, 0]).mean(), -0.1577556,
                               rtol=1e-4)


def test_golden_momentum_floorplan():
    """Frozen 12-step MomentumMovement trajectory + render on a multi-wall
    procedural floorplan — the cross-module regression freeze (movement ×
    physics × spawns × raycast × shade)."""
    from megastep_tpu import floorplans
    geoms = floorplans.sample(2)
    scn = scene.scenery(geoms, n_agents=1, random=np.random.RandomState(3))
    c = core.Core(scn, res=64, fov=130, fps=10)
    mover = modules.MomentumMovement(c)
    spawner = modules.RandomSpawns(geoms, c)
    agents = spawner(c.init_agents(), c.agent_full(True), jax.random.PRNGKey(11))
    actions = jnp.asarray([1, 1, 3, 1, 4, 5, 1, 1, 6, 1, 2, 1])[:, None, None]

    def step(ag, a):
        ag, progress = mover(ag, arrdict(actions=a))
        return ag, progress

    agents, progress = jax.lax.scan(step, agents, actions)
    np.testing.assert_allclose(
        np.asarray(agents.positions),
        [[[10.10981, 8.475163]], [[5.1072445, 12.9339285]]], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(agents.angles), [[-87.92169], [148.87762]], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(progress), 1., atol=1e-6)

    r = c.render(agents)
    d = np.asarray(r.distances)
    np.testing.assert_allclose(np.where(np.isfinite(d), d, 0).mean(), 3.2505078,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r.screen).sum(), 25.021202, rtol=1e-4)


def test_golden_env_traces():
    """Frozen end-to-end env traces through the FUSED observe path (interpret
    mode): Explorer per-step summed rewards and Deathmatch min-health over a
    fixed action stream. These freeze the full step composition — movement,
    physics, spawns, fused raycast/shade, reward/health bookkeeping — so any
    arithmetic change anywhere in the step shows up here."""
    from megastep_tpu import floorplans
    from megastep_tpu.envs import Deathmatch, Explorer

    key = jax.random.PRNGKey(0)
    env = Explorer(2, geometries=floorplans.sample(2), res=64, subsample=4,
                   fused=True)
    state, _ = env.reset(key)

    def estep(st, k):
        st, w = env.step(
            st, arrdict(actions=jax.random.randint(k, (2, 1), 0, 7)), k)
        return st, w.reward.sum()

    _, rews = jax.jit(lambda s, ks: jax.lax.scan(estep, s, ks))(
        state, jax.random.split(key, 5))
    np.testing.assert_array_equal(
        np.asarray(rews), np.float32([4.9375, 2.625, 1., 1.6875, 2.125]))

    np.random.seed(3)
    dm = Deathmatch(8, n_agents=4, geometries=floorplans.sample(2), res=128,
                    subsample=4, fused=True, draw_fused=True)
    dstate, _ = dm.reset(key)

    def dstep(st, k):
        st, w = dm.step(
            st, arrdict(actions=jax.random.randint(k, (8, 1), 0, 7)), k)
        return st, st.health.min()

    _, hmin = jax.jit(lambda s, ks: jax.lax.scan(dstep, s, ks))(
        dstate, jax.random.split(key, 6))
    np.testing.assert_allclose(
        np.asarray(hmin),
        [0.948, 0.947, 0.94600004, 0.94500005, 0.94400007, 0.9430001],
        rtol=0, atol=1e-7)
