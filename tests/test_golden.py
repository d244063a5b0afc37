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
    # Ray fan inside a convex box: min distance at normal incidence.
    assert 2.0 < d.min() < 4.2 and d.max() < 8.
    s = np.asarray(r.screen[0, 0])
    assert (s > 0).any() and s.max() <= 1. and s.min() >= 0.
    # The same pose must render identically forever.
    np.testing.assert_allclose(float(r.distances.mean()), float(r.distances.mean()))
    golden_mean = float(np.asarray(c.render(agents).distances.mean()))
    np.testing.assert_allclose(float(r.distances.mean()), golden_mean, rtol=1e-6)
