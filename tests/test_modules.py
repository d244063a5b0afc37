"""Module-layer tests: movement, observers, spawns, lifespans
(mirrors the behavior of ``/root/reference/megastep/modules.py``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from megastep_tpu import core, modules, scene, toys
from megastep_tpu.arrdict import arrdict


@pytest.fixture(scope='module')
def box_core():
    geoms = [toys.box() for _ in range(2)]
    scn = scene.scenery(geoms, n_agents=1, random=np.random.RandomState(3))
    return geoms, core.Core(scn, res=32, fov=130)


def test_simple_movement(box_core):
    _, c = box_core
    mover = modules.SimpleMovement(c)
    agents = c.init_agents()
    agents['positions'] = jnp.full_like(agents.positions, 3.5)

    # Action 1 = forward: moves +speed/fps along the facing (+x at angle 0).
    decision = arrdict(actions=jnp.ones((c.n_envs, 1), jnp.int32))
    new, progress = mover(agents, decision)
    np.testing.assert_allclose(np.asarray(progress), 1., atol=1e-6)
    delta = np.asarray(new.positions - agents.positions)[0, 0]
    np.testing.assert_allclose(delta, [0., .1], atol=1e-6)  # speed 10 / fps 10 / fps again

    # Action 5 = turn left: +ang_speed/fps degrees.
    decision = arrdict(actions=jnp.full((c.n_envs, 1), 5, jnp.int32))
    new, _ = mover(agents, decision)
    np.testing.assert_allclose(np.asarray(new.angles), 1.8, atol=1e-5)


def test_momentum_movement(box_core):
    _, c = box_core
    mover = modules.MomentumMovement(c, decay=.125)
    agents = c.init_agents()
    agents['positions'] = jnp.full_like(agents.positions, 3.5)
    agents['velocity'] = jnp.ones_like(agents.velocity)

    decision = arrdict(actions=jnp.zeros((c.n_envs, 1), jnp.int32))  # noop
    new, _ = mover(agents, decision)
    np.testing.assert_allclose(np.asarray(new.velocity), .875, atol=1e-5)


def test_imu(box_core):
    _, c = box_core
    imu = modules.IMU(c)
    agents = c.init_agents()
    agents['angles'] = jnp.full_like(agents.angles, 90.)
    agents['velocity'] = jnp.stack([jnp.zeros_like(agents.angles),
                                    jnp.full_like(agents.angles, 5.)], -1)
    agents['angvelocity'] = jnp.full_like(agents.angles, 36.)

    obs = imu(agents)
    assert obs.shape == (c.n_envs, 1, 3)
    # angvel/360, medial (forward) = +5/10, lateral ~ 0.
    np.testing.assert_allclose(np.asarray(obs[0, 0]), [.1, .5, 0.], atol=1e-6)


def test_random_spawns(box_core):
    geoms, c = box_core
    spawner = modules.RandomSpawns(geoms, c, n_spawns=50)
    agents = c.init_agents()
    agents['velocity'] = jnp.ones_like(agents.velocity)

    reset = c.agent_full(True)
    new = spawner(agents, reset, jax.random.PRNGKey(0))
    # Velocities zeroed, positions inside the box interior, angles in [-180, 180).
    np.testing.assert_allclose(np.asarray(new.velocity), 0.)
    pos = np.asarray(new.positions)
    assert (pos > 0).all() and (pos < 7).all()
    ang = np.asarray(new.angles)
    assert (ang >= -180).all() and (ang < 180).all()

    # No reset -> untouched.
    same = spawner(agents, c.agent_full(False), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(same.positions), np.asarray(agents.positions))


def test_random_spawns_onehot_matches_gather(box_core):
    """The one-hot spawn-slot select (the production TPU path — gathers
    serialize there) must be BIT-identical to the take_along_axis reference:
    exactly one slot matches, so the masked sum is the gathered row."""
    geoms, c = box_core
    spawner = modules.RandomSpawns(geoms, c, n_spawns=50)
    agents = c.init_agents()
    reset = c.agent_full(True)
    for i in range(3):
        key = jax.random.PRNGKey(i)
        a = spawner(agents, reset, key, onehot=False)
        b = spawner(agents, reset, key, onehot=True)
        np.testing.assert_array_equal(np.asarray(a.positions),
                                      np.asarray(b.positions))
        np.testing.assert_array_equal(np.asarray(a.angles),
                                      np.asarray(b.angles))


def test_random_lifespans(box_core):
    _, c = box_core
    lifespans = modules.RandomLifespans(c, max_lifespan=6, min_lifespan=3)
    key = jax.random.PRNGKey(0)
    state = lifespans.init_state(key)
    assert (np.asarray(state.max_lifespans) >= 3).all()
    assert (np.asarray(state.max_lifespans) < 6).all()

    resets = []
    for i in range(8):
        key, k = jax.random.split(key)
        state, reset = lifespans(state, k)
        resets.append(np.asarray(reset))
    # Every agent must reset at least once within max_lifespan steps.
    assert np.stack(resets).any(0).all()
    # And never twice within min_lifespan of a reset.
    stacked = np.stack(resets)
    for t in range(1, 3):
        assert not (stacked[:-t] & stacked[t:]).any()


def test_downsample():
    x = jnp.arange(8, dtype=jnp.float32)[None]
    ds = modules.downsample(x, 4)
    assert ds.shape == (1, 2, 4)
    np.testing.assert_allclose(np.asarray(ds.mean(-1)[0]), [1.5, 5.5])


def test_rgb_depth_shapes(box_core):
    _, c = box_core
    rgb = modules.RGB(c, subsample=2)
    depth = modules.Depth(c, subsample=2)
    agents = c.init_agents()
    agents['positions'] = jnp.full_like(agents.positions, 3.5)
    r = modules.render(c, agents)
    assert rgb(r).shape == (c.n_envs, 1, 3, 1, 16)
    d = depth(r)
    assert d.shape == (c.n_envs, 1, 1, 1, 16)
    dv = np.asarray(d)
    assert (0 <= dv).all() and (dv <= 1).all()


def test_pool_mean_dot_matches_reduce():
    """The MXU dot-pool (the production TPU path for single-agent observes)
    must match the reshape-mean reference; dot=True is honored on CPU exactly
    so this parity holds in the suite (round-4 review finding: the dot path
    was dead code off-TPU)."""
    key = jax.random.PRNGKey(0)
    for shape, s in (((3, 1, 3, 256), 4), ((2, 4, 128), 2), ((5, 1, 64), 8)):
        x = jax.random.uniform(jax.random.fold_in(key, s), shape)
        want = modules.pool_mean(x, s, dot=False)
        got = modules.pool_mean(x, s, dot=True)
        assert got.shape == want.shape == (*shape[:-1], shape[-1] // s)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   rtol=1e-6, atol=1e-7)
    # s=1 must be the identity on both paths.
    x = jax.random.uniform(key, (2, 1, 16))
    np.testing.assert_array_equal(np.asarray(modules.pool_mean(x, 1, dot=True)),
                                  np.asarray(x))
