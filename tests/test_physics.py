"""Physics correctness: the batched jnp collision op vs a scalar python oracle that
transcribes the reference CUDA math directly (kernels.cu:109-230), plus semantic
invariants (no wall penetration, velocity zeroing, angle wrapping)."""
import numpy as np
import jax.numpy as jnp
import pytest

from megastep_tpu import toys, scene, core
from megastep_tpu.arrdict import arrdict
from megastep_tpu.ops import physics as phys
from megastep_tpu.ops.geom import normalize_degrees

RADIUS = core.AGENT_RADIUS


# --- Scalar oracle: a direct transcription of the reference collision math ---

def _project(p, u, q):
    ulen = np.sqrt(u @ u) + 1e-6
    pq = q - p
    s = (pq @ u) / (ulen * ulen)
    d = abs(pq[0] * u[1] - pq[1] * u[0]) / ulen
    return s, d


def _intersect(p, u, q, v):
    uxv = u[0] * v[1] - u[1] * v[0]
    if abs(uxv) < 1e-3:
        return np.inf, np.inf
    pq = q - p
    s = (pq[0] * v[1] - pq[1] * v[0]) / uxv
    t = (pq[0] * u[1] - pq[1] * u[0]) / uxv
    return s, t


def _sensibilize(p):
    if np.isnan(p):
        return 0.
    return max(min(p * .99, 1.), 0.)


def _collision_disc(p0, u0, p1, u1):
    r = 1.001 * 2 * RADIUS
    x = 1.
    s, d = _project(p0, u0 - u1, p1)
    if (0 < s) and (d < r):
        backoff = np.sqrt(r * r - d * d) / np.sqrt((u0 - u1) @ (u0 - u1))
        x = min(x, _sensibilize(s - backoff))
    return x


def _collision_line(p, u, a, b):
    r = 1.001 * RADIUS
    x = 1.
    v = b - a

    ms, mt = _intersect(p, u, a, v)
    if (0 < ms < 1) and (0 < mt < 1):
        _, d = _project(a, v, p)
        x = min(x, _sensibilize((1 - r / d) * ms))

    for q in (a, b):
        s, d = _project(p, u, q)
        if (0 < s) and (d < r):
            backoff = np.sqrt(r * r - d * d) / np.sqrt(u @ u)
            x = min(x, _sensibilize(s - backoff))

    ss, sd = _project(a, v, p + u)
    if (0 < ss < 1) and (sd < r):
        _, dp = _project(a, v, p)
        x = min(x, _sensibilize((dp - r) / (dp - sd)))

    return x


def oracle_progress(positions, velocity, walls, fps):
    N, A = positions.shape[:2]
    out = np.ones((N, A))
    for n in range(N):
        for a0 in range(A):
            p0, u0 = positions[n, a0], velocity[n, a0] / fps
            x = 1.
            for a1 in range(A):
                if a1 != a0:
                    x = min(x, _collision_disc(p0, u0, positions[n, a1], velocity[n, a1] / fps))
            for wall in walls[n]:
                x = min(x, _collision_line(p0, u0, wall[0], wall[1]))
            out[n, a0] = x
    return out


# --- Tests ---

def _random_case(seed, N=8, A=2, W=6):
    rng = np.random.RandomState(seed)
    positions = rng.uniform(0, 4, (N, A, 2)).astype(np.float32)
    velocity = rng.uniform(-8, 8, (N, A, 2)).astype(np.float32)
    walls = rng.uniform(0, 4, (N, W, 2, 2)).astype(np.float32)
    return positions, velocity, walls


@pytest.mark.parametrize('seed', range(5))
def test_collision_vs_oracle(seed):
    positions, velocity, walls, = _random_case(seed)
    fps = 10.
    N, A = positions.shape[:2]
    W = walls.shape[1]

    expected = oracle_progress(positions, velocity, walls, fps)
    # No dynamic slots in this synthetic scene.
    actual = phys.collision_progress(
        jnp.asarray(positions), jnp.asarray(velocity), jnp.asarray(walls),
        jnp.full((N,), W, jnp.int32), 0, fps, RADIUS)
    np.testing.assert_allclose(np.asarray(actual), expected, rtol=1e-4, atol=1e-5)


def test_free_motion():
    # An agent far from any wall moves exactly v/fps.
    positions = jnp.array([[[2., 2.]]])
    velocity = jnp.array([[[1., 0.5]]])
    walls = jnp.full((1, 1, 2, 2), 100.)
    progress = phys.collision_progress(positions, velocity, walls,
                                       jnp.array([1]), 0, 10., RADIUS)
    assert np.asarray(progress) == pytest.approx(1.)


def _box_core(n_envs=4):
    geometries = [toys.box() for _ in range(n_envs)]
    scn = scene.scenery(geometries, n_agents=1, random=np.random.RandomState(0),
                        bake_fn=None)
    return core.Core(scn, res=32, fov=130, fps=10)


def test_never_penetrates_walls():
    c = _box_core()
    agents = c.init_agents()
    center = 2.5 + 1.
    agents = agents.copy()
    agents['positions'] = jnp.full_like(agents.positions, center)
    rng = np.random.RandomState(0)
    walls = np.asarray(c.scenery.lines[:, c.scenery.n_dynamic:])
    widths = np.asarray(c.scenery.lines_width)

    for step in range(40):
        v = rng.uniform(-12, 12, agents.velocity.shape).astype(np.float32)
        agents['velocity'] = jnp.asarray(v)
        agents, progress = c.physics(agents)
        pos = np.asarray(agents.positions)
        for n in range(c.n_envs):
            nw = widths[n] - c.scenery.n_dynamic
            for wall in walls[n, :nw]:
                d = _dist_point_segment(pos[n, 0], wall[0], wall[1])
                assert d > RADIUS * .9, f'penetrated at step {step}: d={d}'


def _dist_point_segment(p, a, b):
    d = b - a
    t = np.clip(((p - a) @ d) / max(d @ d, 1e-12), 0, 1)
    return np.sqrt(((p - (a + t * d))**2).sum())


def test_velocity_zeroed_on_collision():
    c = _box_core(1)
    agents = c.init_agents()
    agents['positions'] = jnp.full_like(agents.positions, 3.5)
    agents['velocity'] = jnp.full_like(agents.velocity, 30.)  # slam into a wall
    agents, progress = c.physics(agents)
    assert np.asarray(progress)[0, 0] < 1
    assert (np.asarray(agents.velocity) == 0).all()


def test_angle_normalization():
    a = jnp.array([0., 179., 181., 360., -181., 720.])
    out = np.asarray(normalize_degrees(a))
    np.testing.assert_allclose(out, [0., 179., -179., 0., 179., 0.], atol=1e-4)


def test_angular_integration():
    c = _box_core(1)
    agents = c.init_agents()
    agents['positions'] = jnp.full_like(agents.positions, 3.5)
    agents['angvelocity'] = jnp.full_like(agents.angvelocity, 90.)  # deg/s, fps=10
    agents, progress = c.physics(agents)
    assert np.asarray(agents.angles)[0, 0] == pytest.approx(9., abs=1e-4)
