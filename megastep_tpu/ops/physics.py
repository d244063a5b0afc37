"""Collision resolution and motion integration.

TPU-native counterpart of the reference collision kernel and physics host step
(``/root/reference/megastep/src/kernels.cu:109-230``). The per-(env, agent) CUDA
thread loop becomes a batched masked min-reduction over agent pairs and wall
segments — one fused XLA program over the whole env batch.

Semantics reproduced exactly:
  * agents are discs of radius ``agent_radius``; a 1.001 fudge keeps the camera near
    plane out of walls, and collisions resolve at 99% of the exact fraction
    (``sensibilize``, ``kernels.cu:109-118``);
  * ``progress[n, a]`` is the fraction of this step's intended motion completed
    before the first collision (1 = moved freely);
  * positions integrate by ``progress * v / fps``; velocity (and angular velocity)
    are zeroed wherever ``progress < 1``; angles wrap to [-180, 180).
"""
import jax.numpy as jnp

from . import geom


def sensibilize(p):
    """Clamps a collision fraction to [0, 1] with the reference's 0.99 early-collide
    margin, mapping NaN to 0 (``kernels.cu:109-118``)."""
    clamped = jnp.clip(p * .99, 0., 1.)
    return jnp.where(jnp.isnan(p), 0., clamped)


def _disc_disc(p0, u0, p1, u1, agent_radius):
    """Collision fraction for a disc at ``p0`` moving ``u0`` (meters this step) against
    a disc at ``p1`` moving ``u1`` (``kernels.cu:119-133``)."""
    r = 1.001 * 2. * agent_radius
    s, d = geom.project(p0, u0 - u1, p1)
    hit = (0 < s) & (d < r)
    backoff = jnp.sqrt(jnp.maximum(r * r - d * d, 0.)) / geom.length(u0 - u1)
    return jnp.where(hit, sensibilize(s - backoff), 1.)


def _disc_line(p, u, a, b, agent_radius):
    """Collision fraction for a disc at ``p`` moving ``u`` (meters this step) against
    the static segment (a, b): the reference's four sub-tests — crossing the midline,
    grazing either endpoint, and hitting the broadside (``kernels.cu:135-171``)."""
    r = 1.001 * agent_radius
    v = b - a
    x = jnp.ones(jnp.broadcast_shapes(p[..., 0].shape, a[..., 0].shape), p.dtype)

    # Passing through the segment.
    mid_s, mid_t = geom.intersect(p, u, a, v)
    _, dp = geom.project(a, v, p)
    hit = (0 < mid_s) & (mid_s < 1) & (0 < mid_t) & (mid_t < 1)
    x = jnp.minimum(x, jnp.where(hit, sensibilize((1 - r / dp) * mid_s), 1.))

    # Passing within r of either endpoint.
    for endpoint in (a, b):
        s, d = geom.project(p, u, endpoint)
        hit = (0 < s) & (d < r)
        backoff = jnp.sqrt(jnp.maximum(r * r - d * d, 0.)) / geom.length(u)
        x = jnp.minimum(x, jnp.where(hit, sensibilize(s - backoff), 1.))

    # Passing within r of the broadside.
    side_s, side_d = geom.project(a, v, p + u)
    hit = (0 < side_s) & (side_s < 1) & (side_d < r)
    x = jnp.minimum(x, jnp.where(hit, sensibilize((dp - r) / (dp - side_d)), 1.))

    return x


def collision_progress(positions, velocity, lines, lines_width, n_dynamic, fps,
                       agent_radius):
    """Per-(env, agent) fraction of intended motion completed before collision.

    Vectorized counterpart of ``collision_kernel`` (``kernels.cu:179-210``): each agent
    sweeps against every *other* agent disc and against every static wall segment
    (line slots from ``n_dynamic`` up to the env's true line count).

    :param positions: (N, A, 2) agent positions, meters.
    :param velocity: (N, A, 2) agent velocities, meters/second.
    :param lines: (N, L, 2, 2) padded line array; the first ``n_dynamic`` slots are
        the dynamic agent-model lines and are skipped.
    :param lines_width: (N,) true line count per env.
    :param n_dynamic: static int, number of dynamic (agent model) line slots.
    :param fps: steps per second; motion this step is ``velocity / fps``.
    :return: (N, A) float progress in [0, 1].
    """
    u = velocity / fps
    N, A = positions.shape[:2]

    # Disc-vs-disc sweeps over agent pairs, diagonal masked out.
    if A > 1:
        pairwise = _disc_disc(positions[:, :, None], u[:, :, None],
                              positions[:, None, :], u[:, None, :], agent_radius)
        off_diag = ~jnp.eye(A, dtype=bool)[None]
        x_agents = jnp.where(off_diag, pairwise, 1.).min(2)
    else:
        x_agents = jnp.ones((N, A), positions.dtype)

    # Disc-vs-segment sweeps over the static walls.
    walls = lines[:, n_dynamic:]
    n_walls = walls.shape[1]
    if n_walls == 0:
        return x_agents
    wall_mask = (n_dynamic + jnp.arange(n_walls))[None] < lines_width[:, None]
    per_wall = _disc_line(positions[:, :, None], u[:, :, None],
                          walls[:, None, :, 0], walls[:, None, :, 1], agent_radius)
    x_walls = jnp.where(wall_mask[:, None], per_wall, 1.).min(2)

    return jnp.minimum(x_agents, x_walls)


def physics(scenery, agents, fps, agent_radius):
    """Steps agent motion with collision resolution.

    Functional counterpart of the reference's ``physics()`` host step
    (``kernels.cu:212-230``): returns the post-step agents pytree and the progress
    tensor, instead of mutating in place.

    :param scenery: a :class:`megastep_tpu.scene.Scenery`.
    :param agents: arrdict with ``angles`` (N, A), ``positions`` (N, A, 2),
        ``angvelocity`` (N, A), ``velocity`` (N, A, 2).
    :return: (new_agents, progress) with progress (N, A).
    """
    progress = collision_progress(
        agents.positions, agents.velocity, scenery.lines, scenery.lines_width,
        scenery.n_dynamic, fps, agent_radius)

    collided = progress < 1
    new_agents = type(agents)(
        angles=geom.normalize_degrees(agents.angles + progress * agents.angvelocity / fps),
        positions=agents.positions + progress[..., None] * agents.velocity / fps,
        angvelocity=jnp.where(collided, 0., agents.angvelocity),
        velocity=jnp.where(collided[..., None], 0., agents.velocity))
    return new_agents, progress
