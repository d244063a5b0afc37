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
    a disc at ``p1`` moving ``u1`` (``kernels.cu:119-133``).

    Planar (separate x/y component arrays) rather than stacked (..., 2)
    points: on TPU a materialized (..., 2)-minormost intermediate pads its
    last tile dimension 64×, and XLA materializes multi-consumer fusion
    intermediates. Same per-element arithmetic as :mod:`.geom` — results are
    bit-identical (tests/test_physics.py pins the values).
    """
    r = 1.001 * 2. * agent_radius
    p0x, p0y = p0[..., 0], p0[..., 1]
    ux = u0[..., 0] - u1[..., 0]
    uy = u0[..., 1] - u1[..., 1]
    pqx = p1[..., 0] - p0x
    pqy = p1[..., 1] - p0y
    # geom.project(p0, u, p1)
    ulen = jnp.sqrt(ux**2 + uy**2) + 1e-6
    s = (pqx * ux + pqy * uy) / (ulen * ulen)
    d = jnp.abs(pqx * uy - pqy * ux) / ulen
    hit = (0 < s) & (d < r)
    backoff = jnp.sqrt(jnp.maximum(r * r - d * d, 0.)) / jnp.sqrt(ux**2 + uy**2)
    return jnp.where(hit, sensibilize(s - backoff), 1.)


def _disc_line(px, py, ux, uy, ax, ay, bx, by, agent_radius):
    """Collision fraction for a disc at ``(px, py)`` moving ``(ux, uy)`` (meters
    this step) against the static segment (a, b): the reference's four
    sub-tests — crossing the midline, grazing either endpoint, and hitting the
    broadside (``kernels.cu:135-171``). Planar components, same arithmetic as
    the stacked :mod:`.geom` formulation (see :func:`_disc_disc`)."""
    r = 1.001 * agent_radius
    vx = bx - ax
    vy = by - ay
    x = jnp.ones(jnp.broadcast_shapes(px.shape, ax.shape), px.dtype)

    # Passing through the segment (geom.intersect(p, u, a, v)).
    uxv = ux * vy - uy * vx
    pqx = ax - px
    pqy = ay - py
    distant = jnp.abs(uxv) < geom.PARALLEL_EPS
    safe = jnp.where(distant, 1., uxv)
    mid_s = jnp.where(distant, jnp.inf, (pqx * vy - pqy * vx) / safe)
    mid_t = jnp.where(distant, jnp.inf, (pqx * uy - pqy * ux) / safe)
    # geom.project(a, v, p) — only the distance is needed.
    vlen = jnp.sqrt(vx**2 + vy**2) + 1e-6
    qax = px - ax
    qay = py - ay
    dp = jnp.abs(qax * vy - qay * vx) / vlen
    hit = (0 < mid_s) & (mid_s < 1) & (0 < mid_t) & (mid_t < 1)
    x = jnp.minimum(x, jnp.where(hit, sensibilize((1 - r / dp) * mid_s), 1.))

    # Passing within r of either endpoint (geom.project(p, u, endpoint)).
    ulen = jnp.sqrt(ux**2 + uy**2) + 1e-6
    speed = jnp.sqrt(ux**2 + uy**2)
    for ex, ey in ((ax, ay), (bx, by)):
        eqx = ex - px
        eqy = ey - py
        s = (eqx * ux + eqy * uy) / (ulen * ulen)
        d = jnp.abs(eqx * uy - eqy * ux) / ulen
        hit = (0 < s) & (d < r)
        backoff = jnp.sqrt(jnp.maximum(r * r - d * d, 0.)) / speed
        x = jnp.minimum(x, jnp.where(hit, sensibilize(s - backoff), 1.))

    # Passing within r of the broadside (geom.project(a, v, p + u)).
    wqx = (px + ux) - ax
    wqy = (py + uy) - ay
    side_s = (wqx * vx + wqy * vy) / (vlen * vlen)
    side_d = jnp.abs(wqx * vy - wqy * vx) / vlen
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

    # Disc-vs-segment sweeps over the static walls, planar: (N, A, 1) agent
    # components against (N, 1, W) wall components — every big intermediate
    # is (N, A, W) with the wall axis minormost (lane-friendly), no stacked
    # (..., 2) arrays for XLA to materialize with 64×-padded tiles.
    walls = lines[:, n_dynamic:]
    n_walls = walls.shape[1]
    if n_walls == 0:
        return x_agents
    wall_mask = (n_dynamic + jnp.arange(n_walls))[None] < lines_width[:, None]
    per_wall = _disc_line(
        positions[:, :, None, 0], positions[:, :, None, 1],
        u[:, :, None, 0], u[:, :, None, 1],
        walls[:, None, :, 0, 0], walls[:, None, :, 0, 1],
        walls[:, None, :, 1, 0], walls[:, None, :, 1, 1], agent_radius)
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
