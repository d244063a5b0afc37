"""Pallas TPU kernel for the raycaster (standalone; superseded on the hot path).

The production observe path is :mod:`megastep_tpu.ops.fused`, which fuses this
raycast with the shader and seen-reduction in a better layout (lines on
sublanes) and wins at every measured scale, including cubicasa-sized scenes.
This kernel remains as the drop-in raycast-only replacement behind
``render(backend='pallas')`` for API parity with the split pipeline.

The pure-jnp raycast (:func:`megastep_tpu.ops.render.raycast`) is the correctness
ground truth; this kernel computes the identical nearest-hit reduction with the
(rays × lines) working set held in VMEM, so the (N, A, R, L) intersection
intermediates never touch HBM (the fusion XLA can't be relied on to find once
several reductions — min, any, argmax — consume the same product). Mirrors the CUDA
``raycast_kernel`` (``/root/reference/megastep/src/kernels.cu:326-383``) in
semantics, tested bit-for-bit against the jnp reference.

Hardware-shaped choices (see pallas_guide.md; each earned by a Mosaic rejection):
  * grid = (env-block, env, agent·ray-tile): one (env, ray tile) per program.
    Mosaic assigns every intermediate vector its own scoped-VMEM slot (~140
    live (rays, lines) buffers per program body), so per-program rays are tiled
    to keep ray_tile · L-lanes · 4 B · ~140 under the ~16 MB VMEM budget; the env
    axis must live in the *grid* (an in-kernel env loop multiplies the buffer
    count by its trip count).
  * outputs are (N/E, E, A·R) with the (E, A·R) tile — natively (8, 128)-tileable
    — revisited across the (e, c) grid dims and flushed once per env-block; a
    per-env (N, 1, R) layout degenerates to T(1, 128) tiles and 8× memory.
  * the per-env output row is selected by a masked read-modify-write of the whole
    (E, cols) tile: dynamic-sublane stores are "not implemented" in Mosaic.
  * ray quantities are column vectors (rows=rays); line quantities are rows
    (lanes=lines).
  * iota is 2-D integer (`broadcasted_iota`) — 1-D/float iota doesn't lower.
  * the selected line's endpoints are recovered with exact masked min-reductions
    (an MXU one-hot matmul rounds coordinates through bf16 passes).
  * the z-fighting tolerance pick ("first line within 1e-4 of the minimum",
    ``kernels.cu:369``) is a masked min over line *indices*.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..arrdict import arrdict
from . import geom
from .render import Z_TOLERANCE

PARALLEL_EPS = geom.PARALLEL_EPS
ENV_BLOCK = 8

# Empirical Mosaic scoped-VMEM cost of one program body, in bytes per
# (ray, line) element (measured from compiler OOM reports). The 16 MB scoped
# limit is only the compiler default: with CompilerParams(vmem_limit_bytes=100MB)
# bodies estimated up to ~92 MB compile and run on v5e.
VMEM_PER_ELEMENT = 1400
VMEM_BUDGET = 88 * 1024 * 1024


def min_ray_tile(res, n_lines):
    """Largest lane-aligned ray tile whose estimated scoped VMEM fits."""
    tile = res
    while tile > 128 and VMEM_PER_ELEMENT * tile * n_lines > VMEM_BUDGET:
        tile //= 2
    return tile


def supported(res, n_lines):
    """Whether the kernel's working set fits VMEM for this (res, L). Larger
    scenes need a line-tiled variant (cross-tile running min) — until then the
    caller falls back to the jnp path."""
    if res % 128 != 0:
        return False
    tile = min_ray_tile(res, n_lines)
    return VMEM_PER_ELEMENT * tile * n_lines <= VMEM_BUDGET


def _raycast_kernel(res, ray_tile, env_block, half_screen_width, agent_radius,
                    lines_ref, width_ref, pose_ref,
                    idx_ref, loc_ref, dot_ref, dist_ref):
    """One program = one (env, agent·ray-tile column block).

    Block shapes: lines (1, 1, L, 4) VMEM · width (1, 1, E) SMEM i32 ·
    pose (1, 1, A, 3) SMEM (angle, x, y) → outputs (1, E, ray_tile) revisited.
    """
    L = lines_ref.shape[2]
    R = ray_tile
    e_row = pl.program_id(1)
    c = pl.program_id(2)
    a = c * ray_tile // res                                  # owning agent
    r0 = (c * ray_tile) % res                                # first ray of the tile

    width = width_ref[0, 0, e_row]
    lines = lines_ref[0, 0]                                  # (L, 4)
    ax = lines[:, 0][None]                                   # (1, L)
    ay = lines[:, 1][None]
    vx = (lines[:, 2] - lines[:, 0])[None]
    vy = (lines[:, 3] - lines[:, 1])[None]

    line_idx = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    live = line_idx < width                                  # (1, L)

    r_iota = (r0 + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)).astype(jnp.float32)
    # Screen coordinate of each ray (kernels.cu:234-236), as a column vector.
    uy = half_screen_width * ((res - 2 * r_iota - 1) / res)  # (R, 1)

    ang = pose_ref[0, 0, a, 0] * (jnp.pi / 180)
    co, si = jnp.cos(ang), jnp.sin(ang)
    px, py = pose_ref[0, 0, a, 1], pose_ref[0, 0, a, 2]

    # Ray directions in the global frame (kernels.cu:344-349).
    rux_c = co - si * uy                                     # (R, 1)
    ruy_c = si + co * uy
    rlen = jnp.sqrt(rux_c * rux_c + ruy_c * ruy_c)
    near = agent_radius / rlen                               # (R, 1)

    # The ray x line cross products are sums of rank-1 outer products — put
    # them on the MXU as (R, 1) @ (1, L) dots instead of VPU broadcast chains.
    # (Mosaic can't sublane-concat row vectors into (2, L) operands.)
    hi = jax.lax.Precision.HIGHEST
    def outer(col, row):
        return jnp.dot(col, row, preferred_element_type=jnp.float32,
                       precision=hi)                          # (R, L)

    pqx = ax - px                                            # (1, L)
    pqy = ay - py
    uxv = outer(rux_c, vy) - outer(ruy_c, vx)                # (R, L)
    t_num = outer(ruy_c, pqx) - outer(rux_c, pqy)
    # s's numerator pq x v is ray-independent: (1, L).
    s_num = pqx * vy - pqy * vx

    distant = jnp.abs(uxv) < PARALLEL_EPS
    # One true division (VPU divides are many-cycle); s and t share it.
    rinv = 1. / jnp.where(distant, 1., uxv)
    sq = jnp.where(distant, jnp.inf, s_num * rinv)
    tq = jnp.where(distant, jnp.inf, t_num * rinv)

    valid = (0 <= tq) & (tq <= 1) & (near < sq) & live

    s_masked = jnp.where(valid, sq, jnp.inf)
    s_min = jnp.min(s_masked, axis=1, keepdims=True)         # (R, 1)
    eligible = valid & (sq < s_min + Z_TOLERANCE)
    idx = jnp.min(jnp.where(eligible, line_idx, L), axis=1, keepdims=True)
    found = idx < L                                          # (R, 1)
    idx = jnp.where(found, idx, 0)

    # Read off the winner's s/t/dot with masked min-reductions over the already
    # computed products (exactly one lane is non-inf, so min is a pure select —
    # exact, and no second intersection pass).
    onehot = line_idx == idx                                 # (R, L)

    def select(q):
        return jnp.min(jnp.where(onehot, q, jnp.inf), axis=1, keepdims=True)

    s_sel = select(sq)
    t_sel = select(tq)
    vlen = jnp.sqrt(vx * vx + vy * vy)                       # (1, L)
    u_dot_v = outer(rux_c, vx) + outer(ruy_c, vy)            # (R, L)
    dotq = u_dot_v / (rlen * vlen + 1e-6)
    dot_sel = select(dotq)

    nan = jnp.float32(jnp.nan)
    out_idx = jnp.where(found, idx, -1).astype(jnp.int32)[:, 0][None]   # (1, R)
    out_loc = jnp.where(found, t_sel, nan)[:, 0][None]
    out_dot = jnp.where(found, dot_sel, nan)[:, 0][None]
    out_dist = (jnp.where(found, s_sel, jnp.inf) * rlen)[:, 0][None]

    # Dynamic-sublane stores don't lower; select the env's row with a masked RMW
    # of the whole (E, R) tile instead.
    row = jax.lax.broadcasted_iota(jnp.int32, (env_block, 1), 0) == e_row
    idx_ref[0] = jnp.where(row, out_idx, idx_ref[0])
    loc_ref[0] = jnp.where(row, out_loc, loc_ref[0])
    dot_ref[0] = jnp.where(row, out_dot, dot_ref[0])
    dist_ref[0] = jnp.where(row, out_dist, dist_ref[0])


@partial(jax.jit, static_argnames=('res', 'half_screen_width', 'agent_radius',
                                   'interpret'))
def raycast(lines_now, lines_width, angles, positions, res, half_screen_width,
            agent_radius, interpret=False):
    """Drop-in Pallas replacement for :func:`megastep_tpu.ops.render.raycast`.

    Requires ``res`` to be a multiple of 128 (lane-aligned column tiles); the
    caller (:func:`megastep_tpu.ops.render.render`) falls back to the jnp path
    otherwise.

    :param interpret: run in interpreter mode (for CPU testing).
    """
    N, A = angles.shape
    L = lines_now.shape[1]
    E = ENV_BLOCK if N % ENV_BLOCK == 0 else 1
    NB = N // E

    # Ray tile: bound the per-program scoped-VMEM working set, lane-aligned.
    ray_tile = min_ray_tile(res, L)
    assert res % ray_tile == 0

    flat = lines_now.reshape(NB, E, L, 4)
    width3d = lines_width.reshape(NB, 1, E).astype(jnp.int32)
    pose = jnp.concatenate([angles[..., None], positions], -1)  # (N, A, 3)
    pose = pose.reshape(NB, E, A, 3)

    kernel = partial(_raycast_kernel, res, ray_tile, E, float(half_screen_width),
                     float(agent_radius))
    out_shape = [
        jax.ShapeDtypeStruct((NB, E, A * res), jnp.int32),
        jax.ShapeDtypeStruct((NB, E, A * res), jnp.float32),
        jax.ShapeDtypeStruct((NB, E, A * res), jnp.float32),
        jax.ShapeDtypeStruct((NB, E, A * res), jnp.float32)]

    grid_spec = pl.GridSpec(
        grid=(NB, E, A * res // ray_tile),
        in_specs=[
            pl.BlockSpec((1, 1, L, 4), lambda n, e, c: (n, e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E), lambda n, e, c: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, A, 3), lambda n, e, c: (n, e, 0, 0),
                         memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec((1, E, ray_tile), lambda n, e, c: (n, 0, c),
                         memory_space=pltpu.VMEM)
            for _ in range(4)])

    idx, loc, dot, dist = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flat, width3d, pose)

    shape = (N, A, res)
    return arrdict(indices=idx.reshape(shape), locations=loc.reshape(shape),
                   dots=dot.reshape(shape), distances=dist.reshape(shape))


def _raycast_kernel_multienv(res, ray_tile, env_block, half_screen_width,
                             agent_radius, n_agents,
                             lines_ref, width_ref, pose_ref,
                             idx_ref, loc_ref, dot_ref, dist_ref):
    """One program = env_block envs x one ray tile. The env loop is unrolled
    inside the program (needs the raised vmem_limit_bytes: ~9 MB of scoped
    buffers per env at ray_tile 128), so every output block is written exactly
    once per program — the revisit/RMW pattern made consecutive programs
    serially dependent on each other's flushes.

    Blocks: lines (1, E, L, 4) VMEM - width (1, 1, E) SMEM - pose (1, E, A, 3)
    SMEM -> outputs (1, E, ray_tile).
    """
    L = lines_ref.shape[2]
    R = ray_tile
    c = pl.program_id(1)
    a = c * ray_tile // res
    r0 = (c * ray_tile) % res

    line_idx = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    r_iota = (r0 + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)).astype(jnp.float32)
    uy = half_screen_width * ((res - 2 * r_iota - 1) / res)  # (R, 1)
    hi = jax.lax.Precision.HIGHEST

    def outer(col, row):
        return jnp.dot(col, row, preferred_element_type=jnp.float32, precision=hi)

    outs = []
    for e in range(env_block):
        width = width_ref[0, 0, e]
        lines = lines_ref[0, e]                              # (L, 4)
        ax = lines[:, 0][None]
        ay = lines[:, 1][None]
        vx = (lines[:, 2] - lines[:, 0])[None]
        vy = (lines[:, 3] - lines[:, 1])[None]
        live = line_idx < width

        ang = pose_ref[0, e, a, 0] * (jnp.pi / 180)
        co, si = jnp.cos(ang), jnp.sin(ang)
        px, py = pose_ref[0, e, a, 1], pose_ref[0, e, a, 2]

        rux_c = co - si * uy
        ruy_c = si + co * uy
        rlen = jnp.sqrt(rux_c * rux_c + ruy_c * ruy_c)
        near = agent_radius / rlen

        pqx = ax - px
        pqy = ay - py
        uxv = outer(rux_c, vy) - outer(ruy_c, vx)            # (R, L)
        t_num = outer(ruy_c, pqx) - outer(rux_c, pqy)
        s_num = pqx * vy - pqy * vx                          # (1, L)

        distant = jnp.abs(uxv) < PARALLEL_EPS
        rinv = 1. / jnp.where(distant, 1., uxv)
        sq = jnp.where(distant, jnp.inf, s_num * rinv)
        tq = jnp.where(distant, jnp.inf, t_num * rinv)

        valid = (0 <= tq) & (tq <= 1) & (near < sq) & live
        s_masked = jnp.where(valid, sq, jnp.inf)
        s_min = jnp.min(s_masked, axis=1, keepdims=True)
        eligible = valid & (sq < s_min + Z_TOLERANCE)
        idx = jnp.min(jnp.where(eligible, line_idx, L), axis=1, keepdims=True)
        found = idx < L
        idx = jnp.where(found, idx, 0)

        onehot = line_idx == idx

        def select(q):
            return jnp.min(jnp.where(onehot, q, jnp.inf), axis=1, keepdims=True)

        s_sel = select(sq)
        t_sel = select(tq)
        vlen = jnp.sqrt(vx * vx + vy * vy)
        dotq = (outer(rux_c, vx) + outer(ruy_c, vy)) / (rlen * vlen + 1e-6)
        dot_sel = select(dotq)

        nan = jnp.float32(jnp.nan)
        outs.append((
            jnp.where(found, idx, -1).astype(jnp.int32)[:, 0][None],
            jnp.where(found, t_sel, nan)[:, 0][None],
            jnp.where(found, dot_sel, nan)[:, 0][None],
            (jnp.where(found, s_sel, jnp.inf) * rlen)[:, 0][None]))

    idx_ref[0] = jnp.concatenate([o[0] for o in outs], 0)
    loc_ref[0] = jnp.concatenate([o[1] for o in outs], 0)
    dot_ref[0] = jnp.concatenate([o[2] for o in outs], 0)
    dist_ref[0] = jnp.concatenate([o[3] for o in outs], 0)


@partial(jax.jit, static_argnames=('res', 'half_screen_width', 'agent_radius',
                                   'interpret'))
def raycast_multienv(lines_now, lines_width, angles, positions, res,
                     half_screen_width, agent_radius, interpret=False):
    """Multi-env-per-program variant of :func:`raycast` (A/B under evaluation)."""
    N, A = angles.shape
    L = lines_now.shape[1]
    E = ENV_BLOCK if N % ENV_BLOCK == 0 else 1
    NB = N // E

    ray_tile = res
    while ray_tile > 128 and VMEM_PER_ELEMENT * ray_tile * L * E > VMEM_BUDGET:
        ray_tile //= 2

    flat = lines_now.reshape(NB, E, L, 4)
    width3d = lines_width.reshape(NB, 1, E).astype(jnp.int32)
    pose = jnp.concatenate([angles[..., None], positions], -1).reshape(NB, E, A, 3)

    kernel = partial(_raycast_kernel_multienv, res, ray_tile, E,
                     float(half_screen_width), float(agent_radius), A)
    out_shape = [
        jax.ShapeDtypeStruct((NB, E, A * res), jnp.int32),
        jax.ShapeDtypeStruct((NB, E, A * res), jnp.float32),
        jax.ShapeDtypeStruct((NB, E, A * res), jnp.float32),
        jax.ShapeDtypeStruct((NB, E, A * res), jnp.float32)]

    grid_spec = pl.GridSpec(
        grid=(NB, A * res // ray_tile),
        in_specs=[
            pl.BlockSpec((1, E, L, 4), lambda n, c: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E), lambda n, c: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, E, A, 3), lambda n, c: (n, 0, 0, 0),
                         memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec((1, E, ray_tile), lambda n, c: (n, 0, c),
                         memory_space=pltpu.VMEM)
            for _ in range(4)])

    idx, loc, dot, dist = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flat, width3d, pose)

    shape = (N, A, res)
    return arrdict(indices=idx.reshape(shape), locations=loc.reshape(shape),
                   dots=dot.reshape(shape), distances=dist.reshape(shape))
