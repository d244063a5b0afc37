"""The 1-D raycast renderer: draw, raycast, shade.

TPU-native counterpart of the reference render pipeline (``/root/reference/megastep/
src/kernels.cu:297-475``): the three CUDA kernels (draw agent models into the line
array; brute-force nearest-hit raycast per pixel; texture-filtered Lambert shader)
become pure jnp array programs over the whole (env, agent, pixel) batch, with the
min-reduction over lines left to XLA to fuse so the (N, A, R, L) intersection
intermediates never materialize in HBM.

Nearest-hit semantics: the CUDA kernel scans lines sequentially and only replaces the
incumbent when a hit is closer by more than 1e-4 (z-fighting suppression,
``kernels.cu:369``). Here that is expressed reduction-style: take the minimum hit
distance, then the *lowest-indexed* line within 1e-4 of it. The two agree except on
pathological chains of 3+ mutually-within-tolerance coincident lines.
"""
import jax
import jax.numpy as jnp

from .. import constants
from ..arrdict import arrdict
from . import geom, bake

Z_TOLERANCE = 1e-4


def ray_y(res, dtype=jnp.float32):
    """Screen-space y coordinate of each of the ``res`` rays before FOV scaling
    (``kernels.cu:234-236`` without the half-screen factor)."""
    r = jnp.arange(res, dtype=dtype)
    return (res - 2 * r - 1) / res


def draw_dynamic(scenery, agents):
    """Just the rotated+translated agent-model lines, (N, n_dynamic, 2, 2) —
    the part of :func:`draw` the dynamic re-bake needs; lets callers that draw
    in-kernel (``ops.fused.observe(draw_model=...)``) skip the full-line-array
    update."""
    # (N, A, 1, 1, 2) poses against (M, 2, 2) model.
    rotated = geom.rotate(agents.angles[..., None, None], scenery.model)
    dyn = rotated + agents.positions[:, :, None, None, :]
    return dyn.reshape(dyn.shape[0], scenery.n_dynamic, 2, 2)


def draw(scenery, agents):
    """Writes the rotated+translated agent models into the dynamic head slots of the
    line array (``draw_kernel``, ``kernels.cu:297-318``). Returns the full (N, L, 2, 2)
    line array for this frame."""
    return scenery.lines.at[:, :scenery.n_dynamic].set(draw_dynamic(scenery, agents))


def raycast(lines_now, lines_width, angles, positions, res, half_screen_width,
            agent_radius):
    """Nearest-hit raycast of every (env, agent, pixel) against every line
    (``raycast_kernel``, ``kernels.cu:326-383``).

    :return: arrdict with ``indices`` (line id or -1), ``locations`` (hit fraction
        along the line, NaN if none), ``dots`` (normalized ray·line, NaN if none),
        ``distances`` (meters, +inf if none) — all (N, A, R).
    """
    N, A = angles.shape
    L = lines_now.shape[1]

    # Rays in the global frame.
    uy = half_screen_width * ray_y(res)                                   # (R,)
    a = jnp.pi / 180 * angles
    c, s = jnp.cos(a)[..., None], jnp.sin(a)[..., None]                   # (N, A, 1)
    ru = jnp.stack([c - s * uy, s + c * uy], -1)                          # (N, A, R, 2)
    rlen = geom.length(ru)

    # The ray×line cross products are rank-2 contractions — put them on the MXU
    # instead of the VPU: uxv = ru × v and t_num = ru⊥ · pq, each one batched
    # (R, 2) @ (2, L) matmul per (env, agent). s's numerator is per-line only.
    la = lines_now[..., 0, :]                                             # (N, L, 2)
    lv = lines_now[..., 1, :] - la
    pq = la[:, None] - positions[:, :, None]                              # (N, A, L, 2)

    v_perp = jnp.stack([lv[..., 1], -lv[..., 0]], -1)                     # (N, L, 2)
    uxv = jnp.einsum('nark,nlk->narl', ru, v_perp,
                     precision=jax.lax.Precision.HIGHEST)                 # (N, A, R, L)
    t_num = jnp.einsum('nark,nalk->narl', jnp.stack([ru[..., 1], -ru[..., 0]], -1),
                       pq, precision=jax.lax.Precision.HIGHEST)
    # s's numerator pq × v is per-(agent, line) only — (N, A, L), ray-independent.
    s_num = pq[..., 0] * lv[:, None, :, 1] - pq[..., 1] * lv[:, None, :, 0]

    distant = jnp.abs(uxv) < geom.PARALLEL_EPS
    safe = jnp.where(distant, 1., uxv)
    sq = jnp.where(distant, jnp.inf, s_num[:, :, None] / safe)            # (N, A, R, L)
    tq = jnp.where(distant, jnp.inf, t_num / safe)

    near = agent_radius / rlen
    live = (jnp.arange(L)[None, None, None] < lines_width[:, None, None, None])
    valid = (0 <= tq) & (tq <= 1) & (near[..., None] < sq) & live

    s_masked = jnp.where(valid, sq, jnp.inf)
    s_min = s_masked.min(-1)                                              # (N, A, R)
    eligible = valid & (sq < s_min[..., None] + Z_TOLERANCE)
    idx = jnp.argmax(eligible, -1).astype(jnp.int32)                      # first eligible
    found = eligible.any(-1)

    # Read the winner's s/t/dot off the already-computed products with masked
    # min-selects (exactly one lane is non-inf) — no per-pixel line gather, no
    # third intersection pass, and bit-identical to the Pallas kernel.
    onehot = jnp.arange(L)[None, None, None] == idx[..., None]            # (N, A, R, L)

    def select(q):
        return jnp.where(onehot, q, jnp.inf).min(-1)                      # (N, A, R)

    s_sel = select(sq)
    t_sel = select(tq)
    # Select the winner's direction vector and finish the dot on (N, A, R) —
    # cheaper than a third (N, A, R, L) contraction.
    sel_vx = select(jnp.broadcast_to(lv[:, None, None, :, 0], onehot.shape))
    sel_vy = select(jnp.broadcast_to(lv[:, None, None, :, 1], onehot.shape))
    sel_vlen = jnp.sqrt(sel_vx * sel_vx + sel_vy * sel_vy)
    dot_sel = (ru[..., 0] * sel_vx + ru[..., 1] * sel_vy) / (rlen * sel_vlen + 1e-6)

    nan = jnp.float32(jnp.nan)
    return arrdict(
        indices=jnp.where(found, idx, -1),
        locations=jnp.where(found, t_sel, nan),
        dots=jnp.where(found, dot_sel, nan),
        distances=jnp.where(found, s_sel, jnp.inf) * rlen)


def tex_filter(loc, width):
    """The reference's two-tap linear texture filter (``kernels.cu:394-405``).

    :return: (l, r, lw, rw) — integer texel offsets within the line and their weights.
    """
    w = width.astype(loc.dtype)
    y = jnp.minimum(loc * (w + 1), w - 1)
    l = jnp.maximum(y - 1, 0.).astype(jnp.int32)
    r = jnp.minimum(y, w - 1).astype(jnp.int32)
    ld = jnp.abs(y - (l + 1)) + 1e-3
    rd = jnp.abs(y - (r + 1)) + 1e-3
    return l, r, rd / (ld + rd), ld / (ld + rd)


def _gather_per_env(arr, idx):
    """Gathers ``arr[n, idx[n, ...]]`` for (N, T[, C]) arr and (N, ...) idx."""
    N = arr.shape[0]
    flat_idx = idx.reshape(N, -1)
    if arr.ndim == 3:
        out = jnp.take_along_axis(arr, flat_idx[..., None], 1)
        return out.reshape(*idx.shape, arr.shape[-1])
    return jnp.take_along_axis(arr, flat_idx, 1).reshape(idx.shape)


def onehot_lookup(values, idx, chunk=128):
    """``values[n, idx[n, p]]`` as chunked one-hot matmuls — the TPU-native gather.

    XLA emulates gather on TPU with a serial loop (~40 ns/row); a one-hot
    (P, T) × (T, K) product instead rides the MXU. ``Precision.HIGHEST``
    (3-pass bf16 decomposition) makes row selection *exact*: every partial
    product is value·1 or value·0.

    :param values: (N, T, K) table.
    :param idx: (N, P) int32 indices into T.
    :param chunk: envs per matmul block, bounding the (chunk, P, T) one-hot.
    :return: (N, P, K) f32.
    """
    N, T, K = values.shape
    P = idx.shape[1]
    C = min(chunk, N)
    while N % C:
        C //= 2

    def body(args):
        v, i = args                                          # (C, T, K), (C, P)
        onehot = (i[:, :, None] == jnp.arange(T)[None, None]).astype(values.dtype)
        return jnp.einsum('cpt,ctk->cpk', onehot, v,
                          precision=jax.lax.Precision.HIGHEST)

    out = jax.lax.map(body, (values.reshape(N // C, C, T, K),
                             idx.reshape(N // C, C, P)))
    return out.reshape(N, P, K)


def onehot_any(idx, mask, T, chunk=128):
    """Per-env "was texel t hit by any masked index" — the scatter-free
    counterpart of ``seen[idx] = True`` (TPU scatters serialize like gathers).

    bf16 one-hots halve the dominant HBM stream and stay exact: every product is
    0·x or 1·x and the f32 accumulator is exact below 2^24 counts.

    :param idx: (N, P) int32 indices into T.
    :param mask: (N, P) bool — which entries count.
    :return: (N, T) bool.
    """
    N, P = idx.shape
    C = min(chunk, N)
    while N % C:
        C //= 2

    def body(args):
        i, m = args                                          # (C, P), (C, P)
        onehot = (i[:, :, None] == jnp.arange(T)[None, None]).astype(jnp.bfloat16)
        counts = jnp.einsum('cp,cpt->ct', m.astype(jnp.bfloat16), onehot,
                            preferred_element_type=jnp.float32)
        return counts > 0

    out = jax.lax.map(body, (idx.reshape(N // C, C, P),
                             mask.reshape(N // C, C, P)))
    return out.reshape(N, T)


def shade(scenery, rc, baked_now, method=None):
    """Texture lookup + lighting + Lambert shading per pixel (``shader_kernel``,
    ``kernels.cu:407-450``). Returns the (N, A, R, 3) linear-RGB screen; misses are
    black.

    :param method: 'onehot' (MXU lookups, TPU default) or 'gather'.
    """
    if method is None:
        method = 'onehot' if jax.default_backend() == 'tpu' else 'gather'
    hit = rc.indices >= 0
    idx = jnp.maximum(rc.indices, 0)
    loc = jnp.where(hit, rc.locations, .5)
    N = idx.shape[0]
    P = idx[0].size

    if method == 'onehot':
        # Line attrs as a one-hot matmul; then BOTH texel taps from a single
        # one-hot pass: the filter's taps are adjacent (r = l+1, or r = l at the
        # clamped edges), so one (P, T) one-hot against [table ‖ roll(table, -1)]
        # yields texel l in cols 0-3 and texel l+1 in cols 4-7 — halving the
        # dominant (chunk, P, T) stream. (A weights-matmul fusing the tap
        # weights instead measured a wash.)
        attrs = jnp.stack([scenery.line_tex_starts, scenery.line_tex_widths],
                          -1).astype(jnp.float32)
        sw = onehot_lookup(attrs, idx.reshape(N, P)).reshape(*idx.shape, 2)
        start = sw[..., 0].astype(jnp.int32)
        width = sw[..., 1].astype(jnp.int32)
        l, r, lw, rw = tex_filter(loc, width)

        table = jnp.concatenate([scenery.textures, baked_now[..., None]], -1)
        both = jnp.concatenate([table, jnp.roll(table, -1, axis=1)], -1)
        taps = onehot_lookup(both, (start + l).reshape(N, P)).reshape(*idx.shape, 8)
        tap_l = taps[..., :4]
        tap_r = jnp.where((r == l)[..., None], tap_l, taps[..., 4:])
        tex_l, tex_r = tap_l[..., :3], tap_r[..., :3]
        intensity = lw * tap_l[..., 3] + rw * tap_r[..., 3]
    else:
        width = _gather_per_env(scenery.line_tex_widths, idx)
        start = _gather_per_env(scenery.line_tex_starts, idx)
        l, r, lw, rw = tex_filter(loc, width)
        tex_l = _gather_per_env(scenery.textures, start + l)              # (N, A, R, 3)
        tex_r = _gather_per_env(scenery.textures, start + r)
        intensity = lw * _gather_per_env(baked_now, start + l) + \
            rw * _gather_per_env(baked_now, start + r)

    lambert = 1 - jnp.where(hit, rc.dots, 0.)**2
    shadefac = (lambert * intensity)[..., None]
    color = lw[..., None] * tex_l + rw[..., None] * tex_r
    return jnp.where(hit[..., None], shadefac * color, 0.)


def backend_default():
    """Raycast backend for this split (draw → raycast → shade) pipeline: 'jnp'
    — XLA fuses the nearest-hit reduction well (~6 ms at 4k envs·256 px·48
    lines on v5e). The production TPU path is not this pipeline at all but the
    fused observe kernel (:mod:`megastep_tpu.ops.fused`), which the envs use by
    default; a standalone Pallas *raycast* kernel measured 8× slower than XLA
    here (one program per env, ~16 µs dispatch each — PERF.md negative
    results) and was deleted."""
    return 'jnp'


def render(scenery, agents, res, half_screen_width, agent_radius,
           rebake_dynamic=None, backend=None):
    """Full render pass: draw agent models, raycast, re-light dynamic texels, shade
    (counterpart of the ``render()`` host orchestration, ``kernels.cu:452-475``).

    :param rebake_dynamic: whether to re-bake live lighting of the agent-model
        texels this frame. Defaults to ``n_agents > 1`` — with a single agent the
        camera near plane hides the agent's own model, so its lighting is never
        sampled.
    :param backend: 'jnp' or None. (The TPU-kernel path is the env-level fused
        observe, :mod:`megastep_tpu.ops.fused`; the envs use it by default.)
    :return: arrdict of ``indices/locations/dots/distances`` (N, A, R) and
        ``screen`` (N, A, R, 3).
    """
    backend = backend_default() if backend is None else backend
    if backend != 'jnp':
        raise ValueError(
            f'unknown render backend {backend!r}: this split pipeline is '
            "'jnp'-only; the production TPU kernel is the fused observe "
            '(megastep_tpu.ops.fused), which the envs use via fused=True')
    lines_now = draw(scenery, agents)
    rc = raycast(lines_now, scenery.lines_width, agents.angles,
                 agents.positions, res, half_screen_width, agent_radius)

    if rebake_dynamic is None:
        rebake_dynamic = scenery.n_agents > 1
    if rebake_dynamic:
        dyn = bake.dynamic_texel_intensity(scenery, lines_now)
        baked_now = scenery.baked.at[:, :scenery.n_dynamic_texels].set(dyn)
    else:
        baked_now = scenery.baked

    rc['screen'] = shade(scenery, rc, baked_now)
    return rc
