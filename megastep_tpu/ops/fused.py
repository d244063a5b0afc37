"""The fused observe kernel: raycast + shade + seen-texel counts in one Pallas
program per env block.

This is the engine's answer to the reference's three resident CUDA kernels
(``/root/reference/megastep/src/kernels.cu:326-475`` — raycast, shade, plus the
Explorer's seen-texel scatter that follows them): one TPU program computes the
whole per-env observation with every intermediate held in VMEM. The split XLA
pipeline (:mod:`megastep_tpu.ops.render`) streams ~15 (N, A, R, L) raycast
intermediates and two (N, P, T) one-hot products through HBM per step — at
16k envs that's ~90% of the step time. Here the HBM traffic collapses to the
inputs (lines, texel table) and the final (R,)-sized outputs.

Layout choices (each measured; see PERF.md):
  * (lines, rays) working arrays put **lines on sublanes and rays on lanes** —
    the reverse of the round-1 raycast kernel. With L ≈ 48 < 128, a (R, L)
    layout pads lanes 48→128 (2.7× more registers per op); (L, R) is dense.
  * per-line scalars are (L, 1) columns, per-ray scalars are (1, R) rows, so
    every (L, R) product is a natural broadcast with no relayouts.
  * the winner line's static attributes (direction, texel start/width) are
    read off with exact bf16 (4, L) @ (L, R) MXU products against the line
    one-hot instead of four masked reductions.
  * texel lookups are **hierarchical**: a flat (T, R) one-hot build costs
    T·R/1024 vector registers of compares (≈1 µs/env at T=2304 — it dominated
    the v1 kernel). Splitting the texel index as ``t = b·128 + w`` needs only a
    (128, R) "lo" and a (B, R) "hi" one-hot (16× cheaper to build); the table
    lookup becomes one (B·8, 128) @ (128, R) MXU product over the lo axis
    followed by a tiny static loop over the B hi-blocks.
  * the f32 texel table is pre-split (:func:`split_table8`) into three bf16
    components (t = t1+t2+t3, disjoint mantissa chunks — the same decomposition
    XLA's HIGHEST uses); each component multiplies the exact 0/1 bf16 one-hot
    in a native 1-pass bf16 MXU product, so the lookup is bit-exact at half the
    passes of an f32 HIGHEST dot. The split is done once outside the kernel
    (statically for single-agent envs) — in-kernel it cost ~0.1 µs per
    (env, agent).
  * seen-texel counts contract the ray axis on the MXU —
    (B, R) · (128, R)ᵀ — and are written as a per-env (B, 128) tile block,
    reshaped to (T,) outside (row-major, so the reshape is free in XLA).
  * ``E`` envs are unrolled per program so per-program overhead amortizes —
    measured at 16k envs E=64 > E=32 > E=8 ≫ E=1 (:func:`default_env_block`
    picks the largest that fits the scoped-VMEM estimate); every output write
    uses a static env index (dynamic sublane stores don't lower).

Bit-exactness: the raycast math is the same arithmetic as
:func:`megastep_tpu.ops.render.raycast` and the shade math matches
:func:`megastep_tpu.ops.render.shade`'s one-hot path; tests compare both
bit-for-bit (interpret mode on CPU, compiled on TPU).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..arrdict import arrdict
from . import geom
from .render import Z_TOLERANCE

PARALLEL_EPS = geom.PARALLEL_EPS
HI = jax.lax.Precision.HIGHEST
LO_WIDTH = 128  # texel-index lo radix == lane width


def pack_table8(scenery, baked=None):
    """The shade lookup table, blocked for the kernel's hierarchical lookup:
    ``out[n, b*8 + c, w]`` is channel ``c`` of texel ``t = b*128 + w``, where
    channels 0-3 are (r, g, b, baked) of texel t and 4-7 of texel t+1 (the
    roll-concat trick from :func:`megastep_tpu.ops.render.shade`).

    :param baked: override for ``scenery.baked`` (pass the re-baked array for
        multi-agent dynamic lighting).
    :return: (N, B*8, 128) f32 with ``B = ceil(T / 128)``.
    """
    baked = scenery.baked if baked is None else baked
    table = jnp.concatenate([scenery.textures, baked[..., None]], -1)  # (N,T,4)
    both = jnp.concatenate([table, jnp.roll(table, -1, axis=1)], -1)   # (N,T,8)
    N, T, _ = both.shape
    B = pl.cdiv(T, LO_WIDTH)
    both = jnp.pad(both, ((0, 0), (0, B * LO_WIDTH - T), (0, 0)))
    return both.reshape(N, B, LO_WIDTH, 8).transpose(0, 1, 3, 2).reshape(
        N, B * 8, LO_WIDTH)


def line_attrs(lines_now, scenery):
    """Static per-line attribute rows for the winner readout: (N, 4, L) f32 of
    (vx, vy, tex_start, tex_width)."""
    v = lines_now[..., 1, :] - lines_now[..., 0, :]                    # (N,L,2)
    return jnp.stack([v[..., 0], v[..., 1],
                      scenery.line_tex_starts.astype(jnp.float32),
                      scenery.line_tex_widths.astype(jnp.float32)], 1)


def _splitn(x, n=3):
    """bf16 residue split of f32: x ≈ sum of the n returned components —
    exact at n=3 (the 24-bit mantissa in three 8-bit chunks, what
    ``Precision.HIGHEST`` does internally); n=2 truncates to ~2^-16 relative
    error (the opt-in fast-shade mode, still far tighter than the reference
    CUDA shader's ``--use_fast_math`` numerics)."""
    out = []
    for _ in range(n - 1):
        t = x.astype(jnp.bfloat16)
        out.append(t)
        x = x - t.astype(jnp.float32)
    return tuple(out) + (x.astype(jnp.bfloat16),)


def _split3(x):
    """Exact 3-way bf16 split of f32: x == sum of the returned components."""
    return _splitn(x, 3)


def split_table8(table8, splits=3):
    """Pre-splits the shade table into ``splits`` bf16 components
    (see :func:`_splitn`), stacked as (N, splits, B*8, 128) bf16 — computed
    once outside the kernel (statically for single-agent envs) instead of per
    (env, agent) program, which measured ~0.1 µs/env of in-kernel VPU time.
    Each component costs one bf16 MXU pass per shade lookup: ``splits=3`` is
    exact f32, ``splits=2`` trades ~1.5e-5 relative shade error for a third
    of the kernel's dominant MXU cost."""
    return jnp.stack(_splitn(table8, splits), 1)


def dynamic_rows(t_dyn, t_pad):
    """Row indices of :func:`pack_table8`'s output that depend on the dynamic
    texels' baked intensity: the ch3 (baked of t) and ch7 (baked of t+1) rows
    of every block covering texels [0, t_dyn), plus the final block's ch7 row
    (:func:`pack_table8`'s roll wraps texel 0's baked into index t_pad-1).
    Everything else in the table — all color channels, static texels' baked —
    is frame-invariant."""
    B = pl.cdiv(t_pad, LO_WIDTH)
    rows = []
    for b in range(pl.cdiv(t_dyn, LO_WIDTH)):
        rows += [b * 8 + 3, b * 8 + 7]
    wrap = (B - 1) * 8 + 7
    return tuple(rows if wrap in rows else rows + [wrap])


def pack_table8_patch(scenery, baked_dyn, splits=3):
    """Per-frame replacement rows for a *static pre-split* shade table, for
    envs where only the dynamic (agent-model) texels' lighting changes each
    frame (the Deathmatch re-bake). Instead of rebuilding and re-splitting the
    whole (N, B*8, 128) table per step, the kernel patches these few rows into
    its VMEM-resident copy (see ``table_patch`` in :func:`observe`).

    :param splits: must match the static table's :func:`split_table8` count.
    :return: (N, splits, P, 128) bf16 — the :func:`_splitn` components of the
        ``P = len(dynamic_rows(...))`` rows, bit-identical to the same rows of
        ``split_table8(pack_table8(scenery, baked_patched), splits)``.
    """
    baked = scenery.baked
    N, t_pad = baked.shape
    t_dyn = baked_dyn.shape[1]
    W = LO_WIDTH
    B = pl.cdiv(t_pad, W)
    pad = ((0, 0), (0, B * W - t_pad))
    full = baked.at[:, :t_dyn].set(baked_dyn)
    rolled = jnp.concatenate([full[:, 1:], full[:, :1]], 1)
    chans = {3: jnp.pad(full, pad), 7: jnp.pad(rolled, pad)}
    content = jnp.stack(
        [chans[r % 8][:, (r // 8) * W:(r // 8 + 1) * W]
         for r in dynamic_rows(t_dyn, t_pad)], 1)         # (N, P, W) f32
    return jnp.stack(_splitn(content, splits), 1)         # (N, S, P, W) bf16


def _observe_kernel(res, env_block, n_blocks, half_screen_width, agent_radius,
                    want_seen, presplit, patch_rows, draw_model, idx_base,
                    fast_div, lines_ref, attrs_ref, table_ref, pose_ref, *rest):
    """One program = ``env_block`` envs × one agent × all ``res`` rays.

    Blocks: lines (1, E, L, 4) VMEM · attrs (1, E, 4, L) VMEM · table — either
    (1, E, 3, B*8, 128) bf16 (pre-split, :func:`split_table8`; the right form
    for static tables) or (1, E, B*8, 128) f32 (split in-kernel; cheaper when
    the table is rebuilt every frame, e.g. the dynamic re-bake) ·
    pose (1, E, A, 3) SMEM → outputs idx/dist/r/g/b (1, 1, E, R)
    [+ seen counts (1, 1, E, B, 128) when ``want_seen``].

    Invariant relied on instead of a width mask: padded/dead line slots are
    all-zero segments (the scene compiler zero-fills), which the parallel test
    rejects identically to the jnp reference's width mask.
    """
    rest = list(rest)
    patch_ref = rest.pop(0) if patch_rows else None
    idx_ref, dist_ref, rgb_ref = rest[:3]
    rest = rest[3:]
    seen_ref = rest.pop(0) if want_seen else None
    scratch = rest
    L = lines_ref.shape[2]
    R = res
    B = n_blocks
    W = LO_WIDTH
    a = pl.program_id(1)

    if scratch:
        # Per-env table work shared by all agents: the grid's agent axis is
        # sequential, so the first agent's program prepares the (E, 3, B*8, W)
        # bf16 table in a persistent VMEM scratch and the rest reuse it.
        split_ref = scratch[0]

        @pl.when(a == 0)
        def _():
            if patch_rows:
                # Pre-split static table + per-frame dynamic rows: overwrite
                # the few rows that track the agent-model re-bake
                # (:func:`pack_table8_patch`) in the VMEM copy — no per-frame
                # HBM table rebuild.
                rowid = jax.lax.broadcasted_iota(
                    jnp.int32, (8 * n_blocks, 1), 0)
                for e in range(env_block):
                    for i in range(table_ref.shape[2]):
                        t = table_ref[0, e, i]
                        for j, row in enumerate(patch_rows):
                            t = jnp.where(rowid == row,
                                          patch_ref[0, e, i, j:j + 1], t)
                        split_ref[e, i] = t
            else:
                # Multi-agent + unsplit table: the 3-way bf16 split is cheaper
                # done once per env than per (env, agent) program.
                for e in range(env_block):
                    t1, t2, t3 = _split3(table_ref[0, e])
                    split_ref[e, 0] = t1
                    split_ref[e, 1] = t2
                    split_ref[e, 2] = t3

    iota_l = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)            # (L, 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)            # (1, R)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)            # (W, 1)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)            # (B, 1)
    # Screen coordinate of each ray (kernels.cu:234-236), as a lane row.
    # Parenthesized to match render.ray_y's order ((num/res) then * hsw) so
    # parity holds bit-for-bit at any res, not just powers of two.
    uy = half_screen_width * ((res - 2 * iota_r.astype(jnp.float32) - 1) / res)

    for e in range(env_block):
        lines = lines_ref[0, e]                                        # (L, 4)
        x0 = lines[:, 0:1]                                             # (L, 1)
        y0 = lines[:, 1:2]
        x1 = lines[:, 2:3]
        y1 = lines[:, 3:4]
        if draw_model:
            # In-kernel draw (kernels.cu:297-318): the dynamic head slots of
            # the *static* line input hold the unrotated tiled agent model
            # (the scene compiler's layout), which each program rotates +
            # translates by the owning agent's pose here — replacing the
            # XLA-side draw + its full-line-array update. Arithmetic matches
            # render.draw bit-for-bit: endpoints as (cos·x − sin·y) + px, the
            # direction as the *difference of transformed endpoints*.
            M = draw_model
            A = pose_ref.shape[2]
            n_dyn = A * M
            owner = iota_l // M                  # static rows: >= A, no match
            # Owner pose as (L, 1) columns (A madds each), then ONE vector
            # cos/sin per env — 2·A scalar transcendentals per program would
            # tie up the scalar unit for ~µs/env at A=4. Same bits: the
            # degree scaling and trig match geom.rotate's vectorized ops.
            ang_c = jnp.zeros((L, 1), jnp.float32)
            px_c = jnp.zeros((L, 1), jnp.float32)
            py_c = jnp.zeros((L, 1), jnp.float32)
            for b in range(A):
                mb = (owner == b).astype(jnp.float32)
                ang_c = ang_c + pose_ref[0, e, b, 0] * mb
                px_c = px_c + pose_ref[0, e, b, 1] * mb
                py_c = py_c + pose_ref[0, e, b, 2] * mb
            co_c = jnp.cos(jnp.pi / 180 * ang_c)
            si_c = jnp.sin(jnp.pi / 180 * ang_c)
            x0d = (co_c * x0 - si_c * y0) + px_c
            y0d = (si_c * x0 + co_c * y0) + py_c
            x1d = (co_c * x1 - si_c * y1) + px_c
            y1d = (si_c * x1 + co_c * y1) + py_c
            isdyn = iota_l < n_dyn
            ax = jnp.where(isdyn, x0d, x0)
            ay = jnp.where(isdyn, y0d, y0)
            vx = jnp.where(isdyn, x1d - x0d, x1 - x0)
            vy = jnp.where(isdyn, y1d - y0d, y1 - y0)
        else:
            ax, ay = x0, y0
            vx = x1 - x0
            vy = y1 - y0
        # No explicit liveness mask: padded line slots are all-zero segments,
        # so uxv == 0 -> parallel -> sq = inf -> invalid, identically to the
        # jnp reference's width mask (pays for itself: one (L, R) AND less).

        # Ray trig as a (1, 1) vector op, not scalar: scalar transcendentals
        # serialize on the scalar unit (2 per program × the whole grid —
        # EXPERIMENTS.md §4), and the vector path also matches the jnp
        # reference's VPU trig on chip.
        ang = pose_ref[0, e, a, 0] * jnp.full((1, 1), jnp.pi / 180, jnp.float32)
        co, si = jnp.cos(ang), jnp.sin(ang)
        px, py = pose_ref[0, e, a, 1], pose_ref[0, e, a, 2]

        # Ray directions in the global frame (kernels.cu:344-349), lane rows.
        rux = co - si * uy                                             # (1, R)
        ruy = si + co * uy
        rlen = jnp.sqrt(rux * rux + ruy * ruy)
        near = agent_radius / rlen

        pqx = ax - px                                                  # (L, 1)
        pqy = ay - py
        s_num = pqx * vy - pqy * vx                                    # (L, 1)
        uxv = vy * rux - vx * ruy                                      # (L, R)
        t_num = pqx * ruy - pqy * rux

        # One >= compare instead of (< then ~): bit-identical (uxv is always
        # finite — every input is — so the negation commutes with the compare)
        # and one (L, R) pass cheaper.
        not_distant = jnp.abs(uxv) >= PARALLEL_EPS
        if fast_div:
            # Opt-in: one reciprocal shared by both quotients — halves the
            # kernel's (L, R) divides (its costliest VPU op) at ~1-ulp drift
            # in sq/tq, which can flip the winner on tolerance-boundary rays.
            recip = 1. / uxv
            sq = s_num * recip                                         # (L, R)
            tq = t_num * recip
        else:
            # True divisions — identical bits to render.raycast's s_num/safe
            # on every non-distant entry (safe == uxv there). Distant entries
            # divide by the raw near-zero uxv (±inf/NaN instead of the
            # reference's masked inf) but are unobservable: ``not_distant``
            # excludes them from ``valid`` (so s_masked is inf, as before)
            # and the one-hot only ever selects the found winner (a valid
            # line) or row 0 on a miss, whose junk is masked by ``found``
            # downstream. Saves three (L, R) selects over the masked form.
            sq = s_num / uxv                                           # (L, R)
            tq = t_num / uxv

        valid = not_distant & (0 <= tq) & (tq <= 1) & (near < sq)
        s_masked = jnp.where(valid, sq, jnp.inf)
        s_min = jnp.min(s_masked, axis=0, keepdims=True)               # (1, R)
        # s_masked is inf on invalid lanes, so the tolerance test alone is the
        # eligibility test (one AND less than valid & (sq < ...)).
        eligible = s_masked < s_min + Z_TOLERANCE
        idx = jnp.min(jnp.where(eligible, iota_l, L), axis=0, keepdims=True)
        found = idx < L                                                # (1, R)
        idx0 = jnp.where(found, idx, 0)

        onehot = (iota_l == idx0)                                      # (L, R)

        # Winner attributes via exact bf16 MXU products: the one-hot is exact
        # 0/1 in bf16, so only the attrs operand needs the 3-way mantissa
        # split (:func:`_split3` — x == a1+a2+a3 exactly, and each component
        # dot selects one column losslessly, so the f32 sum reconstructs the
        # exact attrs value). Three bf16 passes where an f32 HIGHEST dot
        # (which must split BOTH operands) costs six. The split itself is a
        # (4, L) triviality.
        onehot_bf = onehot.astype(jnp.bfloat16)
        attr = sum(jnp.dot(ak, onehot_bf, preferred_element_type=jnp.float32)
                   for ak in _split3(attrs_ref[0, e]))                 # (4, R)
        # Direct masked selection of the winner's s/t. (Re-deriving them from
        # dot-selected endpoints — s = ((ax-px)·vy − (ay-py)·vx)/uxv_sel at
        # (1, R) — was bit-identical but chip-measured a 2.4% LOSS at the
        # Deathmatch bench config; see PERF.md negative results.)
        s_sel = jnp.min(jnp.where(onehot, sq, jnp.inf), axis=0, keepdims=True)
        t_sel = jnp.min(jnp.where(onehot, tq, jnp.inf), axis=0, keepdims=True)
        if draw_model:
            # The static attrs rows hold *unrotated* model directions for the
            # dynamic slots — read the winner's direction off the in-kernel
            # drawn columns instead (exactly one non-inf lane, like s_sel).
            sel_vx = jnp.min(jnp.where(onehot, vx, jnp.inf),
                             axis=0, keepdims=True)                    # (1, R)
            sel_vy = jnp.min(jnp.where(onehot, vy, jnp.inf),
                             axis=0, keepdims=True)
        else:
            sel_vx = attr[0:1]                                         # (1, R)
            sel_vy = attr[1:2]
        start = attr[2:3]
        tw = attr[3:4]

        vlen = jnp.sqrt(sel_vx * sel_vx + sel_vy * sel_vy)
        dot_sel = (rux * sel_vx + ruy * sel_vy) / (rlen * vlen + 1e-6)

        # Shade (kernels.cu:407-450): two-tap filter + Lambert, per-ray rows.
        loc = jnp.where(found, t_sel, .5)
        y = jnp.minimum(loc * (tw + 1), tw - 1)
        l = jnp.maximum(y - 1, 0.).astype(jnp.int32)
        rr = jnp.minimum(y, tw - 1).astype(jnp.int32)
        ld = jnp.abs(y - (l + 1).astype(jnp.float32)) + 1e-3
        rd = jnp.abs(y - (rr + 1).astype(jnp.float32)) + 1e-3
        lw = rd / (ld + rd)
        rw = ld / (ld + rd)

        # Hierarchical texel lookup: t = b*128 + w.
        tap = start.astype(jnp.int32) + l                              # (1, R)
        tap_hi = tap // W
        tap_lo = tap - tap_hi * W
        onehot_lo = (iota_w == tap_lo).astype(jnp.bfloat16)            # (W, R)
        onehot_hi = (iota_b == tap_hi).astype(jnp.float32)             # (B, R)

        if scratch:
            splits = tuple(split_ref[e, i] for i in range(split_ref.shape[1]))
        elif presplit:
            splits = tuple(table_ref[0, e, i]
                           for i in range(table_ref.shape[2]))
        else:
            splits = _split3(table_ref[0, e])
        inner = sum(
            jnp.dot(t, onehot_lo, preferred_element_type=jnp.float32)
            for t in splits)                                           # (B*8, R)
        taps = jnp.zeros((8, R), jnp.float32)
        for bb in range(B):
            taps = taps + inner[bb * 8:(bb + 1) * 8] * onehot_hi[bb:bb + 1]

        same = (rr == l)                                               # (1, R)
        tap_l = taps[0:4]
        tap_r = jnp.where(same, tap_l, taps[4:8])
        intensity = lw * tap_l[3:4] + rw * tap_r[3:4]

        lambert = 1 - jnp.where(found, dot_sel, 0.)**2
        shadefac = lambert * intensity                                 # (1, R)
        color = lw * tap_l[0:3] + rw * tap_r[0:3]                      # (3, R)
        screen = jnp.where(found, shadefac * color, 0.)

        # idx_base rebases sliced-off leading line slots (the skip_dyn mode)
        # so reported indices stay in the full line array's id space.
        idx_ref[0, 0, e:e + 1, :] = jnp.where(found, idx + idx_base,
                                              -1).astype(jnp.int32)
        dist_ref[0, 0, e:e + 1, :] = jnp.where(found, s_sel, jnp.inf) * rlen
        # One (E, 3R) rgb stream, channels at static lane offsets: XLA's
        # channel reshape outside is then free instead of a 3-array stack copy.
        rgb_ref[0, 0, e:e + 1, 0:R] = screen[0:1]
        rgb_ref[0, 0, e:e + 1, R:2 * R] = screen[1:2]
        rgb_ref[0, 0, e:e + 1, 2 * R:3 * R] = screen[2:3]

        if want_seen:
            # Seen-texel counts (reference explorer.py:34-48): texel index per
            # hit ray, hierarchical one-hot over (b, w), ray axis contracted on
            # the MXU. Exact: products are 0/1 and counts stay below 2^24.
            loc0 = jnp.where(found, t_sel, 0.)
            ti = jnp.minimum(jnp.floor(tw * loc0), tw - 1)
            tex = start.astype(jnp.int32) + jnp.maximum(ti, 0.).astype(jnp.int32)
            tex_hi = tex // W
            tex_lo = tex - tex_hi * W
            lo_m = ((iota_w == tex_lo) & found).astype(jnp.bfloat16)   # (W, R)
            hi_m = (iota_b == tex_hi).astype(jnp.bfloat16)             # (B, R)
            counts = jax.lax.dot_general(
                hi_m, lo_m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)                    # (B, W)
            # bf16 output: halves the kernel's largest HBM write (the (N, B*W)
            # stream ≈ 151 MB/step f32 at 16k envs). Counts are exact ≤ 256 and
            # round to a nearby nonzero above — downstream consumes `> 0` only
            # (explorer.py:189), which rounding can never flip.
            seen_ref[0, 0, e] = counts.astype(jnp.bfloat16)


# Empirical per-env scoped-VMEM footprint: ~14 live (L, R) f32 buffers in the
# raycast, plus the (W, R)/(B, R) one-hots and the 3-way split table copies.
# 88 MB admits E=32 at the res-512 floorplan worst case (L=64, B=19 ->
# ~85 MB estimated), chip-validated under the 100 MB Mosaic limit and 2.4%
# faster than the E=16 the old 80 MB budget forced (fbE32.log 13.22 ms vs
# fbE16.log 13.53 ms at 16k ungrouped agent-envs).
_VMEM_BUDGET = 88 * 1024 * 1024


def default_env_block(n_envs, n_lines=64, res=256, n_blocks=16):
    """Largest env unroll (32 → 1) whose estimated scoped-VMEM footprint fits
    (measured at Explorer shapes: E=32 is ~12% faster than E=8, E=64 marginal;
    cubicasa-scale scenes L≈224 drop to E=16)."""
    per_env = 14 * n_lines * res * 4 + 3 * n_blocks * 8 * LO_WIDTH * 4 \
        + 2 * (LO_WIDTH + n_blocks) * res * 4
    for e in (64, 32, 16, 8, 4, 2, 1):
        if n_envs % e == 0 and e * per_env <= _VMEM_BUDGET:
            return e
    return 1


@partial(jax.jit, static_argnames=('res', 'half_screen_width', 'agent_radius',
                                   'want_seen', 'env_block', 'patch_rows',
                                   'draw_model', 'skip_dyn', 'fast_div',
                                   'interpret', 'epilogue'))
def observe(lines_now, attrs, table8, lines_width, angles, positions, res,
            half_screen_width, agent_radius, want_seen=True, env_block=None,
            table_patch=None, patch_rows=(), draw_model=0, skip_dyn=0,
            fast_div=False, interpret=False, epilogue=None):
    """Fused raycast + shade (+ seen counts) over the whole env batch.

    :param lines_now: (N, L, 2, 2) this frame's lines (after :func:`render.draw`);
        with ``draw_model`` set, the *static* ``scenery.lines`` instead (whose
        dynamic head slots hold the unrotated tiled agent model).
    :param attrs: (N, 4, L) from :func:`line_attrs`.
    :param lines_width: (N,) true line counts. Unused by the kernel — padded
        line slots are all-zero segments, which the raycast's parallel test
        rejects identically to an explicit width mask — but kept in the
        signature to document the invariant at call sites.
    :param table8: the shade table — (N, S, B*8, 128) bf16 from
        :func:`split_table8` (pre-split into S components: 3 = exact f32,
        2 = fast mode at ~1.5e-5 relative shade error and one less MXU pass
        per lookup) or (N, B*8, 128) f32 straight from :func:`pack_table8`
        (split in-kernel; right for per-frame tables, where an XLA-side split
        costs more).
    :param table_patch: (N, S, P, 128) bf16 from :func:`pack_table8_patch` —
        per-frame replacement rows patched into the (pre-split) static table
        inside the kernel, so a dynamic re-bake costs a P-row stream instead
        of a full table rebuild. Requires a pre-split ``table8`` and
        ``patch_rows``.
    :param patch_rows: static row indices for ``table_patch``
        (:func:`dynamic_rows`).
    :param draw_model: lines per agent model (``scenery.n_model_lines``) to
        enable in-kernel draw: the kernel rotates + translates the dynamic
        head slots by each agent's pose itself, so callers skip
        :func:`render.draw`/:func:`line_attrs` per step and pass static
        inputs. 0 (default) = lines are pre-drawn. Bit-exact with the drawn
        path (tests/test_fused.py::test_draw_in_kernel_bit_exact).
    :param skip_dyn: slice this many leading line slots out of the raycast
        (indices are rebased so outputs stay in the full id space). For
        single-agent envs whose dynamic slots are zeroed (Explorer's
        skip-draw path) those rows can never win a ray, so dropping them cuts
        the (L, R) raycast chain by ``n_dynamic/L`` bit-exactly. Mutually
        exclusive with ``draw_model``.
    :param fast_div: share one reciprocal between the raycast's two (L, R)
        quotients instead of two true divisions — ~1 ulp drift in s/t that can
        flip tolerance-boundary winners, so opt-in (A/B via
        ``perf/fused_bench.py --fast-div``); the default keeps indices and
        distances exact vs the jnp reference.
    :param epilogue: optional consumer applied to the kernel outputs in their
        RAW (NB, A, E, ·) block layout, BEFORE the (NB, A, E) -> (N, A)
        transpose: ``epilogue(arrdict(indices, distances, screen)) -> arrdict``
        with ``screen`` as the (NB, A, E, 3·res) stream (channels at static
        lane offsets — ``x.reshape(*x.shape[:-1], 3, res)`` splits them for
        free). Per-env reductions (obs pooling, the Deathmatch mid-column
        pick) belong here: the multi-agent transpose materializes a copy, so
        pooling first moves ``subsample``× less data through it. Each
        returned leaf must stay (NB, A, E, ...) and is transposed/reshaped to
        (N, A, ...) for the caller. ``seen_counts`` is handled separately and
        never passes through the epilogue.
    :return: arrdict with ``indices`` (N, A, R) i32, ``distances`` (N, A, R),
        ``screen`` (N, A, 3, R) (or the epilogue's outputs at (N, A, ...)),
        and (if ``want_seen``) ``seen_counts``
        (N, B*128) f32 — slice to the scenery's T texels. Counts ride HBM as
        bf16 (exact ≤ 256, nonzero-preserving above); consume as ``> 0``.
    """
    N, A = angles.shape
    if skip_dyn:
        if draw_model:
            raise ValueError('skip_dyn slices off the very slots draw_model '
                             'would draw into')
        lines_now = lines_now[:, skip_dyn:]
        attrs = attrs[:, :, skip_dyn:]
    L = lines_now.shape[1]
    presplit = table8.ndim == 4
    if (table_patch is None) != (len(patch_rows) == 0):
        raise ValueError('table_patch and patch_rows must be passed together '
                         '(a dropped patch would silently freeze dynamic '
                         'lighting)')
    if table_patch is not None and not presplit:
        raise ValueError('table_patch requires a pre-split table8')
    patch_rows = tuple(patch_rows)
    S = table8.shape[1] if presplit else 3  # bf16 components per lookup
    if table_patch is not None and table_patch.shape[1] != S:
        raise ValueError('table_patch split count must match table8')
    B = table8.shape[-2] // 8
    E = default_env_block(N, L, res, B) if env_block is None else env_block
    NB = N // E

    flat = lines_now.reshape(NB, E, L, 4)
    attrs = attrs.reshape(NB, E, 4, L)
    table8 = (table8.reshape(NB, E, S, 8 * B, LO_WIDTH) if presplit
              else table8.reshape(NB, E, 8 * B, LO_WIDTH))
    pose = jnp.concatenate([angles[..., None], positions], -1).reshape(NB, E, A, 3)
    P = len(patch_rows)
    operands = [flat, attrs, table8, pose]
    if patch_rows:
        operands.append(table_patch.reshape(NB, E, S, P, LO_WIDTH))

    kernel = partial(_observe_kernel, res, E, B, float(half_screen_width),
                     float(agent_radius), want_seen, presplit, patch_rows,
                     draw_model, skip_dyn, fast_div)
    out_shape = [
        jax.ShapeDtypeStruct((NB, A, E, res), jnp.int32),
        jax.ShapeDtypeStruct((NB, A, E, res), jnp.float32),
        jax.ShapeDtypeStruct((NB, A, E, 3 * res), jnp.float32)]
    if want_seen:
        out_shape += [jax.ShapeDtypeStruct((NB, A, E, B, LO_WIDTH), jnp.bfloat16)]

    scratch_shapes = []
    if patch_rows or (not presplit and A > 1):
        scratch_shapes = [pltpu.VMEM((E, S, 8 * B, LO_WIDTH), jnp.bfloat16)]
    in_specs = [
        pl.BlockSpec((1, E, L, 4), lambda n, a: (n, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, E, 4, L), lambda n, a: (n, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        (pl.BlockSpec((1, E, S, 8 * B, LO_WIDTH),
                      lambda n, a: (n, 0, 0, 0, 0),
                      memory_space=pltpu.VMEM) if presplit else
         pl.BlockSpec((1, E, 8 * B, LO_WIDTH), lambda n, a: (n, 0, 0, 0),
                      memory_space=pltpu.VMEM)),
        pl.BlockSpec((1, E, A, 3), lambda n, a: (n, 0, 0, 0),
                     memory_space=pltpu.SMEM)]
    if patch_rows:
        in_specs.append(pl.BlockSpec(
            (1, E, S, P, LO_WIDTH), lambda n, a: (n, 0, 0, 0, 0),
            memory_space=pltpu.VMEM))
    grid_spec = pl.GridSpec(
        grid=(NB, A),
        scratch_shapes=scratch_shapes,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, E, res), lambda n, a: (n, a, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)] + [
            pl.BlockSpec((1, 1, E, 3 * res), lambda n, a: (n, a, 0, 0),
                         memory_space=pltpu.VMEM)] + ([
            pl.BlockSpec((1, 1, E, B, LO_WIDTH), lambda n, a: (n, a, 0, 0, 0),
                         memory_space=pltpu.VMEM)] if want_seen else []))

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=interpret,
    )(*operands)
    idx, dist, rgb = outs[:3]

    def to_nar(x):
        # (NB, A, E, ...) -> (N, A, ...); for A == 1 this is a pure reshape.
        perm = (0, 2, 1) + tuple(range(3, x.ndim))
        return x.transpose(perm).reshape(N, A, *x.shape[3:])

    raw = arrdict(indices=idx, distances=dist, screen=rgb)
    if epilogue is not None:
        raw = epilogue(raw)
    out = arrdict({k: to_nar(v) for k, v in raw.items()})
    if epilogue is None:
        # The kernel lays channels out at static lane offsets of one (E, 3R)
        # stream; the channel split here is a free reshape, not a stack copy.
        out['screen'] = out.screen.reshape(N, A, 3, res)
    if want_seen:
        # (NB, A, E, B, W): sum per-agent counts in f32 (the kernel emits bf16);
        # (B, W) flattens to the texel axis row-major for free.
        out['seen_counts'] = (outs[3].astype(jnp.float32).sum(1)
                              .reshape(N, B * LO_WIDTH))
    return out


#: Relative per-scene kernel cost of one shade table block vs one line row,
#: for the bucket-cut optimizer: chip-measured at the res-512 Deathmatch
#: shapes (raycast ≈ 5.5 ms at L=64, shade ≈ 4.5 ms at B=19 → ms-per-unit
#: ratio ≈ 2.76). The DP optimum is flat in this weight, so one setting
#: serves every config.
_SHADE_WEIGHT = 2.76


def _dp_cuts(block_l, block_t, n_groups):
    """Optimal contiguous partition of size-sorted gran-blocks into exactly
    ``n_groups`` groups, minimizing the padded kernel cost
    ``Σ n_g · (Lpad(max lw) + _SHADE_WEIGHT · Bpad(max tw))`` — uniform cuts
    leave ~3% of the kernel cost on the table at the bench's floorplan
    distribution (measured offline, G16 @ 4,096 scenes). O(P²·G) numpy at
    build time over P = N/gran positions.

    :return: list of ``n_groups + 1`` cut indices in block units.
    """
    P = len(block_l)
    G = n_groups
    seg = np.full((P, P + 1), np.inf)
    for i in range(P):
        lm, tm = 0, 0
        for j in range(i + 1, P + 1):
            lm = max(lm, int(block_l[j - 1]))
            tm = max(tm, int(block_t[j - 1]))
            seg[i, j] = (j - i) * (-(-lm // 8) * 8
                                   + _SHADE_WEIGHT * -(-tm // LO_WIDTH))
    dp = np.full((G + 1, P + 1), np.inf)
    dp[0, 0] = 0.
    arg = np.zeros((G + 1, P + 1), np.int32)
    for g in range(1, G + 1):
        for j in range(g, P + 1):
            c = dp[g - 1, :j] + seg[:j, j]
            k = int(np.argmin(c))
            dp[g, j] = c[k]
            arg[g, j] = k
    cuts = [P]
    for g in range(G, 0, -1):
        cuts.append(int(arg[g, cuts[-1]]))
    return cuts[::-1]


def size_groups(lines_width, tex_width, n_groups=4, gran=64, method='dp'):
    """Static size-bucket spec for :func:`observe_grouped`.

    Floorplan batches pad every env to the global max line/texel count, but the
    kernel's dominant costs scale with the pad: the shade lookup is a dense
    (B*8, 128) @ (128, R) product and the raycast is O(L·R). Measured over
    procedural floorplans, mean/max is ~0.57 for texels and ~0.76 for lines —
    i.e. nearly half the shade FLOPs are padding. With the env axis *sorted by
    texel count* (``scene.sort_by_size``), splitting it into contiguous groups
    padded only to each group's own max removes most of that waste. Cut
    positions are optimized by :func:`_dp_cuts` (cost-weighted, not uniform).

    :param gran: cut positions stay multiples of this so the kernel's env-block
        unroll divides each group; ``n_groups`` halves until ``n_groups * gran``
        divides the batch.
    :param method: ``'dp'`` (cost-weighted cut optimizer, the default) or
        ``'uniform'`` (equal N/G groups — the pre-round-5 behavior, kept as
        the A/B baseline: ``bench.py --cuts uniform``).
    :return: tuple of ``(start, end, L_g, B_g)`` per group (empty ⇒ ungrouped).
    """
    lw, tw = np.asarray(lines_width), np.asarray(tex_width)
    N, G = len(lw), n_groups
    while G > 1 and N % (G * gran):
        G //= 2
    if G <= 1:
        return ((0, N, int(-(-int(lw.max()) // 8) * 8),
                 int(-(-int(tw.max()) // LO_WIDTH))),)
    P = N // gran
    if method == 'uniform':
        cuts = list(range(0, P + 1, P // G))
    else:
        cuts = _dp_cuts(lw[:P * gran].reshape(P, gran).max(1),
                        tw[:P * gran].reshape(P, gran).max(1), G)
    return tuple(
        (c0 * gran, c1 * gran,
         int(-(-int(lw[c0 * gran:c1 * gran].max()) // 8) * 8),
         int(-(-int(tw[c0 * gran:c1 * gran].max()) // LO_WIDTH)))
        for c0, c1 in zip(cuts[:-1], cuts[1:]))


def sharded_size_groups(lines_width, tex_width, n_shards, n_groups=4,
                        gran=64, method='dp'):
    """Per-shard-LOCAL size buckets for a shard-major, striped-sorted env axis
    (:func:`megastep_tpu.scene.striped_order`): device shard ``s`` holds envs
    ``[s*n_local, (s+1)*n_local)``, each internally size-sorted; local group
    ``g`` spans local rows ``[g*gsz, (g+1)*gsz)`` on EVERY shard, padded to the
    max over all shards' group-``g`` scenes — so one SPMD program serves every
    device. Under striped_order the union of all shards' group-``g`` rows is
    exactly the globally-sorted rank range ``[g*gsz*S, (g+1)*gsz*S)``, so the
    group maxima equal what a global sort + :func:`size_groups` would pick:
    mesh mode loses none of the bucketing lever's padding savings.

    :param lines_width, tex_width: the GLOBAL width arrays, in env order.
    :return: tuple of LOCAL ``(start, end, L_g, B_g)`` per group — pass as
        ``groups`` to :func:`observe_grouped` alongside ``shard_mesh``.
    """
    lw, tw = np.asarray(lines_width), np.asarray(tex_width)
    N = len(lw)
    assert N % n_shards == 0, (N, n_shards)
    n_local = N // n_shards
    G = n_groups
    while G > 1 and n_local % (G * gran):
        G //= 2
    if G <= 1:
        return ((0, n_local, int(-(-int(lw.max()) // 8) * 8),
                 int(-(-int(tw.max()) // LO_WIDTH))),)
    # Per-local-gran-block maxima over the UNION of every shard's rows (the
    # padding each local group really pays), then the same cost-weighted DP
    # cut optimizer as :func:`size_groups`.
    P = n_local // gran
    if method == 'uniform':
        cuts = list(range(0, P + 1, P // G))
    else:
        bl = lw.reshape(n_shards, P, gran).max((0, 2))
        bt = tw.reshape(n_shards, P, gran).max((0, 2))
        cuts = _dp_cuts(bl, bt, G)
    out = []
    for c0, c1 in zip(cuts[:-1], cuts[1:]):
        rows = np.concatenate([np.arange(s * n_local + c0 * gran,
                                         s * n_local + c1 * gran)
                               for s in range(n_shards)])
        out.append((c0 * gran, c1 * gran,
                    int(-(-int(lw[rows].max()) // 8) * 8),
                    int(-(-int(tw[rows].max()) // LO_WIDTH))))
    return tuple(out)


def shard_group_rows(groups, n_shards, n_local):
    """Global env-row indices of each LOCAL group under the shard-major layout:
    group ``g``'s pre-sliced static arrays concatenate every shard's local-row
    block ``[g0, g1)``, so that an env-axis ``NamedSharding`` hands device
    ``s`` exactly its own group-``g`` scenes. Pass as ``rows=`` to
    :func:`group_tables`/:func:`group_lines` at construction."""
    return tuple(
        np.concatenate([np.arange(s * n_local + g0, s * n_local + g1)
                        for s in range(n_shards)])
        for g0, g1, _, _ in groups)


def group_tables(groups, table8, rows=None):
    """Pre-slices a (pre-split) shade table into per-group arrays for
    :func:`observe_grouped`. Call ONCE at env construction for static tables:
    a per-step ``table8[g0:g1, :, :8*Bg]`` inside the jitted step materializes
    a fresh copy of the whole multi-hundred-MB table every frame (pallas_call
    operands can't alias a strided slice) — measured as the round-3 Explorer
    regression (1.72M → 1.45M steps/s at 16k envs).

    :param rows: optional per-group global env-row indices
        (:func:`shard_group_rows`) replacing the contiguous ``[g0:g1]`` slice —
        the mesh layout, where a local group's scenes stripe across shards.
    """
    if len(groups) <= 1:
        return table8
    presplit = table8.ndim == 4
    out = []
    for gi, (g0, g1, Lg, Bg) in enumerate(groups):
        t = table8[rows[gi]] if rows is not None else table8[g0:g1]
        out.append(t[:, :, :8 * Bg, :] if presplit else t[:, :8 * Bg, :])
    return tuple(out)


def group_lines(groups, lines_now, attrs, rows=None):
    """Pre-slices static lines/attrs per group (same per-step-copy argument as
    :func:`group_tables`; for per-step drawn lines the slice is small and can
    stay in-step). Returns ``(lines_tuple, attrs_tuple)``."""
    if len(groups) <= 1:
        return lines_now, attrs

    def sel(x, gi):
        g0, g1 = groups[gi][:2]
        return x[rows[gi]] if rows is not None else x[g0:g1]

    return (tuple(sel(lines_now, gi)[:, :Lg]
                  for gi, (_, _, Lg, _) in enumerate(groups)),
            tuple(sel(attrs, gi)[:, :, :Lg]
                  for gi, (_, _, Lg, _) in enumerate(groups)))


def observe_grouped(groups, lines_now, attrs, table8, lines_width, angles,
                    positions, res, half_screen_width, agent_radius,
                    want_seen=True, env_block=None, table_patch=None,
                    patch_rows=(), draw_model=0, skip_dyn=0, fast_div=False,
                    seen_blocks=None, interpret=False, shard_mesh=None,
                    shard_axis='env', epilogue=None):
    """:func:`observe` over size-sorted env buckets (:func:`size_groups`): each
    contiguous group runs the kernel with lines/table sliced to the group's own
    padded sizes, and the results concatenate back along the env axis. Safe
    because the table's roll-concat hi channels are never consumed across a
    line boundary, so rows beyond a group's own blocks are dead weight.

    ``lines_now``/``attrs``/``table8`` may each be a full array (sliced here,
    per step — fine for small per-frame inputs) or a per-group tuple from
    :func:`group_lines`/:func:`group_tables` (the right form for static
    inputs: a per-step slice of a static table re-copies it every frame).

    :param seen_blocks: global texel block count (``T_pad // 128``) for the
        ``seen_counts`` width. Required when the tables are pre-grouped AND
        the scenery was built with ``pad_to`` padding the texel axis beyond
        this batch's own max — the group specs only know the local sizes.
        Defaults to the full table's (or the largest group's) block count.
    :param shard_mesh: a :class:`jax.sharding.Mesh` to run the observe under
        ``jax.shard_map`` over, with every operand and output split on axis 0
        (the env axis) along ``shard_axis``. ``pallas_call`` lowers to a
        custom call whose sharding GSPMD treats conservatively — left to the
        partitioner, a multi-device program would all-gather the env-sharded
        lines/tables onto every device; shard_map instead pins one per-device
        kernel over each local shard, with **no collectives by construction**
        (pinned by ``tests/test_spmd_fused.py``'s compiled-HLO scan). With a
        mesh, ``groups`` must be the per-shard-LOCAL bucket spec
        (:func:`sharded_size_groups`) and pre-grouped static inputs must be
        laid out by :func:`shard_group_rows`.

    :param epilogue: optional raw-layout consumer forwarded to each group's
        :func:`observe` call (see there for the contract): per-env reductions
        (obs pooling, the Deathmatch mid-column pick) run on each group's
        kernel outputs in their (NB, A, E, ·) block layout, BEFORE the
        multi-agent transpose and the env-axis concatenation — so only the
        pooled results ride both. Without it the full-res streams materialize
        through transpose + concat just to be pooled right after (~1.5
        ms/step at the Deathmatch 16k config on the profile). Per-env
        elementwise/pooled outputs are bit-identical either side of a
        transpose or concat, so this is purely a scheduling hook.
        ``seen_counts`` is concatenated (padded per group) exactly as before
        and is not passed to the epilogue.

    Indices match the ungrouped kernel exactly; float outputs can drift ~1 ULP
    because XLA's fusion decisions differ between the sliced and full-shape
    programs (observable from a bare env-axis slice alone in interpret mode).
    """
    if shard_mesh is not None:
        from jax.sharding import PartitionSpec
        spec = PartitionSpec(shard_axis)
        arrays = (lines_now, attrs, table8, lines_width, angles, positions,
                  table_patch)

        def local(lines_now, attrs, table8, lines_width, angles, positions,
                  table_patch):
            return observe_grouped(
                groups, lines_now, attrs, table8, lines_width, angles,
                positions, res, half_screen_width, agent_radius,
                want_seen=want_seen, env_block=env_block,
                table_patch=table_patch, patch_rows=patch_rows,
                draw_model=draw_model, skip_dyn=skip_dyn, fast_div=fast_div,
                seen_blocks=seen_blocks, interpret=interpret,
                epilogue=epilogue)

        # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
        # annotation; the env axis is embarrassingly parallel here, so the
        # static VMA analysis has nothing to catch.
        return jax.shard_map(
            local, mesh=shard_mesh,
            in_specs=jax.tree.map(lambda _: spec, arrays),
            out_specs=spec, check_vma=False)(*arrays)
    if len(groups) <= 1:
        return observe(lines_now, attrs, table8, lines_width, angles,
                       positions, res, half_screen_width, agent_radius,
                       want_seen=want_seen, env_block=env_block,
                       table_patch=table_patch, patch_rows=patch_rows,
                       draw_model=draw_model, skip_dyn=skip_dyn,
                       fast_div=fast_div, interpret=interpret,
                       epilogue=epilogue)
    if seen_blocks is not None:
        B = seen_blocks
    elif isinstance(table8, (tuple, list)):
        if want_seen:
            # The max-group fallback is wrong whenever the scenery was built
            # with pad_to padding the texel axis beyond this batch's own max:
            # seen_counts would come out silently narrower than state.seen.
            # Only the caller knows the global block count — require it.
            raise ValueError('seen_blocks is required when want_seen=True '
                             'with pre-grouped tables (group specs only know '
                             'local sizes; under pad_to the global texel axis '
                             'can be wider than every group)')
        B = max(g[3] for g in groups)
    else:
        B = table8.shape[-2] // 8
    # Normalize in-step inputs through the same pre-slicing helpers the envs
    # use for static inputs, so the slice expressions live in one place.
    if not isinstance(table8, (tuple, list)):
        table8 = group_tables(groups, table8)
    if not isinstance(lines_now, (tuple, list)):
        lines_now, attrs = group_lines(groups, lines_now, attrs)
    outs, seens = [], []
    for gi, (g0, g1, Lg, Bg) in enumerate(groups):
        pg, rg = None, ()
        if table_patch is not None:
            # dynamic_rows is ascending with the (global-block) wrap row last;
            # a sliced table keeps only the rows below its own block count.
            rg = tuple(r for r in patch_rows if r < 8 * Bg)
            pg = table_patch[g0:g1, :, :len(rg), :]
        o = observe(
            lines_now[gi], attrs[gi], table8[gi],
            lines_width[g0:g1], angles[g0:g1], positions[g0:g1], res,
            half_screen_width, agent_radius, want_seen=want_seen,
            env_block=env_block, table_patch=pg, patch_rows=rg,
            draw_model=draw_model, skip_dyn=skip_dyn, fast_div=fast_div,
            interpret=interpret, epilogue=epilogue)
        if want_seen:
            seens.append(o.pop('seen_counts'))
        outs.append(o)
    out = arrdict({k: jnp.concatenate([o[k] for o in outs])
                   for k in outs[0]})
    if want_seen:
        out['seen_counts'] = jnp.concatenate(
            [jnp.pad(sc, ((0, 0), (0, (B - g[3]) * LO_WIDTH)))
             for g, sc in zip(groups, seens)])
    return out
