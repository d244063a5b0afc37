"""Light baking: per-texel illumination with hard shadows.

Counterpart of the reference baking kernel and ``light_intensity`` device function
(``/root/reference/megastep/src/kernels.cu:232-293``): each texel center accumulates
``LUMINANCE * intensity / max(d^2, 1)`` from every light that has unobstructed
line-of-sight (occlusion tested against *static* lines only), plus 0.1 ambient,
clamped to 1.

Two uses:
  * :func:`bake` — one-time static bake at scene build, driven from the host in env
    chunks to bound peak memory;
  * :func:`dynamic_texel_intensity` — per-step re-bake of the agent-model texels
    (the first ``n_dynamic_texels`` of every env), giving moving agents live
    lighting. The reference instead evaluates lighting at the exact hit point for
    dynamic lines (``kernels.cu:432-439``); re-baking texel centers gives the same
    filtered appearance through one uniform shader path — a deliberate TPU-first
    unification (texel res is 5 cm and agent edges are ~6 cm, so the differences are
    sub-texel).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants
from . import geom


def texel_points(lines, tex_line, line_tex_starts, line_tex_widths, t0, T,
                 method=None, l_max=None):
    """World coordinates of texel centers ``t0 : t0+T`` for every env.

    :param lines: (N, L, 2, 2) line array to read geometry from.
    :param tex_line: (N, Tmax) owning line of each texel.
    :param method: 'onehot' (MXU lookups — the TPU default; per-row gathers
        serialize there) or 'gather'.
    :param l_max: static upper bound on the owning-line index of the requested
        texels (all ``tex_line[:, t0:t0+T] < l_max``) — slices the line axis
        out of the lookup. The dynamic re-bake passes ``n_dynamic``: agent
        texels live on agent lines, so the wall rows are dead weight there.
    :return: (N, T, 2) texel centers.
    """
    if method is None:
        method = 'onehot' if jax.default_backend() == 'tpu' else 'gather'
    if l_max is not None:
        lines = lines[:, :l_max]
        line_tex_starts = line_tex_starts[:, :l_max]
        line_tex_widths = line_tex_widths[:, :l_max]
    tl = jax.lax.dynamic_slice_in_dim(tex_line, t0, T, axis=1)            # (N, T)
    if method == 'onehot':
        from .render import onehot_lookup
        N, L = lines.shape[:2]
        attrs = jnp.concatenate([
            lines.reshape(N, L, 4),
            line_tex_starts[..., None].astype(jnp.float32),
            line_tex_widths[..., None].astype(jnp.float32)], -1)          # (N, L, 6)
        sel = onehot_lookup(attrs, tl)                                    # (N, T, 6)
        a, b = sel[..., 0:2], sel[..., 2:4]
        starts, widths = sel[..., 4], sel[..., 5]
    else:
        starts = jnp.take_along_axis(line_tex_starts, tl, 1)
        widths = jnp.take_along_axis(line_tex_widths, tl, 1)
        a = jnp.take_along_axis(lines[..., 0, :], tl[..., None], 1)       # (N, T, 2)
        b = jnp.take_along_axis(lines[..., 1, :], tl[..., None], 1)
    t_idx = t0 + jnp.arange(T)[None]
    loc = (t_idx - starts + .5) / jnp.maximum(widths, 1)
    return a * (1 - loc[..., None]) + b * loc[..., None]


def intensity_at(points, lines, lines_width, n_dynamic, lights, lights_width,
                 chunk=64):
    """Light intensity at each query point, with hard-shadow occlusion.

    :param points: (N, P, 2) query points.
    :param lines: (N, L, 2, 2); only slots ``n_dynamic <= l < lines_width`` occlude.
    :param lights: (N, K, 3) — x, y, intensity.
    :return: (N, P) intensities in [0, 1].
    """
    N, P, _ = points.shape
    K = lights.shape[1]
    L = lines.shape[1]

    # Planar components throughout (no stacked (..., 2) point arrays): the
    # (N, P, K, chunk) occlusion intermediates are the big streams here, and
    # a materialized (..., 2)-minormost array would pad its last tile
    # dimension 64× on TPU. Same per-element arithmetic as geom.intersect —
    # bit-identical results.
    Ix = lights[:, None, :, 0]                                            # (N, 1, K)
    Iy = lights[:, None, :, 1]
    Ii = lights[:, None, :, 2]
    Cx = points[:, :, None, 0]                                            # (N, P, 1)
    Cy = points[:, :, None, 1]
    Ux = Cx - Ix                                                          # (N, P, K)
    Uy = Cy - Iy

    light_idx = jnp.arange(K)[None, None]
    light_live = light_idx < lights_width[:, None, None]                  # (N, 1, K)

    # Occlusion: scan static lines in chunks, accumulating "any obstruction".
    # Clamp the chunk to the (8-aligned) line count: the per-step dynamic
    # re-bake passes only the ~32 static lines, and padding those to a 64-wide
    # chunk doubles the (N, P, K, chunk) occlusion stream for nothing.
    chunk = min(chunk, max(8, -(-L // 8) * 8))
    n_chunks = -(-L // chunk)
    Lpad = n_chunks * chunk
    lines_p = jnp.pad(lines, ((0, 0), (0, Lpad - L), (0, 0), (0, 0)))
    lines_c = lines_p.reshape(N, n_chunks, chunk, 2, 2).transpose(1, 0, 2, 3, 4)

    def body(carry, args):
        obstructed = carry
        seg, c0 = args
        ax = seg[:, None, None, :, 0, 0]                                  # (N,1,1,c)
        ay = seg[:, None, None, :, 0, 1]
        vx = seg[:, None, None, :, 1, 0] - ax
        vy = seg[:, None, None, :, 1, 1] - ay
        # geom.intersect(I, U, a, v), planar over (N, P, K, c).
        ux = Ux[..., None]
        uy = Uy[..., None]
        uxv = ux * vy - uy * vx
        pqx = ax - Ix[..., None]
        pqy = ay - Iy[..., None]
        distant = jnp.abs(uxv) < geom.PARALLEL_EPS
        safe = jnp.where(distant, 1., uxv)
        s = jnp.where(distant, jnp.inf, (pqx * vy - pqy * vx) / safe)
        t = jnp.where(distant, jnp.inf, (pqx * uy - pqy * ux) / safe)
        l_idx = c0 + jnp.arange(chunk)[None, None, None]
        static = (l_idx >= n_dynamic) & (l_idx < lines_width[:, None, None, None])
        blocked = (t > 0.) & (t < 1.) & (s > 0.) & (s < .999) & static
        return obstructed | blocked.any(-1), None

    chunk_starts = jnp.arange(n_chunks) * chunk
    obstructed0 = jnp.zeros((N, P, K), bool)
    obstructed, _ = jax.lax.scan(body, obstructed0, (lines_c, chunk_starts))

    d2 = (Ix - Cx)**2 + (Iy - Cy)**2                                      # (N, P, K)
    contrib = constants.LUMINANCE * Ii / jnp.maximum(d2, 1.)
    lit = (~obstructed) & light_live
    total = constants.AMBIENT + jnp.where(lit, contrib, 0.).sum(-1)
    return jnp.minimum(total, 1.)


@partial(jax.jit, static_argnames=('n_dynamic', 'T'))
def _bake_chunk(lines, lines_width, lights, lights_width, tex_line,
                line_tex_starts, line_tex_widths, n_dynamic, t0, T):
    # t0 is traced (texel_points only dynamic-slices with it), so all
    # uniform-T chunks share ONE compile — a static t0 recompiled per texel
    # chunk, which at build time through the remote-compile tunnel dominated
    # scenery construction.
    C = texel_points(lines, tex_line, line_tex_starts, line_tex_widths, t0, T)
    return intensity_at(C, lines, lines_width, n_dynamic, lights, lights_width)


def bake(scenery, env_chunk=512, tex_chunk=512):
    """Bakes static illumination into ``scenery.baked``.

    Host-driven in (env, texel) chunks so that peak device memory stays bounded at
    any env count; the one-time cost at scene build mirrors the reference's
    ``cuda.bake`` (``kernels.cu:286-293``). Padded texels keep the reference's
    initialize-to-ones convention.
    """
    N, Tmax = scenery.baked.shape
    baked = np.ones((N, Tmax), np.float32)
    for n0 in range(0, N, env_chunk):
        n1 = min(n0 + env_chunk, N)
        for t0 in range(0, Tmax, tex_chunk):
            T = min(tex_chunk, Tmax - t0)
            vals = _bake_chunk(
                scenery.lines[n0:n1], scenery.lines_width[n0:n1],
                scenery.lights[n0:n1], scenery.lights_width[n0:n1],
                scenery.tex_line[n0:n1], scenery.line_tex_starts[n0:n1],
                scenery.line_tex_widths[n0:n1],
                scenery.n_dynamic, t0, T)
            baked[n0:n1, t0:t0 + T] = np.asarray(vals)
    # Padding texels (beyond each env's true width) stay at 1.
    mask = np.arange(Tmax)[None] < np.asarray(scenery.tex_width)[:, None]
    baked = np.where(mask, baked, 1.).astype(np.float32)
    return scenery.replace(baked=jnp.asarray(baked))


def dynamic_texel_intensity(scenery, lines_now, k_max=None):
    """Live illumination of the dynamic (agent-model) texels, given the current
    drawn line array. Returns (N, n_dynamic_texels).

    :param k_max: static bound on the per-env light count (e.g. the true max
        computed at env build); slices dead padded light slots off the
        (N, P, K) streams. ``None`` keeps the full padded axis.
    """
    nd = scenery.n_dynamic
    return dynamic_texel_intensity_parts(
        scenery, lines_now[:, :nd], lines_now[:, nd:], k_max=k_max)


def dynamic_texel_intensity_parts(scenery, dyn_lines, walls, k_max=None):
    """:func:`dynamic_texel_intensity` with the line array pre-split into its
    dynamic head (``(N, n_dynamic, 2, 2)``, this frame's drawn agent models —
    :func:`megastep_tpu.ops.render.draw_dynamic`) and the static walls
    (``scenery.lines[:, n_dynamic:]``, which :func:`...render.draw` never
    touches). Lets in-kernel-draw callers re-bake without materializing the
    full drawn line array."""
    T = scenery.n_dynamic_texels
    nd = scenery.n_dynamic
    # Dynamic texels live on the dynamic (agent-model) lines, which head the
    # line array — the lookup never needs the wall rows.
    C = texel_points(dyn_lines, scenery.tex_line, scenery.line_tex_starts,
                     scenery.line_tex_widths, 0, T, l_max=nd)
    # Only static lines occlude — slice them off the front instead of masking
    # (halves the (N, P, K, L) occlusion stream).
    lights = scenery.lights if k_max is None else scenery.lights[:, :k_max]
    return intensity_at(C, walls, scenery.lines_width - nd, 0,
                        lights, scenery.lights_width)
