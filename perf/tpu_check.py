"""On-TPU equivalence check: the COMPILED fused kernel vs the split pipeline.

The CPU test suite pins the fused kernel in interpret mode; this script runs
the same comparison against real Mosaic on the chip (indices exact, values to
f32 ULPs, seen sets exact). Run: python perf/tpu_check.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def check(n_envs, n_agents, res, geom_kw, tag, presplit=True, grouped=False,
          patched=False, draw_mode=None):
    from megastep_tpu import core, floorplans, scene
    from megastep_tpu.ops import fused, render

    geoms = floorplans.sample(n_envs, **geom_kw)
    if grouped:
        geoms = scene.sort_by_size(geoms, n_agents)
    scn = scene.scenery(geoms, n_agents=n_agents,
                        random=np.random.RandomState(0))
    c = core.Core(scn, res=res, fov=130)
    agents = c.init_agents()
    key = jax.random.PRNGKey(42)
    agents['positions'] = 4. + 3 * jax.random.uniform(key, agents.positions.shape)
    agents['angles'] = jax.random.uniform(
        jax.random.fold_in(key, 1), agents.angles.shape, minval=-180, maxval=180)

    lines_now = render.draw(scn, agents)
    rc = render.raycast(lines_now, scn.lines_width, agents.angles,
                        agents.positions, res, c.half_screen_width,
                        c.agent_radius)
    screen = render.shade(scn, rc, scn.baked, method='onehot')

    kw = dict(want_seen=True)
    if patched:
        # Dynamic rows rewritten in-kernel from the per-frame patch: feed the
        # *current* baked values through the patch so outputs must still match
        # the split pipeline exactly.
        dyn = scn.baked[:, :scn.n_dynamic_texels]
        kw.update(table_patch=fused.pack_table8_patch(scn, dyn),
                  patch_rows=fused.dynamic_rows(scn.n_dynamic_texels,
                                                scn.baked.shape[1]))
        presplit = True
    table = fused.pack_table8(scn)
    if presplit:
        table = fused.split_table8(table)
    groups = (fused.size_groups(scn.lines_width, scn.tex_width, gran=8)
              if grouped else ())
    if draw_mode == 'kernel':
        # In-kernel draw: compiled Mosaic scalar trig must reproduce the
        # XLA draw's rotation bits (the same class of contract as the
        # ray-direction trig, but worth its own on-chip gate).
        lines_in = scn.lines
        attrs_in = fused.line_attrs(scn.lines, scn)
        kw.update(draw_model=scn.n_model_lines)
    elif draw_mode == 'skip':
        lines_in = scn.lines.at[:, :scn.n_dynamic].set(0.)
        attrs_in = fused.line_attrs(lines_in, scn)
        kw.update(skip_dyn=scn.n_dynamic)
    else:
        lines_in, attrs_in = lines_now, fused.line_attrs(lines_now, scn)
    out = fused.observe_grouped(
        groups, lines_in, attrs_in, table,
        scn.lines_width, agents.angles, agents.positions, res,
        c.half_screen_width, c.agent_radius, **kw)

    idx_match = np.array_equal(np.asarray(rc.indices), np.asarray(out.indices))
    d_err = np.nanmax(np.abs(np.where(np.isinf(np.asarray(rc.distances)), 0,
                                      np.asarray(rc.distances))
                             - np.where(np.isinf(np.asarray(out.distances)), 0,
                                        np.asarray(out.distances))))
    s_err = np.abs(np.asarray(screen)
                   - np.asarray(out.screen).transpose(0, 1, 3, 2)).max()

    # Seen set vs the split path's tex-index computation.
    N = rc.indices.shape[0]
    line = jnp.maximum(rc.indices.reshape(N, -1), 0)
    hit = rc.indices.reshape(N, -1) >= 0
    attrs = jnp.stack([scn.line_tex_starts, scn.line_tex_widths],
                      -1).astype(jnp.float32)
    sw = render.onehot_lookup(attrs, line)
    start, width = sw[..., 0].astype(jnp.int32), sw[..., 1].astype(jnp.int32)
    loc = jnp.where(hit, rc.locations.reshape(N, -1), 0.)
    ti = jnp.minimum(jnp.floor(width * loc), width - 1).astype(jnp.int32)
    tex = start + jnp.maximum(ti, 0)
    T = scn.baked.shape[1]
    seen_ref = np.asarray(render.onehot_any(tex, hit, T))
    seen_got = np.asarray(out.seen_counts[:, :T] > 0)
    seen_diff = int((seen_ref != seen_got).sum())

    print(f'{tag}: indices_exact={idx_match} max_dist_err={d_err:.2e} '
          f'max_screen_err={s_err:.2e} seen_mismatches={seen_diff}')
    ok = idx_match and d_err < 1e-3 and s_err < 1e-4 and seen_diff == 0
    if not ok:
        raise SystemExit(f'{tag}: MISMATCH')


def check_pool():
    """The production obs pooling (modules.pool_mean MXU dot path) vs the
    reshape-mean reference, on compiled XLA: the iota-built pooling matrix
    must select/average exactly (the on-chip analog of
    tests/test_modules.py::test_pool_mean_dot_matches_reduce)."""
    from megastep_tpu import modules
    key = jax.random.PRNGKey(7)
    errs = []
    for shape, s in (((64, 1, 3, 256), 4), ((64, 4, 512), 4), ((32, 1, 64), 8)):
        x = jax.random.uniform(jax.random.fold_in(key, s), shape)
        want = np.asarray(jax.jit(
            lambda x: modules.pool_mean(x, s, dot=False))(x))
        got = np.asarray(jax.jit(
            lambda x: modules.pool_mean(x, s, dot=True))(x))
        errs.append(np.abs(want - got).max())
    err = max(errs)
    print(f'pool-dot: max_err={err:.2e}')
    if err > 1e-6:
        raise SystemExit('pool-dot: MISMATCH')


if __name__ == '__main__':
    check_pool()
    check(256, 1, 256, {}, 'explorer-shape')
    # presplit=False exercises the in-kernel split + cross-agent scratch path.
    check(64, 4, 512, {}, 'deathmatch-shape', presplit=False)
    # Non-power-of-two, non-128-multiple res: lane padding + the ray-coordinate
    # op-order parity fix.
    check(128, 1, 192, {}, 'odd-res')
    check(64, 1, 256, dict(width=30., height=30., max_depth=9, stop=.02),
          'cubicasa-scale')
    # Size-bucketed observe (per-group L/B slicing) on compiled Mosaic.
    check(256, 1, 256, {}, 'grouped', grouped=True)
    # In-kernel dynamic-row patching (the Deathmatch re-bake path), grouped.
    check(64, 4, 512, {}, 'patched-grouped', grouped=True, patched=True)
    # In-kernel agent-model draw (Deathmatch draw_fused) on compiled Mosaic.
    check(64, 4, 512, {}, 'draw-in-kernel', draw_mode='kernel')
    # Explorer's skip-draw + sliced raycast (indices rebased) on compiled Mosaic.
    check(256, 1, 256, {}, 'skip-dyn', draw_mode='skip')
    print('ALL OK (compiled Mosaic kernel matches the split pipeline on TPU)')
