"""Microbenchmark: fused observe kernel vs the split XLA pipeline, on TPU.

Times the full per-step observe work (draw + raycast + shade + seen reduction)
inside a ``lax.scan`` (amortizing the ~30 ms axon dispatch), at bench-like
Explorer shapes. Usage::

    python perf/fused_bench.py --envs 4096 --res 256 --steps 32 [--env-block 8]
"""
import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--envs', type=int, default=4096)
    p.add_argument('--res', type=int, default=256)
    p.add_argument('--steps', type=int, default=32)
    p.add_argument('--agents', type=int, default=1)
    p.add_argument('--env-block', type=int, default=None)
    p.add_argument('--which', default='both', choices=['both', 'split', 'fused'])
    p.add_argument('--no-seen', action='store_true')
    p.add_argument('--shade-splits', type=int, default=3,
                   help='bf16 table components per shade lookup (3 = exact '
                        'f32). An MXU-share ablation: each component is one '
                        'bf16 MXU pass, so 3 -> 1 removes 2/3 of the shade '
                        'dot cost (output inexact — timing probe only).')
    p.add_argument('--fast-div', action='store_true',
                   help='reciprocal-multiply raycast (~1 ulp s/t drift)')
    p.add_argument('--draw-mode', default='xla',
                   choices=['xla', 'kernel', 'skip'],
                   help="'kernel' = in-kernel model draw (draw_model), "
                        "'skip' = static lines with the dynamic slots sliced "
                        "out (skip_dyn; single-agent only)")
    p.add_argument('--geom-size', type=float, default=None,
                   help='outer floorplan extent (m); ~22 gives cubicasa-scale '
                        '(200+ wall) scenes')
    p.add_argument('--geom-depth', type=int, default=4)
    args = p.parse_args()

    from megastep_tpu import core, floorplans, scene
    from megastep_tpu.ops import fused, render

    kw = {}
    if args.geom_size:
        kw = dict(width=args.geom_size, height=args.geom_size,
                  max_depth=args.geom_depth, stop=.02)
    geoms = floorplans.sample(min(args.envs, 512), **kw)
    geoms = [geoms[i % len(geoms)] for i in range(args.envs)]
    print('walls per scene:', min(len(g.walls) for g in geoms), '-',
          max(len(g.walls) for g in geoms))
    scn = scene.scenery(geoms, n_agents=args.agents)
    c = core.Core(scn, res=args.res, fov=130)
    agents = c.init_agents()
    key = jax.random.PRNGKey(0)
    agents['positions'] = 4. + 3 * jax.random.uniform(key, agents.positions.shape)
    agents['angles'] = jax.random.uniform(
        jax.random.fold_in(key, 1), agents.angles.shape, minval=-180, maxval=180)

    L = scn.lines.shape[1]
    T = scn.baked.shape[1]
    print(f'N={args.envs} A={args.agents} res={args.res} L={L} T={T}')

    table8 = fused.split_table8(fused.pack_table8(scn), splits=args.shade_splits)

    def split_step(scn, agents, carry, _):
        ag = type(agents)(angles=agents.angles + carry, positions=agents.positions,
                          angvelocity=agents.angvelocity, velocity=agents.velocity)
        lines_now = render.draw(scn, ag)
        rc = render.raycast(lines_now, scn.lines_width, ag.angles, ag.positions,
                            args.res, c.half_screen_width, c.agent_radius)
        screen = render.shade(scn, rc, scn.baked, method='onehot')
        N = rc.indices.shape[0]
        line = rc.indices.reshape(N, -1)
        hit = line >= 0
        line0 = jnp.maximum(line, 0)
        attrs = jnp.stack([scn.line_tex_starts, scn.line_tex_widths],
                          -1).astype(jnp.float32)
        sw = render.onehot_lookup(attrs, line0)
        start = sw[..., 0].astype(jnp.int32)
        width = sw[..., 1].astype(jnp.int32)
        loc = jnp.where(hit, rc.locations.reshape(N, -1), 0.)
        ti = jnp.minimum(jnp.floor(width * loc), width - 1).astype(jnp.int32)
        tex = start + jnp.maximum(ti, 0)
        seen = render.onehot_any(tex, hit, T)
        return carry + 1e-4, screen.mean() + seen.sum() + rc.distances.min()

    def fused_step(scn, agents, table8, carry, _):
        ag = type(agents)(angles=agents.angles + carry, positions=agents.positions,
                          angvelocity=agents.angvelocity, velocity=agents.velocity)
        kw = dict(want_seen=not args.no_seen, env_block=args.env_block)
        if args.draw_mode == 'kernel':
            lines_in = scn.lines
            attrs_in = fused.line_attrs(scn.lines, scn)
            kw.update(draw_model=scn.n_model_lines)
        elif args.draw_mode == 'skip':
            assert args.agents == 1, 'skip mode is single-agent only'
            lines_in, attrs_in = scn.lines, fused.line_attrs(scn.lines, scn)
            kw.update(skip_dyn=scn.n_dynamic)
        else:
            lines_in = render.draw(scn, ag)
            attrs_in = fused.line_attrs(lines_in, scn)
        out = fused.observe(
            lines_in, attrs_in, table8,
            scn.lines_width, ag.angles, ag.positions, args.res,
            c.half_screen_width, c.agent_radius,
            fast_div=args.fast_div, **kw)
        acc = out.screen.mean() + out.distances.min()
        if not args.no_seen:
            acc = acc + (out.seen_counts > 0).sum()
        return carry + 1e-4, acc

    def run(name, step_fn, *extra):
        @jax.jit
        def scan(scn, agents, c0, *extra):
            return jax.lax.scan(
                lambda carry, x: step_fn(scn, agents, *extra, carry, x),
                c0, jnp.arange(args.steps))

        t0 = time.perf_counter()
        _, out = scan(scn, agents, jnp.zeros(()), *extra)
        float(out[-1])
        compile_t = time.perf_counter() - t0
        times = []
        for rep in range(4):
            # Per-rep hygiene for the axon backend: vary the inputs (an
            # identical re-dispatch can be answered early), force a real
            # device->host fetch inside the timed region (block_until_ready
            # alone has been observed to signal ~40 ms early once after
            # warmup), and take the MEDIAN of the reps.
            c0 = jnp.float32(1e-5 * (rep + 1))
            t0 = time.perf_counter()
            _, out = scan(scn, agents, c0, *extra)
            float(out[-1])
            times.append((time.perf_counter() - t0) / args.steps)
        best = float(np.median(times))
        print(f'{name}: {best * 1e3:.3f} ms/step '
              f'({args.envs * args.agents / best:,.0f} agent-steps/s) '
              f'[first call {compile_t:.1f}s]')
        return best

    if args.which in ('both', 'split'):
        run('split', split_step)
    if args.which in ('both', 'fused'):
        run('fused', fused_step, table8)


if __name__ == '__main__':
    main()
