"""Deathmatch step decomposition on chip: where do the milliseconds go?

Times each stage of the Deathmatch step independently under a ``lax.scan``
(amortizing the ~30 ms axon dispatch), with a live carry perturbation so XLA
cannot hoist the loop body:

- ``full``      — the production ``env.step`` (respawn + move + observe/shoot)
- ``observe``   — ``env._observe`` alone (rebake + kernel + epilogue)
- ``kernel``    — the fused observe kernel alone (static table, no patch)
- ``rebake``    — draw_dynamic + dynamic re-bake + table patch pack
- ``epilogue``  — downsample / shoot / obs assembly from a precomputed render
- ``physics``   — respawn + momentum movement alone

Scenes default to sampled floorplans — the same workload as
``bench.py --kind deathmatch`` — so the proportions reflect production line
and texel counts (the kernel's costs scale with both); ``--toy`` swaps in
toys.box() for a quick structural check. Decision input for the res-512
optimization queue (perf/EXPERIMENTS.md §4): whichever stage dominates after
the round's levers is the next target. Usage::

    python perf/deathmatch_stages.py --envs 4096 [--draw-fused] [--stages full,observe]
"""
import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def perturbed(agents, carry):
    return type(agents)(
        angles=agents.angles + carry, positions=agents.positions,
        angvelocity=agents.angvelocity, velocity=agents.velocity)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--envs', type=int, default=4096)
    p.add_argument('--steps', type=int, default=16)
    p.add_argument('--draw-fused', action='store_true')
    p.add_argument('--toy', action='store_true',
                   help='toys.box() scenes instead of sampled floorplans '
                        '(structural check only — toy line/texel counts do '
                        'not reflect the production kernel cost)')
    p.add_argument('--stages', default='full,observe,kernel,rebake,epilogue,physics')
    args = p.parse_args()

    from megastep_tpu import floorplans, modules, toys
    from megastep_tpu.envs.deathmatch import Deathmatch, collapse
    from megastep_tpu.ops import fused as fused_ops, render as render_ops
    from megastep_tpu.arrdict import arrdict

    n_agents = 4
    n_scenes = max(args.envs // n_agents, 1)
    if args.toy:
        geoms = [toys.box() for _ in range(n_scenes)]
    else:
        geoms = floorplans.sample(min(n_scenes, 512))
        geoms = [geoms[i % len(geoms)] for i in range(n_scenes)]
    env = Deathmatch(args.envs, geometries=geoms, draw_fused=args.draw_fused,
                     fused=True, random=np.random.RandomState(0))
    c = env.core
    scn = c.scenery
    key = jax.random.PRNGKey(0)
    state, _ = jax.jit(lambda e, k: e.reset(k))(env, key)
    agents, health, damage = state.agents, state.health, state.damage
    actions = jnp.zeros((env.n_envs, 1), jnp.int32)
    print(f'N={c.n_envs} A={c.n_agents} res={c.res} L={scn.lines.shape[1]} '
          f'T={scn.baked.shape[1]} draw_fused={env.draw_fused}')

    # Precomputed render for the epilogue stage. Stage inputs (out0, agents,
    # health, damage, actions) are threaded through the jitted scan as
    # ARGUMENTS — closing over device arrays would bake tens of MB of
    # full-res screens into the program as literal constants (the HTTP-413
    # failure mode through the axon compile tunnel; see bench.py).
    out0 = None
    if any(s.startswith('epi') for s in args.stages.split(',')):
        def render_once(e, ag):
            s_ = e.core.scenery
            if e.draw_fused:
                lines_in, attrs_in, dm = (e._lines_static, e._attrs_static,
                                          s_.n_model_lines)
            else:
                lines_in = s_.lines.at[:, :s_.n_dynamic].set(
                    render_ops.draw_dynamic(s_, ag))
                attrs_in = fused_ops.line_attrs(lines_in, s_)
                dm = 0
            return fused_ops.observe_grouped(
                e._groups, lines_in, attrs_in, e._table8,
                s_.lines_width, ag.angles, ag.positions, c.res,
                c.half_screen_width, c.agent_radius, want_seen=False,
                draw_model=dm, interpret=not modules.on_tpu())
        out0 = jax.jit(render_once)(env, agents)
        jax.block_until_ready(out0)
    inputs = arrdict(agents=agents, health=health, damage=damage,
                     actions=actions, matchings=state.matchings,
                     out0=out0 if out0 is not None else {})

    def full(env, inp, carry, _):
        st = arrdict(agents=perturbed(inp.agents, carry),
                     progress=inp.health * 0 + 1,
                     health=inp.health, damage=inp.damage,
                     matchings=inp.matchings)
        st2, world = env.step(st, arrdict(actions=inp.actions),
                              jax.random.PRNGKey(1))
        # Consume every output (obs included) so XLA cannot dead-code-eliminate
        # the parts of the step a real training loop would read.
        return carry + 1e-4, (world.reward.sum() + st2.health.sum()
                              + world.obs.rgb.mean() + world.obs.d.mean()
                              + world.obs.imu.sum())

    def observe(env, inp, carry, _):
        obs, h, d, m, r = env._observe(perturbed(inp.agents, carry),
                                       inp.health, inp.damage)
        return carry + 1e-4, obs.rgb.mean() + h.sum() + r.sum()

    def kernel(env, inp, carry, _):
        # Scenery arrays come off the env ARGUMENT (not the outer closure):
        # closure-captured device arrays bake into the program as constants —
        # HTTP 413 through the axon compile tunnel at 16k envs.
        s_ = env.core.scenery
        ag = perturbed(inp.agents, carry)
        kw = dict(draw_model=s_.n_model_lines) if env.draw_fused else {}
        if env.draw_fused:
            lines_in, attrs_in = env._lines_static, env._attrs_static
        else:
            lines_in = s_.lines.at[:, :s_.n_dynamic].set(
                render_ops.draw_dynamic(s_, ag))
            attrs_in = fused_ops.line_attrs(lines_in, s_)
        out = fused_ops.observe_grouped(
            env._groups, lines_in, attrs_in, env._table8,
            s_.lines_width, ag.angles, ag.positions, c.res,
            c.half_screen_width, c.agent_radius, want_seen=False,
            interpret=not modules.on_tpu(), **kw)
        return carry + 1e-4, out.screen.mean() + out.distances.min()

    def rebake(env, inp, carry, _):
        s_ = env.core.scenery
        ag = perturbed(inp.agents, carry)
        dyn_lines = render_ops.draw_dynamic(s_, ag)
        dyn = env._rebake(s_, dyn_lines)
        patch = fused_ops.pack_table8_patch(s_, dyn, splits=env._shade_splits)
        return carry + 1e-4, sum(p.sum() for p in jax.tree.leaves(patch))

    def epilogue(env, inp, carry, _):
        # Perturb EVERY consumed field of the precomputed render — screen,
        # distances, and indices each feed a separate consumer chain
        # (shade/obs, depth, _opponents), and any left loop-invariant would
        # let XLA hoist that chain out of the scan and under-time the stage.
        # Mirrors the production per-group epilogue flow (the mid-column
        # strided slice of the raw index rows, not a full downsample).
        izero = (carry * 0).astype(inp.out0.indices.dtype)
        out = arrdict({**inp.out0,
                       'screen': inp.out0.screen + carry,
                       'distances': inp.out0.distances + carry,
                       'indices': inp.out0.indices + izero})
        s = env._rgb.subsample
        res_ds = c.res // s
        r0 = s * (res_ds // 2 - 1) + s // 2
        mid = out.indices[..., r0:r0 + s + 1:s][:, :, None]
        opp = env._opponents(mid)
        h, d, m, hits = env._shoot(inp.agents, inp.health + carry,
                                   inp.damage, opp)
        rgb, dd = modules.fused_obs(out, s, c.agent_radius,
                                    env._depth.max_depth)
        return carry + 1e-4, rgb.mean() + dd.mean() + h.sum() + hits.sum()

    def physics(env, inp, carry, _):
        reset = (inp.health + carry) <= 0
        ag, h, d = env._respawn(perturbed(inp.agents, carry), inp.health,
                                inp.damage, reset, jax.random.PRNGKey(1))
        ag, progress = env._movement(ag, collapse(arrdict(actions=inp.actions),
                                                  c.n_agents))
        return carry + 1e-4, ag.positions.sum() + progress.sum() + h.sum()

    # Epilogue sub-stages (each re-perturbs only the fields it consumes, so
    # subtract nothing; compare against the epilogue total).
    def epi_obs(env, inp, carry, _):
        out = arrdict({**inp.out0,
                       'screen': inp.out0.screen + carry,
                       'distances': inp.out0.distances + carry})
        rgb, dd = modules.fused_obs(out, env._rgb.subsample, c.agent_radius,
                                    env._depth.max_depth)
        return carry + 1e-4, rgb.mean() + dd.mean()

    def epi_shoot(env, inp, carry, _):
        izero = (carry * 0).astype(inp.out0.indices.dtype)
        idx = inp.out0.indices + izero
        s = env._rgb.subsample
        res_ds = c.res // s
        r0 = s * (res_ds // 2 - 1) + s // 2
        opp = env._opponents(idx[..., r0:r0 + s + 1:s][:, :, None])
        h, d, m, hits = env._shoot(inp.agents, inp.health + carry,
                                   inp.damage, opp)
        return carry + 1e-4, h.sum() + hits.sum() + d.sum()

    stages = {f.__name__: f for f in (full, observe, kernel, rebake,
                                      epilogue, physics, epi_obs, epi_shoot)}
    results = {}
    for name in args.stages.split(','):
        fn = stages[name]

        @jax.jit
        def scan(env, inputs, c0):
            return jax.lax.scan(lambda carry, x: fn(env, inputs, carry, x),
                                c0, jnp.arange(args.steps))

        t0 = time.perf_counter()
        _, out = scan(env, inputs, jnp.zeros(()))
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
            _, out = scan(env, inputs, c0)
            float(out[-1])
            times.append((time.perf_counter() - t0) / args.steps)
        med = results[name] = float(np.median(times))
        print(f'{name}: {med * 1e3:.3f} ms/step '
              f'({env.n_envs / med:,.0f} agent-steps/s) '
              f'[first call {compile_t:.1f}s]')
    if 'full' in results:
        acc = sum(v for k, v in results.items()
                  if k in ('kernel', 'rebake', 'epilogue', 'physics'))
        # Stages overlap: kernel/rebake/physics each re-run draw_dynamic (and
        # kernel rebuilds line_attrs) in the default mode, so sum > full means
        # double-counted draw work, not missing coverage.
        print(f'stage sum {acc * 1e3:.3f} ms vs full {results["full"] * 1e3:.3f} ms '
              '(stages double-count draw_dynamic/line_attrs; sum > full expected)')


if __name__ == '__main__':
    main()
