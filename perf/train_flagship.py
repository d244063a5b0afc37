"""The reference flagship train config, sustained on one TPU chip.

Reference: 8,192 Explorer envs, 32-step buffer, 16,384 batch, 256-wide LSTM,
Adam(3e-4, amsgrad) behind a norm-100 clip (``megastep/demo/__init__.py:109-116``).
Runs ``--chunks`` training chunks and reports sustained env-steps/s (actor+learner)
and the reward trend. Usage::

    python perf/train_flagship.py --chunks 200
    python perf/train_flagship.py --kind deathmatch --envs 4096 --batch 8192 \
        --chunks 100   # the PERF.md Deathmatch training demo (agent-steps/s)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--chunks', type=int, default=200)
    p.add_argument('--envs', type=int, default=8 * 1024)
    p.add_argument('--buffer', type=int, default=32)
    p.add_argument('--batch', type=int, default=16 * 1024)
    p.add_argument('--width', type=int, default=256)
    p.add_argument('--kind', choices=['explorer', 'deathmatch'],
                   default='explorer')
    p.add_argument('--draw-fused', action='store_true',
                   help='deathmatch: in-kernel agent-model draw (bit-exact)')
    args = p.parse_args()

    from megastep_tpu import floorplans
    from megastep_tpu.envs import Deathmatch, Explorer
    from megastep_tpu.models import Agent
    from megastep_tpu.demo.train import init_carry, make_train_step, optimizer

    if args.kind == 'deathmatch':
        n_scenes = max(args.envs // 4, 1)
        geoms = floorplans.sample(min(n_scenes, 512))
        geoms = [geoms[i % len(geoms)] for i in range(n_scenes)]
        env = Deathmatch(args.envs, n_agents=4, geometries=geoms,
                         draw_fused=args.draw_fused)
    else:
        geoms = floorplans.sample(min(args.envs, 512))
        geoms = [geoms[i % len(geoms)] for i in range(args.envs)]
        env = Explorer(args.envs, geometries=geoms)
    agent = Agent(env.obs_space, env.action_space, width=args.width)
    opt = optimizer()

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    carry = init_carry(env, agent, opt, key)
    step = jax.jit(make_train_step(env, agent, opt, buffer_size=args.buffer,
                                   batch_size=args.batch))
    key, k = jax.random.split(key)
    carry, metrics = step(env, carry, k)
    jax.block_until_ready(metrics['loss'])
    print(f'compile+first chunk: {time.perf_counter() - t0:.1f}s', flush=True)

    rewards, t0 = [], time.perf_counter()
    for i in range(args.chunks):
        key, k = jax.random.split(key)
        carry, metrics = step(env, carry, k)
        if i % 10 == 9:
            jax.block_until_ready(metrics['loss'])
            dt = time.perf_counter() - t0
            sps = args.envs * args.buffer * (i + 1) / dt
            r = float(metrics['traj_reward'])
            rewards.append(r)
            print(f'chunk {i + 1}: {sps:,.0f} env-steps/s sustained, '
                  f'traj_reward {r:.2f}, kl {float(metrics["kl_div"]):.4f}',
                  flush=True)
    jax.block_until_ready(metrics['loss'])
    dt = time.perf_counter() - t0
    print(f'FINAL: {args.envs * args.buffer * args.chunks / dt:,.0f} env-steps/s '
          f'over {args.chunks} chunks; reward first→last: '
          f'{rewards[0]:.2f} → {np.mean(rewards[-3:]):.2f}')


if __name__ == '__main__':
    main()
