"""Multi-chip scaling harness.

The BASELINE target is ≥85% env-steps/s scaling efficiency from 1 host to 4 hosts
(64k envs, sharded PPO learner). This module measures it: run :func:`measure` on a
1-chip mesh and on the full mesh and compare steps/s — everything (env batch,
scenery, observations) is chip-local except the learner's gradient all-reduce, so
efficiency is expected to be collective-bound only.

On a single-chip box the multi-device path is still *validated* (not measured) on a
virtual CPU mesh — see ``__graft_entry__.dryrun_multichip``.

Usage on real hardware::

    python -m megastep_tpu.parallel.scaling --envs 65536 --devices 4

For multi-host, initialize the distributed runtime first
(:func:`megastep_tpu.rebar.processes.initialize`).
"""
import argparse
import time

import jax


def measure(n_envs, n_devices=None, width=256, buffer_size=32, steps=3,
            res=256, subsample=4, seed=0, batch_size=None):
    """Steps/s of the full sharded train step on an ``n_devices`` mesh.

    :param batch_size: learner minibatch size; default half the chunk. Pass
        the flagship 16,384 to compare 1-device-mesh numbers against
        ``perf/train_flagship.py`` at a matched config.
    :return: dict with steps_per_s and the mesh size.
    """
    from .. import floorplans
    from ..envs import Explorer
    from ..models import Agent
    from ..demo.train import init_carry, make_train_step, optimizer
    from .mesh import mesh, place_carry, place_env, replicated, shard_carry, shard_env

    if n_devices is None:
        n_devices = len(jax.devices())
    geoms = floorplans.sample(min(n_envs, 512))
    geoms = [geoms[i % len(geoms)] for i in range(n_envs)]
    m = mesh(n_devices)
    # shard_mesh: the fused observe runs under shard_map (per-shard-local size
    # buckets — multi-device runs keep the bucketing lever) and the learner's
    # minibatching goes shard-local (no chunk all-gather).
    env = Explorer(n_envs, geometries=geoms, res=res, subsample=subsample,
                   shard_mesh=m)
    agent = Agent(env.obs_space, env.action_space, width=width)
    opt = optimizer()

    key = jax.random.PRNGKey(seed)
    carry = init_carry(env, agent, opt, key)
    carry = place_carry(carry, m)
    env = place_env(env, m)

    step = make_train_step(env, agent, opt, buffer_size=buffer_size,
                           batch_size=batch_size or buffer_size * n_envs // 2,
                           shard_mesh=m)
    jitted = jax.jit(step, in_shardings=(shard_env(env, m), shard_carry(carry, m),
                                         replicated(m)))

    key, k = jax.random.split(key)
    carry, metrics = jitted(env, carry, k)
    jax.block_until_ready(metrics['loss'])

    best = 0.
    for i in range(steps):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        carry, metrics = jitted(env, carry, k)
        jax.block_until_ready(metrics['loss'])
        best = max(best, n_envs * buffer_size / (time.perf_counter() - t0))
    return dict(steps_per_s=best, n_devices=len(m.devices.flat), n_envs=n_envs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--envs', type=int, default=64 * 1024)
    p.add_argument('--devices', type=int, default=None)
    p.add_argument('--batch', type=int, default=None,
                   help='learner minibatch (default: half the chunk); pass '
                        '16384 for a train_flagship-matched comparison')
    args = p.parse_args()

    full = measure(args.envs, args.devices, batch_size=args.batch)
    n_dev = full['n_devices']
    if n_dev > 1:
        single = measure(args.envs // n_dev, 1,
                         batch_size=args.batch and args.batch // n_dev)
        eff = full['steps_per_s'] / (single['steps_per_s'] * n_dev)
        print(f"1 device: {single['steps_per_s']:,.0f} steps/s")
        print(f"{n_dev} devices: {full['steps_per_s']:,.0f} steps/s "
              f"-> scaling efficiency {eff:.1%}")
    else:
        print(f"1 device: {full['steps_per_s']:,.0f} steps/s")


if __name__ == '__main__':
    main()
