"""Worker for test_multihost: one process of an N-process CPU 'cluster'.

Each process builds ONLY its env shard's scenery (per-host construction,
SURVEY §7 step 10), assembles the global sharded env, and — in 'train' mode —
runs the FULL sharded training step (rollout + minibatched PPO with gradient
all-reduce) with donated carry buffers.

Invoked as: python multihost_worker.py <process_id> <n_processes> <port> <mode>
with mode one of 'step' (env construction + jitted rollout) or 'train'.
"""
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=2').strip()

import numpy as np
import jax
import jax.numpy as jnp


def check_step(n_envs):
    """Assembled global env steps under jit (construction-level check)."""
    from megastep_tpu import floorplans
    from megastep_tpu.arrdict import arrdict
    from megastep_tpu.parallel.host import sharded_explorer
    from megastep_tpu.parallel.mesh import mesh

    m = mesh()
    env = sharded_explorer(n_envs, m, floorplans.sample(n_envs),
                           res=64, subsample=4)
    assert env.n_envs == n_envs
    local = sum(s.data.shape[0]
                for s in env.core.scenery.lines.addressable_shards)
    assert local == n_envs // jax.process_count(), local

    key = jax.random.PRNGKey(0)
    state, world = env.reset(key)

    @jax.jit
    def run(env, carry, key):
        def body(carry, k):
            s, w = carry
            a = jax.random.randint(k, (n_envs, 1), 0, 7)
            s, w = env.step(s, arrdict(actions=a), k)
            return (s, w), w.reward.sum()
        return jax.lax.scan(body, carry, jax.random.split(key, 3))

    _, rsum = run(env, (state, world), key)
    return float(jax.device_get(rsum.sum()))


def check_train(n_envs):
    """Full sharded PPO train step on the cluster mesh, carry donated."""
    from megastep_tpu import floorplans
    from megastep_tpu.models import Agent
    from megastep_tpu.demo.train import init_carry, optimizer
    from megastep_tpu.parallel.host import sharded_explorer
    from megastep_tpu.parallel.mesh import (make_sharded_train_step, mesh,
                                            place_carry)

    m = mesh()
    # res 64 at subsample 1 = 64 obs px (the conv intake's minimum regime).
    env = sharded_explorer(n_envs, m, floorplans.sample(n_envs),
                           res=64, subsample=1)
    agent = Agent(env.obs_space, env.action_space, width=16)
    opt = optimizer()
    carry = place_carry(init_carry(env, agent, opt, jax.random.PRNGKey(0)), m)
    step = make_sharded_train_step(env, agent, opt, m, donate=True,
                                   buffer_size=3,
                                   batch_size=3 * n_envs // 2)(carry)
    loss = None
    for i in range(2):  # two steps: re-entrancy with the donated layout
        carry, metrics = step(env, carry, jax.random.PRNGKey(i + 1))
        jax.block_until_ready(metrics)
        for k, v in metrics.items():
            assert bool(jnp.isfinite(v)), (k, v)
        loss = float(jax.device_get(metrics['loss']))
    return loss


def main():
    pid, nprocs, port = map(int, sys.argv[1:4])
    mode = sys.argv[4]
    jax.distributed.initialize(f'localhost:{port}', num_processes=nprocs,
                               process_id=pid)
    assert jax.process_count() == nprocs
    out = {'step': check_step, 'train': check_train}[mode](4 * nprocs)
    assert np.isfinite(out)
    print(f'proc {pid}: OK {mode}={out:.3f}', flush=True)


if __name__ == '__main__':
    main()
