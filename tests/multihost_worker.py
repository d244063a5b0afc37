"""Worker for test_multihost: one process of a 2-process CPU 'cluster'.

Each process builds ONLY its env shard's scenery (per-host construction,
SURVEY §7 step 10), assembles the global sharded env, and steps it under jit.
Invoked as: python multihost_worker.py <process_id> <coordinator_port>
"""
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=4').strip()

import numpy as np
import jax
import jax.numpy as jnp


def main():
    pid, port = int(sys.argv[1]), int(sys.argv[2])
    jax.distributed.initialize(f'localhost:{port}', num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    from megastep_tpu import floorplans
    from megastep_tpu.arrdict import arrdict
    from megastep_tpu.parallel.host import sharded_explorer
    from megastep_tpu.parallel.mesh import mesh

    m = mesh()
    n_envs = 8
    geometries = floorplans.sample(n_envs)
    env = sharded_explorer(n_envs, m, geometries, res=64, subsample=4)

    # The assembled env is globally sized; only this host's shard was built here.
    assert env.n_envs == n_envs
    local_shards = env.core.scenery.lines.addressable_shards
    assert sum(s.data.shape[0] for s in local_shards) == n_envs // 2

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

    carry, rsum = run(env, (state, world), key)
    total = float(jax.device_get(rsum.sum()))
    assert np.isfinite(total)
    print(f'proc {pid}: OK total_reward={total:.3f}', flush=True)


if __name__ == '__main__':
    main()
