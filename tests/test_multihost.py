"""Multi-process env-shard construction: a 2-process CPU 'cluster' where each
process builds only its half of the scenery and the assembled global env steps
under jit (the per-host geometry sharding of SURVEY §7 step 10 — what the
reference's single-node NCCL init, ``rebar/processes.py:18-37``, never had)."""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _launch_cluster(nprocs, mode, timeout):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), 'multihost_worker.py')
    env = {**os.environ,
           'PYTHONPATH': os.pathsep.join(
               [os.path.dirname(os.path.dirname(os.path.abspath(worker)))]
               + os.environ.get('PYTHONPATH', '').split(os.pathsep))}
    env.pop('PALLAS_AXON_POOL_IPS', None)  # keep CPU workers off the TPU tunnel
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(nprocs), str(port), mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(nprocs)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail('multihost workers timed out:\n' + '\n'.join(outs))
    return procs, outs


def _run_cluster(nprocs, mode, timeout=900):
    procs, outs = _launch_cluster(nprocs, mode, timeout)
    if any(p.returncode != 0 for p in procs) and \
            any('DEADLINE_EXCEEDED' in o for o in outs):
        # Gloo's first-collective key-value exchange has a hard 30 s window;
        # on a loaded 1-core box, compile-time skew between workers can blow
        # it. One retry (warm compile cache -> near-zero skew) is legitimate.
        procs, outs = _launch_cluster(nprocs, mode, timeout)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {i} failed:\n{out}'
        assert f'proc {i}: OK' in out, out


@pytest.mark.slow
def test_two_process_sharded_env_construction():
    _run_cluster(2, 'step')


@pytest.mark.slow
def test_four_process_sharded_train_step():
    """The BASELINE 1→4-host deliverable's shape, virtually: 4 processes × 2
    devices, per-host scenery construction, full PPO train step with donated
    carries and an all-reduced gradient."""
    _run_cluster(4, 'train')


def test_sharded_deathmatch_builder():
    """`parallel.host.sharded_deathmatch` assembles a scene-sharded Deathmatch
    (single process: the host's slice is everything; the same code path feeds
    each host its own slice on a real cluster) and it steps under jit."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from megastep_tpu import floorplans
    from megastep_tpu.arrdict import arrdict
    from megastep_tpu.parallel.host import sharded_deathmatch
    from megastep_tpu.parallel.mesh import mesh

    n_scenes, A = 8, 4
    geoms = [floorplans.sample(2)[i % 2] for i in range(n_scenes)]
    m = mesh(8)
    env = sharded_deathmatch(n_scenes * A, m, geoms, n_agents=A,
                             res=128, subsample=2)
    assert env.n_envs == n_scenes * A
    # scene-sharded scenery and agent-env-sharded tables both split over devices
    assert {s.data.shape[0] for s in env.core.scenery.lines.addressable_shards} \
        == {n_scenes // 8}
    state, world = env.reset(jax.random.PRNGKey(0))

    @jax.jit
    def step(env, state, world, key):
        return env.step(state, arrdict(actions=jax.random.randint(
            key, (n_scenes * A, 1), 0, 7)), key)
    state, world = step(env, state, world, jax.random.PRNGKey(1))
    assert np.isfinite(float(jnp.sum(world.reward)))


def test_deathmatch_sharded_train_step():
    """Deathmatch's agent-as-env pytree (scene-major state, expanded world)
    runs the full sharded training step on the virtual 8-device mesh:
    scene-leading leaves shard by scene, agent-env-leading leaves by env, and
    the step produces finite metrics with the scenery genuinely split."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from megastep_tpu import floorplans
    from megastep_tpu.envs import Deathmatch
    from megastep_tpu.models import Agent
    from megastep_tpu.demo.train import init_carry, optimizer
    from megastep_tpu.parallel.mesh import (init_sharded, mesh)

    n_devices = 8
    n_scenes, A = 8, 4
    geoms = floorplans.sample(2)
    geoms = [geoms[i % 2] for i in range(n_scenes)]
    np.random.seed(0)
    # 64 obs px: the conv intake's 8/4-4/2-3/2 stack needs at least that.
    env = Deathmatch(n_scenes * A, n_agents=A, geometries=geoms, res=128,
                     subsample=2, obs_groups=1)
    agent = Agent(env.obs_space, env.action_space, width=32)
    m = mesh(n_devices)
    env, carry, step = init_sharded(
        env, agent, optimizer(), jax.random.PRNGKey(0), m,
        buffer_size=3, batch_size=3 * (n_scenes * A) // 2)

    carry, metrics = step(env, carry, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics)
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), (k, v)
    # scenery scene-sharded, not replicated
    shard_shapes = {s.data.shape[0]
                    for s in env.core.scenery.lines.addressable_shards}
    assert shard_shapes == {n_scenes // n_devices}, shard_shapes
    # agent-env-expanded world sharded over the env axis
    world_shards = {s.data.shape[0]
                    for s in carry.world.obs.rgb.addressable_shards}
    assert world_shards == {n_scenes * A // n_devices}, world_shards
