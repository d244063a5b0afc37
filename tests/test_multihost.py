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


@pytest.mark.slow
def test_two_process_sharded_env_construction():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), 'multihost_worker.py')
    env = {**os.environ,
           'PYTHONPATH': os.pathsep.join(
               [os.path.dirname(os.path.dirname(os.path.abspath(worker)))]
               + os.environ.get('PYTHONPATH', '').split(os.pathsep))}
    env.pop('PALLAS_AXON_POOL_IPS', None)  # keep CPU workers off the TPU tunnel
    procs = [subprocess.Popen([sys.executable, worker, str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail('multihost workers timed out:\n' + '\n'.join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {i} failed:\n{out}'
        assert f'proc {i}: OK' in out, out
