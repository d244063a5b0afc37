"""Multi-chip scale-out: device meshes, sharded training, checkpoints.

The TPU-native replacement for the reference's NCCL/DDP plumbing
(``/root/reference/rebar/processes.py:18-70``): instead of one process per device
with explicit gradient all-reduce, the whole env batch and training step live in one
``jit`` program over a :func:`mesh`, with sharding annotations — XLA partitions the
program and inserts the ICI/DCN collectives (gradient psum, gather/scatter at
minibatch boundaries) itself.

See :func:`make_sharded_train_step` and the driver-facing ``dryrun_multichip`` in
``__graft_entry__.py``.
"""
from .mesh import mesh, env_sharding, replicated, shard_carry, make_sharded_train_step
from . import checkpoint

__all__ = ['mesh', 'env_sharding', 'replicated', 'shard_carry',
           'make_sharded_train_step', 'checkpoint']
