"""rebar: the experiment-support library.

Counterpart of the reference's standalone ``rebar`` package (``/root/reference/
rebar/``): containers, run-directory IO, append-only metric streams, logging,
checkpointing, process pools, video recording, FSM test environments, and
distributed plumbing — rebuilt for a JAX/TPU stack (device arrays instead of torch
tensors; ``jax.distributed`` + mesh utilities instead of NCCL/DDP).
"""
import importlib

from ..dotdict import dotdict

# The real arrdict *module* (the package root rebinds the name to the class).
arrdict = importlib.import_module('megastep_tpu.arrdict')

from . import paths, numpy, stats, storing, parallel, widgets, interrupting  # noqa: E402

__all__ = ['dotdict', 'arrdict', 'paths', 'numpy', 'stats', 'storing', 'parallel',
           'widgets', 'interrupting', 'logging', 'recording', 'fsm', 'plots',
           'queuing', 'processes', 'contextlib']
