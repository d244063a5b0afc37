"""Sharded checkpointing via orbax.

The scale-out counterpart of :mod:`megastep_tpu.rebar.storing` (which pickles small
host trees, reference ``rebar/storing.py``): orbax writes each shard from its owning
host, restores onto any mesh, and keeps the functional train state — params,
optimizer, env state, RNG — in one atomic step directory. Because everything in the
TPU design is an explicit pytree, full-fidelity resume is trivial where the
reference could only save model weights (SURVEY.md §5.4).
"""
from pathlib import Path

import jax


def _manager(directory, max_to_keep=3):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        Path(directory).absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True))


def save(directory, step, carry, max_to_keep=3):
    """Saves the full training carry (params, opt state, env state, recurrent
    state) at ``step``."""
    import orbax.checkpoint as ocp
    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(jax.tree_util.tree_map(lambda x: x, carry)))
    mgr.wait_until_finished()
    return mgr.latest_step()


def restore(directory, target, step=None):
    """Restores into the structure (and shardings) of ``target``. Returns the
    restored carry, or None when no checkpoint exists."""
    import orbax.checkpoint as ocp
    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        return None
    return mgr.restore(step, args=ocp.args.StandardRestore(target))


def latest_step(directory):
    mgr = _manager(directory)
    return mgr.latest_step()
