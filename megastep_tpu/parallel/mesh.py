"""Device meshes and sharded training steps.

Parallelism layout (SURVEY.md §2e): the one strategy that matters for this engine is
**env-batch data parallelism** — thousands of envs stepped in lockstep, sharded over
every chip. Params and optimizer state are replicated; each chip steps its env shard
(physics + raycast are embarrassingly parallel over envs) and the learner's gradient
all-reduce is the only per-step collective, riding ICI. This replaces the
reference's ``DDP2`` gradient sync (``rebar/processes.py:39-70``).

Build envs for a multi-chip mesh with ``shard_mesh=the mesh``: the fused
observe then runs under ``jax.shard_map`` (a GSPMD-partitioned ``pallas_call``
would all-gather its env-sharded operands — see
:func:`megastep_tpu.ops.fused.observe_grouped`) with per-shard-LOCAL size
buckets, so multi-device runs keep the bucketing lever. The learner's
minibatching likewise goes shard-local (:func:`make_train_step`'s
``shard_mesh``): the single-chip path's global random env gather would
all-gather the whole rollout chunk every minibatch.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..arrdict import arrdict

ENV_AXIS = 'env'


def mesh(n_devices=None, devices=None, axis=ENV_AXIS):
    """A 1-D device mesh over the env-batch axis.

    :param n_devices: how many devices to use (default: all).
    :param devices: explicit device list (overrides n_devices).
    """
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.array(devices), (axis,))


def env_sharding(m, axis=ENV_AXIS):
    """NamedSharding that splits leaf axis 0 (the env axis) over the mesh."""
    return NamedSharding(m, P(axis))


def replicated(m):
    """NamedSharding that replicates a leaf on every device."""
    return NamedSharding(m, P())


def _tree_with(tree, sharding):
    return jax.tree_util.tree_map(lambda _: sharding, tree)


def shard_carry(carry, m):
    """Sharding tree for the training carry: params/opt replicated; env state,
    world, and recurrent state sharded over the env axis (all are batch-first)."""
    return arrdict(
        params=_tree_with(carry.params, replicated(m)),
        opt_state=_tree_with(carry.opt_state, replicated(m)),
        env_state=_tree_with(carry.env_state, env_sharding(m)),
        world=_tree_with(carry.world, env_sharding(m)),
        agent_state=_tree_with(carry.agent_state, env_sharding(m)))


# Env-pytree leaves that are replicated tables regardless of their leading dim:
# the shared agent model octagon and the movement-system action sets. Matching by
# path (not by a coincidental dim-0 == n_envs) keeps e.g. a (7, 2) action table at
# n_envs=7 from being silently env-sharded.
_REPLICATED_LEAF_NAMES = ('model', '_actionset')

# Env-pytree leaves that are env-sharded regardless of their leading dim: the
# pre-grouped fused-observe inputs (per-group arrays have dim 0 == n_envs / G,
# laid out shard-major by ops.fused.shard_group_rows so an env sharding hands
# each device its own group block).
_ENV_SHARDED_LEAF_NAMES = ('_table8', '_lines_static', '_attrs_static')


def shard_env(env, m):
    """Sharding tree for an env pytree: scenery/spawn-table leaves (leading dim ==
    n_envs) and the pre-grouped observe inputs split over the env axis,
    everything else (action tables, the shared agent model) replicated."""
    ns = {env.n_envs}
    if hasattr(env, 'core'):
        ns.add(env.core.n_envs)  # agent-as-env layouts (Deathmatch) scene-shard

    def rule(path, x):
        names = {getattr(k, 'name', getattr(k, 'key', None)) for k in path}
        if names & set(_REPLICATED_LEAF_NAMES):
            return replicated(m)
        if names & set(_ENV_SHARDED_LEAF_NAMES):
            return env_sharding(m)
        if hasattr(x, 'shape') and x.ndim >= 1 and x.shape[0] in ns:
            return env_sharding(m)
        return replicated(m)
    return jax.tree_util.tree_map_with_path(rule, env)


def place_env(env, m):
    """Places an env's arrays onto the mesh with the standard layout."""
    return jax.tree_util.tree_map(jax.device_put, env, shard_env(env, m))


def place_carry(carry, m):
    """Places an (unsharded) carry onto the mesh with the standard layout."""
    shardings = shard_carry(carry, m)
    return jax.tree_util.tree_map(jax.device_put, carry, shardings)


#: Collectives that indicate GSPMD resharded an operand (vs the learner's
#: expected gradient all-reduce).
_COLLECTIVES = ('all-gather', 'all-to-all', 'collective-permute', 'all-reduce')


def resharding_collectives(compiled, allow=('all-reduce',)):
    """Collective op families present in a compiled program's HLO, minus the
    allowed ones — an empty list means every env-sharded operand stayed
    chip-local. The production hazard this guards: ``pallas_call`` lowers to a
    custom call whose sharding GSPMD treats conservatively, silently
    all-gathering the env-sharded lines/shade tables onto every device unless
    the kernel runs under ``shard_map``. ``all-reduce`` is allowed by default
    (the gradient sync — the one collective env-batch DP *should* have).

    :param compiled: a jitted fn's ``.lower(...).compile()`` result, or its
        ``as_text()`` string.
    """
    txt = compiled if isinstance(compiled, str) else compiled.as_text()
    return [op for op in _COLLECTIVES if op not in allow and op in txt]


def make_sharded_train_step(env, agent, opt, m, donate=True, **kwargs):
    """Jits the one-chunk training step over a device mesh.

    The returned step is ``step(env, carry, key)`` (envs are pytrees and ride
    through jit as arguments), with in/out shardings pinned: the env batch —
    including the padded scenery — stays sharded chip-local end-to-end
    (observations never leave their device) and XLA inserts a single gradient
    all-reduce per minibatch.

    :param donate: donate the carry buffers (halves peak memory on real chips).
    """
    from ..demo.train import make_train_step

    # shard_mesh: shard-local learner minibatching (the global random env
    # gather would all-gather the rollout chunk; see make_train_step).
    step = make_train_step(env, agent, opt, shard_mesh=m, **kwargs)

    def compile_for(carry):
        sh = shard_carry(carry, m)
        return jax.jit(
            step,
            in_shardings=(shard_env(env, m), sh, replicated(m)),
            donate_argnums=(1,) if donate else ())

    return compile_for


def init_sharded(env, agent, opt, key, m, **kwargs):
    """Initializes a carry and places env + carry on the mesh. Returns
    ``(env, carry, step_fn)`` ready to run as ``step_fn(env, carry, key)``.
    ``kwargs`` (buffer_size, batch_size, ...) reach ``make_train_step``."""
    from ..demo.train import init_carry
    carry = init_carry(env, agent, opt, key)
    carry = place_carry(carry, m)
    env = place_env(env, m)
    step = make_sharded_train_step(env, agent, opt, m, **kwargs)(carry)
    return env, carry, step
