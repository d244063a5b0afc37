"""Per-host environment construction for multi-host meshes.

SURVEY §7 step 10 / the reference's ``rebar/processes.py:18-70`` role: at the
64k-env / 4-host deliverable, a global build would make EVERY host compile-build
the entire padded scenery. Here each host builds only its own env slice —
geometry → textures → bake for ``n_envs / n_processes`` envs — and the shards
are assembled into global sharded ``jax.Array``s with
``jax.make_array_from_process_local_data``. The only global work per host is
:func:`megastep_tpu.scene.padded_sizes` over the geometry *list* (cheap numpy),
which guarantees all shards agree on padded shapes.
"""
import numpy as np
import jax

from .. import scene
from .mesh import (_ENV_SHARDED_LEAF_NAMES, _REPLICATED_LEAF_NAMES,
                   env_sharding, replicated)

__all__ = ['process_slice', 'assemble_env', 'sharded_explorer',
           'sharded_deathmatch']


def process_slice(n_envs):
    """This process's contiguous env range ``(lo, hi)`` — mesh device order is
    process-grouped, so an even split by process index matches the env-axis
    sharding layout."""
    procs = jax.process_count()
    assert n_envs % procs == 0, (n_envs, procs)
    n_local = n_envs // procs
    lo = jax.process_index() * n_local
    return lo, lo + n_local


def assemble_env(local_env, m):
    """Assembles per-host env shards into one global sharded env pytree.

    Every leaf whose leading dim is the local env count becomes a global
    env-sharded ``jax.Array`` built from this process's data; everything else
    (the shared agent model, action tables) is replicated. The env object's
    sizes (``n_envs`` etc.) derive from array shapes, so the assembled env is
    globally sized automatically.
    """
    # Both batch axes shard: the scene axis (core.n_envs) and, for agent-as-env
    # layouts (Deathmatch), the expanded agent-env axis (n_envs = scenes * A).
    n_locals = {local_env.n_envs}
    if hasattr(local_env, 'core'):
        n_locals.add(local_env.core.n_envs)
    env_sh = env_sharding(m)
    rep_sh = replicated(m)

    def rule(path, x):
        if not hasattr(x, 'shape'):
            return x
        names = {getattr(k, 'name', getattr(k, 'key', None)) for k in path}
        x = np.asarray(x)
        if names & set(_ENV_SHARDED_LEAF_NAMES):
            # Pre-grouped observe inputs: dim 0 is local_envs / n_groups,
            # shard-major (ops.fused.shard_group_rows), env-sharded by name.
            return jax.make_array_from_process_local_data(env_sh, x)
        if not (names & set(_REPLICATED_LEAF_NAMES)) and x.ndim >= 1 \
                and x.shape[0] in n_locals:
            return jax.make_array_from_process_local_data(env_sh, x)
        return jax.make_array_from_process_local_data(rep_sh, x)

    return jax.tree_util.tree_map_with_path(rule, local_env)


def _global_spec(geometries, n_agents, m, obs_groups, default_groups,
                 shard_axis='env'):
    """The striped global scene order and the per-shard-LOCAL group spec,
    both computed from the GLOBAL geometry list — cheap numpy every host runs
    identically, so all processes compile ONE SPMD program while each builds
    only its own scenery slice."""
    n_shards = m.shape[shard_axis]
    order = scene.striped_order(geometries, n_agents, n_shards)
    ordered = [geometries[i] for i in order]
    G = default_groups if obs_groups is None else obs_groups
    from ..ops import fused
    lw, tw = scene.size_widths(ordered, n_agents)
    spec = fused.sharded_size_groups(lw, tw, n_shards, n_groups=G)
    return order, ordered, spec


def sharded_explorer(n_envs, m, geometries, seed=0, **kwargs):
    """Builds an Explorer with per-host scenery construction and assembles it
    over the mesh. ``geometries`` is the *global* list (length ``n_envs``); each
    host compiles only its slice, padded to the global maxima.

    The scene order is the global STRIPED sort (``scene.striped_order``) and
    the size-bucket spec is computed from the global list
    (:func:`_global_spec`), so every host builds to the same per-shard-local
    buckets and the fused observe runs under ``shard_map`` with bucketing
    intact (round-4 meshes forfeited the bucketing lever via ``obs_groups=1``).

    :return: the globally-sharded Explorer.
    """
    from ..envs import Explorer
    assert len(geometries) == n_envs
    pad = scene.padded_sizes(geometries, n_agents=1)
    order, ordered, spec = _global_spec(
        geometries, 1, m, kwargs.pop('obs_groups', None), default_groups=4)
    lo, hi = process_slice(n_envs)
    random = np.random.RandomState(seed + jax.process_index())
    local = Explorer(hi - lo, geometries=ordered[lo:hi], pad_to=pad,
                     random=random, sort_scenes=False, obs_group_spec=spec,
                     shard_mesh=m, **kwargs)
    local.scene_order = order  # the global caller-list -> env-axis permutation
    return assemble_env(local, m)


def sharded_deathmatch(n_envs, m, geometries, n_agents=4, seed=0, **kwargs):
    """Builds a Deathmatch with per-host scenery construction and assembles it
    over the mesh. ``geometries`` is the *global* scene list (length
    ``n_envs // n_agents``); each host compiles only its scene slice, padded to
    the global maxima. Scene order and buckets as in :func:`sharded_explorer`.

    :return: the globally-sharded Deathmatch.
    """
    from ..envs import Deathmatch
    n_scenes = n_envs // n_agents
    assert len(geometries) == n_scenes, (len(geometries), n_scenes)
    pad = scene.padded_sizes(geometries, n_agents=n_agents)
    order, ordered, spec = _global_spec(
        geometries, n_agents, m, kwargs.pop('obs_groups', None),
        default_groups=16)
    lo, hi = process_slice(n_scenes)
    random = np.random.RandomState(seed + jax.process_index())
    local = Deathmatch((hi - lo) * n_agents, n_agents=n_agents,
                       geometries=ordered[lo:hi], pad_to=pad, random=random,
                       sort_scenes=False, obs_group_spec=spec, shard_mesh=m,
                       **kwargs)
    local.scene_order = order  # the global caller-list -> env-axis permutation
    return assemble_env(local, m)
