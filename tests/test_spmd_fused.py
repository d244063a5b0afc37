"""The PRODUCTION fused-observe path under multi-device SPMD.

Round-4 gap (VERDICT): every multi-device artifact exercised the split jnp
pipeline because ``use_fused`` defaults off on CPU — so the one program that
ships at scale (the Pallas kernel over env-sharded operands) had never run
under sharding, and ``pallas_call`` is a custom call whose GSPMD partitioning
can silently all-gather the env-sharded lines/tables onto every device. These
tests pin the fix on the virtual 8-device mesh (kernel in interpret mode):

  * ``observe_grouped(shard_mesh=...)`` runs the kernel under ``shard_map``
    with per-shard-LOCAL size buckets — bit-equal to a per-shard python loop,
    and indices exactly equal to the ungrouped full kernel;
  * the compiled HLO of the sharded observe contains NO collectives at all,
    and the full sharded train step contains nothing beyond the gradient
    all-reduce (no all-gather / all-to-all / collective-permute);
  * a fused Explorer built for the mesh steps end-to-end with rewards/seen
    sets exactly matching an identically-ordered unsharded env.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from megastep_tpu import core, scene, toys, floorplans
from megastep_tpu.arrdict import arrdict
from megastep_tpu.ops import fused, render
import importlib

pmesh = importlib.import_module('megastep_tpu.parallel.mesh')

N_DEV = 8


def _mesh():
    return Mesh(np.array(jax.devices()[:N_DEV]), ('env',))


def _mixed_geoms(n):
    base = floorplans.sample(max(n // 2, 1)) + \
        [toys.box() if i % 2 else toys.column() for i in range(n - n // 2)]
    return base[:n]


def _scenery_setup(n_envs, n_shards, seed=0):
    geoms = _mixed_geoms(n_envs)
    order = scene.striped_order(geoms, 1, n_shards)
    geoms = [geoms[i] for i in order]
    scn = scene.scenery(geoms, n_agents=1, random=np.random.RandomState(3))
    c = core.Core(scn, res=64, fov=130)
    agents = c.init_agents()
    key = jax.random.PRNGKey(seed)
    agents['positions'] = 2.5 + 2 * jax.random.uniform(key, agents.positions.shape)
    agents['angles'] = jax.random.uniform(
        jax.random.fold_in(key, 1), agents.angles.shape, minval=-180, maxval=180)
    return scn, c, agents


def test_sharded_observe_bit_equal_and_collective_free():
    m = _mesh()
    n_envs = 32
    n_local = n_envs // N_DEV
    scn, c, agents = _scenery_setup(n_envs, N_DEV)

    lines_now = render.draw(scn, agents)
    attrs = fused.line_attrs(lines_now, scn)
    table = fused.split_table8(fused.pack_table8(scn))
    groups = fused.sharded_size_groups(scn.lines_width, scn.tex_width, N_DEV,
                                       n_groups=2, gran=1)
    assert len(groups) == 2 and groups[-1][1] == n_local
    rows = fused.shard_group_rows(groups, N_DEV, n_local)
    tg = fused.group_tables(groups, table, rows=rows)
    lg, ag = fused.group_lines(groups, lines_now, attrs, rows=rows)
    B = scn.baked.shape[1] // fused.LO_WIDTH
    kw = dict(want_seen=True, seen_blocks=B, interpret=True)
    args = (scn.lines_width, agents.angles, agents.positions, c.res,
            c.half_screen_width, c.agent_radius)

    got = fused.observe_grouped(groups, lg, ag, tg, *args, shard_mesh=m, **kw)

    # Reference 1: exactly what each device computes, as a python loop over
    # shards — must be bit-identical (same shapes -> same compiled programs).
    per_shard = []
    for s in range(N_DEV):
        lo = slice(s * n_local, (s + 1) * n_local)
        tg_s = tuple(t[s * (g1 - g0):(s + 1) * (g1 - g0)]
                     for t, (g0, g1, _, _) in zip(tg, groups))
        lg_s = tuple(t[s * (g1 - g0):(s + 1) * (g1 - g0)]
                     for t, (g0, g1, _, _) in zip(lg, groups))
        ag_s = tuple(t[s * (g1 - g0):(s + 1) * (g1 - g0)]
                     for t, (g0, g1, _, _) in zip(ag, groups))
        per_shard.append(fused.observe_grouped(
            groups, lg_s, ag_s, tg_s, scn.lines_width[lo], agents.angles[lo],
            agents.positions[lo], c.res, c.half_screen_width, c.agent_radius,
            **kw))
    want = arrdict({k: jnp.concatenate([o[k] for o in per_shard])
                    for k in got})
    for k in got:
        np.testing.assert_array_equal(np.asarray(want[k]), np.asarray(got[k]),
                                      err_msg=k)

    # Reference 2: the ungrouped full kernel — indices exact (catches wrong
    # row layouts/group sizes); floats to the documented grouped-drift.
    full = fused.observe(lines_now, attrs, table, *args, want_seen=True,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(full.indices),
                                  np.asarray(got.indices))
    np.testing.assert_allclose(np.asarray(full.screen), np.asarray(got.screen),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(full.seen_counts > 0),
                                  np.asarray(got.seen_counts > 0))

    # The compiled sharded program must contain NO collectives: the kernel and
    # its operands are chip-local end to end.
    sh = NamedSharding(m, P('env'))
    operands = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh),
        (lg, ag, tg, scn.lines_width, agents.angles, agents.positions))

    def observe_fn(lg, ag, tg, lw, ang, pos):
        return fused.observe_grouped(groups, lg, ag, tg, lw, ang, pos, c.res,
                                     c.half_screen_width, c.agent_radius,
                                     shard_mesh=m, **kw)

    compiled = jax.jit(observe_fn).lower(*operands).compile()
    assert pmesh.resharding_collectives(compiled, allow=()) == []


def _explorer_pair(n_envs, obs_spec, m):
    """A mesh-built Explorer and an identically-ordered unsharded one."""
    from megastep_tpu.envs import Explorer
    geoms = _mixed_geoms(n_envs)
    order = scene.striped_order(geoms, 1, N_DEV)
    ordered = [geoms[i] for i in order]
    kw = dict(res=64, subsample=1, fused=True, sort_scenes=False,
              random=np.random.RandomState(11))
    sharded = Explorer(n_envs, geometries=ordered, shard_mesh=m,
                       obs_group_spec=obs_spec, **kw)
    kw['random'] = np.random.RandomState(11)
    plain = Explorer(n_envs, geometries=ordered, obs_groups=1, **kw)
    return sharded, plain


def test_sharded_explorer_steps_match_unsharded():
    m = _mesh()
    n_envs = 16
    geoms = _mixed_geoms(n_envs)
    order = scene.striped_order(geoms, 1, N_DEV)
    lw, tw = scene.size_widths([geoms[i] for i in order], 1)
    spec = fused.sharded_size_groups(lw, tw, N_DEV, n_groups=2, gran=1)
    sharded, plain = _explorer_pair(n_envs, spec, m)
    assert len(sharded._groups) == 2
    np.testing.assert_array_equal(sharded.scene_order, plain.scene_order)

    env_sh = pmesh.place_env(sharded, m)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(env, key):
        state, world = env.reset(key)
        for i in range(2):
            k = jax.random.fold_in(key, i)
            actions = jax.random.randint(k, (env.n_envs, 1), 0, 7)
            state, world = env.step(state, arrdict(actions=actions), k)
        return state, world

    state_s, world_s = run(env_sh, key)
    state_p, world_p = run(plain, key)

    # Seen sets and rewards ride the kernel's EXACT indices -> exact equality.
    np.testing.assert_array_equal(np.asarray(state_s.seen),
                                  np.asarray(state_p.seen))
    np.testing.assert_array_equal(np.asarray(state_s.potential),
                                  np.asarray(state_p.potential))
    np.testing.assert_array_equal(np.asarray(world_s.reward),
                                  np.asarray(world_p.reward))
    np.testing.assert_allclose(np.asarray(world_s.obs.rgb),
                               np.asarray(world_p.obs.rgb),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(world_s.obs.d),
                               np.asarray(world_p.obs.d),
                               rtol=1e-6, atol=1e-7)

    # Actor-only program over the mesh: zero collectives.
    compiled = run.lower(env_sh, key).compile()
    assert pmesh.resharding_collectives(compiled, allow=()) == []


def test_sharded_train_step_fused_hlo_clean():
    """The FULL sharded train step (rollout with the fused kernel + shard-local
    minibatched PPO) compiles with no resharding collectives — only the
    gradient all-reduce — and trains re-entrantly with finite metrics."""
    from megastep_tpu.models import Agent
    from megastep_tpu.demo.train import init_carry, make_train_step, optimizer

    m = _mesh()
    n_envs = 16
    geoms = _mixed_geoms(n_envs)
    order = scene.striped_order(geoms, 1, N_DEV)
    lw, tw = scene.size_widths([geoms[i] for i in order], 1)
    spec = fused.sharded_size_groups(lw, tw, N_DEV, n_groups=2, gran=1)
    env, _ = _explorer_pair(n_envs, spec, m)
    agent = Agent(env.obs_space, env.action_space, width=32)
    opt = optimizer()

    key = jax.random.PRNGKey(0)
    carry = init_carry(env, agent, opt, key)
    carry = pmesh.place_carry(carry, m)
    env = pmesh.place_env(env, m)
    step = make_train_step(env, agent, opt, buffer_size=3,
                           batch_size=3 * n_envs // 2, shard_mesh=m)
    jitted = jax.jit(step, in_shardings=(
        pmesh.shard_env(env, m), pmesh.shard_carry(carry, m),
        pmesh.replicated(m)))

    lowered = jitted.lower(env, carry, key)
    compiled = lowered.compile()
    txt = compiled.as_text()
    assert pmesh.resharding_collectives(txt) == []
    assert 'all-reduce' in txt  # the gradient sync is really in there

    carry, metrics = jitted(env, carry, jax.random.PRNGKey(1))
    carry, metrics = jitted(env, carry, jax.random.PRNGKey(2))
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), (k, v)
