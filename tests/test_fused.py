"""Fused observe kernel (interpret mode on CPU) vs the split jnp pipeline:
raycast indices/distances, shaded screen, and seen-texel counts must agree."""
import numpy as np
import jax
import jax.numpy as jnp

from megastep_tpu import core, scene, toys, floorplans
from megastep_tpu.ops import fused, render


def _setup(n_envs=4, n_agents=2, res=64, seed=0):
    geoms = [toys.box() if i % 2 else toys.column() for i in range(n_envs)]
    scn = scene.scenery(geoms, n_agents=n_agents, random=np.random.RandomState(5))
    c = core.Core(scn, res=res, fov=130)
    agents = c.init_agents()
    key = jax.random.PRNGKey(seed)
    agents['positions'] = 2.5 + 2 * jax.random.uniform(key, agents.positions.shape)
    agents['angles'] = jax.random.uniform(
        jax.random.fold_in(key, 1), agents.angles.shape, minval=-180, maxval=180)
    return scn, c, agents


def _reference(scn, c, agents, lines_now):
    rc = render.raycast(lines_now, scn.lines_width, agents.angles,
                        agents.positions, c.res, c.half_screen_width,
                        c.agent_radius)
    rc['screen'] = render.shade(scn, rc, scn.baked, method='onehot')
    return rc


def _seen_reference(scn, rc):
    N = rc.indices.shape[0]
    line = rc.indices.reshape(N, -1)
    hit = line >= 0
    line0 = jnp.maximum(line, 0)
    start = jnp.take_along_axis(scn.line_tex_starts, line0, 1)
    width = jnp.take_along_axis(scn.line_tex_widths, line0, 1)
    loc = jnp.where(hit, rc.locations.reshape(N, -1), 0.)
    ti = jnp.minimum(jnp.floor(width * loc), width - 1).astype(jnp.int32)
    tex = start + jnp.maximum(ti, 0)
    T = scn.baked.shape[1]
    return jax.vmap(lambda s, t, h: s.at[t].max(h))(
        jnp.zeros((N, T), bool), tex, hit)


def test_fused_observe_matches_split_pipeline():
    scn, c, agents = _setup()
    lines_now = render.draw(scn, agents)
    want = _reference(scn, c, agents, lines_now)
    want_seen = _seen_reference(scn, want)

    got = fused.observe(
        lines_now, fused.line_attrs(lines_now, scn), fused.split_table8(fused.pack_table8(scn)),
        scn.lines_width, agents.angles, agents.positions, c.res,
        c.half_screen_width, c.agent_radius, want_seen=True, env_block=2,
        interpret=True)

    np.testing.assert_array_equal(np.asarray(want.indices), np.asarray(got.indices))
    np.testing.assert_allclose(np.asarray(want.distances), np.asarray(got.distances),
                               rtol=1e-5)
    # got.screen is (N, A, 3, R); the split pipeline gives (N, A, R, 3).
    np.testing.assert_allclose(np.asarray(want.screen),
                               np.asarray(got.screen).transpose(0, 1, 3, 2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(want_seen),
                                  np.asarray(got.seen_counts[:, :want_seen.shape[1]] > 0))


def test_fused_observe_floorplan_single_agent():
    geoms = floorplans.sample(3)
    scn = scene.scenery(geoms, n_agents=1, random=np.random.RandomState(2))
    c = core.Core(scn, res=64, fov=130)
    agents = c.init_agents()
    key = jax.random.PRNGKey(3)
    agents['positions'] = 4. + 3 * jax.random.uniform(key, agents.positions.shape)
    agents['angles'] = jax.random.uniform(
        jax.random.fold_in(key, 1), agents.angles.shape, minval=-180, maxval=180)
    lines_now = render.draw(scn, agents)
    want = _reference(scn, c, agents, lines_now)
    want_seen = _seen_reference(scn, want)

    got = fused.observe(
        lines_now, fused.line_attrs(lines_now, scn), fused.split_table8(fused.pack_table8(scn)),
        scn.lines_width, agents.angles, agents.positions, c.res,
        c.half_screen_width, c.agent_radius, want_seen=True, env_block=1,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(want.indices), np.asarray(got.indices))
    np.testing.assert_allclose(np.asarray(want.distances), np.asarray(got.distances),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(want.screen),
                               np.asarray(got.screen).transpose(0, 1, 3, 2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(want_seen),
                                  np.asarray(got.seen_counts[:, :want_seen.shape[1]] > 0))


def test_explorer_fused_matches_split():
    """Explorer with the fused observe kernel (interpret mode) steps identically
    to the split pipeline: same obs, reward, seen bookkeeping."""
    from megastep_tpu.envs import Explorer
    from megastep_tpu.arrdict import arrdict

    geoms = floorplans.sample(2)
    key = jax.random.PRNGKey(0)
    envs = []
    for f in (False, True):
        np.random.seed(7)  # identical scenery randomness for both builds
        envs.append(Explorer(2, geometries=geoms, res=64, subsample=4, fused=f))
    states, worlds = zip(*[e.reset(key) for e in envs])

    for t in range(3):
        k = jax.random.fold_in(key, t)
        actions = jax.random.randint(k, (2, 1), 0, 7)
        outs = [e.step(s, arrdict(actions=actions), k)
                for e, s in zip(envs, states)]
        states = [o[0] for o in outs]
        worlds = [o[1] for o in outs]

    np.testing.assert_array_equal(np.asarray(states[0].seen),
                                  np.asarray(states[1].seen))
    np.testing.assert_allclose(np.asarray(worlds[0].reward),
                               np.asarray(worlds[1].reward), atol=1e-6)
    np.testing.assert_allclose(np.asarray(worlds[0].obs.rgb),
                               np.asarray(worlds[1].obs.rgb), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(worlds[0].obs.d),
                               np.asarray(worlds[1].obs.d), rtol=1e-5, atol=1e-6)


def test_deathmatch_fused_matches_split():
    """Deathmatch with the fused observe kernel (interpret mode) steps
    identically to the split pipeline: same obs, shooting, health."""
    from megastep_tpu.envs import Deathmatch
    from megastep_tpu.arrdict import arrdict

    geoms = floorplans.sample(2)
    key = jax.random.PRNGKey(1)
    envs = []
    for f in (False, True):
        np.random.seed(11)
        envs.append(Deathmatch(8, n_agents=4, geometries=geoms, res=128,
                               subsample=4, fused=f))
    states, worlds = zip(*[e.reset(key) for e in envs])

    for t in range(3):
        k = jax.random.fold_in(key, t)
        actions = jax.random.randint(k, (8, 1), 0, 7)
        outs = [e.step(s, arrdict(actions=actions), k)
                for e, s in zip(envs, states)]
        states = [o[0] for o in outs]
        worlds = [o[1] for o in outs]

    np.testing.assert_array_equal(np.asarray(states[0].matchings),
                                  np.asarray(states[1].matchings))
    np.testing.assert_allclose(np.asarray(states[0].health),
                               np.asarray(states[1].health), atol=1e-6)
    np.testing.assert_allclose(np.asarray(worlds[0].reward),
                               np.asarray(worlds[1].reward), atol=1e-6)
    np.testing.assert_allclose(np.asarray(worlds[0].obs.rgb),
                               np.asarray(worlds[1].obs.rgb), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(worlds[0].obs.d),
                               np.asarray(worlds[1].obs.d), rtol=1e-5, atol=1e-6)


def test_deathmatch_fused_other_agent_counts():
    """The fused path generalizes beyond the default 4 agents/scene (A rides
    the kernel grid; expand/collapse is a reshape)."""
    from megastep_tpu.envs import Deathmatch
    from megastep_tpu.arrdict import arrdict

    geoms = floorplans.sample(2)
    key = jax.random.PRNGKey(2)
    for A in (2, 8):
        np.random.seed(5)
        envs = []
        for f in (False, True):
            np.random.seed(5)
            envs.append(Deathmatch(2 * A, n_agents=A, geometries=geoms,
                                   res=64, subsample=4, fused=f))
        states, worlds = zip(*[e.reset(key) for e in envs])
        actions = jax.random.randint(key, (2 * A, 1), 0, 7)
        outs = [e.step(s, arrdict(actions=actions), key)
                for e, s in zip(envs, states)]
        np.testing.assert_allclose(np.asarray(outs[0][1].obs.rgb),
                                   np.asarray(outs[1][1].obs.rgb),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(outs[0][0].matchings),
                                      np.asarray(outs[1][0].matchings))


def test_envs_multigroup_matches_split():
    """Env-level size bucketing (groups > 1, pre-sliced static tables/lines —
    the production TPU configuration) steps identically to the split
    pipeline. 128 mixed-size scenes is the smallest batch the default
    gran=64 bucketing splits (into 2 groups); the chip benches run 4-16."""
    from megastep_tpu import toys
    from megastep_tpu.envs import Deathmatch, Explorer
    from megastep_tpu.arrdict import arrdict

    geoms = [toys.box() if i % 2 else toys.column() for i in range(120)]
    geoms += floorplans.sample(8)
    key = jax.random.PRNGKey(3)

    # Explorer at 128 envs: 2 groups, static pre-sliced lines/attrs + skip_dyn.
    envs = []
    for f in (False, True):
        np.random.seed(13)
        envs.append(Explorer(128, geometries=geoms, res=32, subsample=4,
                             fused=f))
    assert len(envs[1]._groups) == 2
    assert isinstance(envs[1]._table8, tuple) and len(envs[1]._table8) == 2
    states, worlds = zip(*[e.reset(key) for e in envs])
    actions = jax.random.randint(key, (128, 1), 0, 7)
    outs = [e.step(s, arrdict(actions=actions), key)
            for e, s in zip(envs, states)]
    np.testing.assert_array_equal(np.asarray(outs[0][0].seen),
                                  np.asarray(outs[1][0].seen))
    np.testing.assert_allclose(np.asarray(outs[0][1].obs.rgb),
                               np.asarray(outs[1][1].obs.rgb),
                               rtol=1e-5, atol=1e-6)

    # Deathmatch at 128 scenes x 2 agents: 2 groups + per-frame table patch,
    # against the ungrouped fused kernel (fused-vs-split is pinned by
    # test_deathmatch_fused_matches_split; here the subject is the env-level
    # group plumbing, and the split comparator would triple the runtime).
    denvs = []
    for g in (1, None):
        np.random.seed(17)
        denvs.append(Deathmatch(256, n_agents=2, geometries=geoms, res=32,
                                subsample=4, fused=True, obs_groups=g,
                                random=np.random.RandomState(5)))
    assert len(denvs[1]._groups) == 2
    dstates, dworlds = zip(*[e.reset(key) for e in denvs])
    dactions = jax.random.randint(key, (256, 1), 0, 7)
    douts = [e.step(s, arrdict(actions=dactions), key)
             for e, s in zip(denvs, dstates)]
    np.testing.assert_array_equal(np.asarray(douts[0][0].matchings),
                                  np.asarray(douts[1][0].matchings))
    np.testing.assert_allclose(np.asarray(douts[0][1].obs.rgb),
                               np.asarray(douts[1][1].obs.rgb),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(douts[0][1].obs.d),
                               np.asarray(douts[1][1].obs.d),
                               rtol=1e-5, atol=1e-6)


def test_pregrouped_seen_width_under_pad_to():
    """With pad_to padding the texel axis beyond the local batch's max, the
    group specs only know local sizes — pre-grouped tables must still emit
    seen_counts at the GLOBAL padded width (via seen_blocks), or the
    Explorer's `state.seen | counts > 0` breaks on shape (regression:
    round-4 review finding)."""
    geoms = floorplans.sample(3) + [toys.box()]
    geoms = scene.sort_by_size(geoms, 1)
    # Pretend the global batch (other hosts' shards) has much bigger scenes.
    Lm, Km, Tm = scene.padded_sizes(geoms, 1)
    pad_to = (Lm + 16, Km + 4, Tm + 3 * 128)
    scn = scene.scenery(geoms, n_agents=1, random=np.random.RandomState(5),
                        pad_to=pad_to)
    c = core.Core(scn, res=64, fov=130)
    agents = c.init_agents()
    key = jax.random.PRNGKey(2)
    agents['positions'] = 2.5 + 2 * jax.random.uniform(key, agents.positions.shape)
    agents['angles'] = jax.random.uniform(
        jax.random.fold_in(key, 1), agents.angles.shape, minval=-180, maxval=180)

    lines_now = render.draw(scn, agents)
    attrs = fused.line_attrs(lines_now, scn)
    table = fused.split_table8(fused.pack_table8(scn))
    args = (scn.lines_width, agents.angles, agents.positions, c.res,
            c.half_screen_width, c.agent_radius)
    groups = fused.size_groups(scn.lines_width, scn.tex_width,
                               n_groups=2, gran=2)
    B_global = -(-scn.baked.shape[1] // 128)
    assert max(g[3] for g in groups) < B_global  # pad_to made them diverge

    full = fused.observe(lines_now, attrs, table, *args, want_seen=True,
                         env_block=2, interpret=True)
    pre = fused.observe_grouped(
        groups, *fused.group_lines(groups, lines_now, attrs),
        fused.group_tables(groups, table), *args, want_seen=True,
        env_block=2, seen_blocks=B_global, interpret=True)
    assert pre.seen_counts.shape == full.seen_counts.shape
    np.testing.assert_array_equal(np.asarray(full.seen_counts),
                                  np.asarray(pre.seen_counts))
    np.testing.assert_array_equal(np.asarray(full.indices),
                                  np.asarray(pre.indices))
    # Float outputs under pad_to + pre-grouped tables (each group's table
    # slice cuts below the global roll-concat wrap row): the sliced kernels
    # must still shade/measure identically up to fusion-order drift.
    np.testing.assert_allclose(np.asarray(full.distances),
                               np.asarray(pre.distances), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(full.screen),
                               np.asarray(pre.screen), rtol=1e-6, atol=1e-7)


def test_pregrouped_table_patch_under_pad_to():
    """table_patch + pre-grouped tables + pad_to: dynamic_rows' wrap row (the
    GLOBAL last block's ch7) lies beyond every group's own block count, so
    observe_grouped must drop it per group without corrupting the patched
    rows that remain (regression guard: round-4 review finding)."""
    geoms = floorplans.sample(2) + [toys.box(), toys.column()]
    geoms = scene.sort_by_size(geoms, 2)
    Lm, Km, Tm = scene.padded_sizes(geoms, 2)
    pad_to = (Lm + 8, Km + 2, Tm + 2 * 128)
    scn = scene.scenery(geoms, n_agents=2, random=np.random.RandomState(7),
                        pad_to=pad_to)
    c = core.Core(scn, res=64, fov=130)
    agents = c.init_agents()
    key = jax.random.PRNGKey(4)
    agents['positions'] = 2.5 + 2 * jax.random.uniform(key, agents.positions.shape)
    agents['angles'] = jax.random.uniform(
        jax.random.fold_in(key, 1), agents.angles.shape, minval=-180, maxval=180)

    T_dyn, t_pad = scn.n_dynamic_texels, scn.baked.shape[1]
    dyn = 0.5 + jax.random.uniform(jax.random.PRNGKey(3),
                                   (scn.baked.shape[0], T_dyn))
    rows = fused.dynamic_rows(T_dyn, t_pad)
    patch = fused.pack_table8_patch(scn, dyn)

    lines_now = render.draw(scn, agents)
    attrs = fused.line_attrs(lines_now, scn)
    table = fused.split_table8(fused.pack_table8(scn))
    args = (scn.lines_width, agents.angles, agents.positions, c.res,
            c.half_screen_width, c.agent_radius)
    groups = fused.size_groups(scn.lines_width, scn.tex_width,
                               n_groups=2, gran=2)
    B_global = -(-t_pad // 128)
    assert max(g[3] for g in groups) < B_global  # pad_to made them diverge
    assert rows[-1] >= 8 * max(g[3] for g in groups)  # wrap row gets dropped

    # Ground truth: the same grouped kernels on a fully rebuilt table —
    # isolates the patch/wrap-row mechanism exactly, so the comparison is
    # bit-exact (grouped vs UNgrouped floats carry the documented ~ULP
    # fusion drift and would mask a patch bug of the same size).
    baked_now = scn.baked.at[:, :T_dyn].set(dyn)
    table_now = fused.split_table8(fused.pack_table8(scn, baked_now))
    gl = fused.group_lines(groups, lines_now, attrs)
    want = fused.observe_grouped(
        groups, *gl, fused.group_tables(groups, table_now), *args,
        want_seen=False, env_block=2, interpret=True)
    pre = fused.observe_grouped(
        groups, *gl, fused.group_tables(groups, table), *args,
        want_seen=False, env_block=2, table_patch=patch, patch_rows=rows,
        interpret=True)
    for k in ('indices', 'distances', 'screen'):
        np.testing.assert_array_equal(np.asarray(want[k]), np.asarray(pre[k]))


def test_table8_patch_matches_full_rebuild():
    """pack_table8_patch rows are bit-identical to a full table rebuild's, and
    dynamic_rows covers every row a dynamic re-bake can change."""
    scn, c, agents = _setup(n_envs=2, n_agents=2)
    T_dyn, t_pad = scn.n_dynamic_texels, scn.baked.shape[1]
    dyn = 0.5 + jax.random.uniform(jax.random.PRNGKey(3),
                                   (scn.baked.shape[0], T_dyn))
    baked_now = scn.baked.at[:, :T_dyn].set(dyn)

    full_old = np.asarray(fused.split_table8(fused.pack_table8(scn)))
    full_new = np.asarray(fused.split_table8(fused.pack_table8(scn, baked_now)))
    rows = fused.dynamic_rows(T_dyn, t_pad)
    patch = np.asarray(fused.pack_table8_patch(scn, dyn))

    np.testing.assert_array_equal(patch, full_new[:, :, rows, :])
    other = [r for r in range(full_new.shape[2]) if r not in rows]
    np.testing.assert_array_equal(full_new[:, :, other], full_old[:, :, other])


def test_fused_observe_patch_path_matches_rebuild():
    """observe() with a static pre-split table + in-kernel patch rows produces
    exactly the same outputs as a full per-frame table rebuild."""
    scn, c, agents = _setup(n_envs=4, n_agents=2)
    lines_now = render.draw(scn, agents)
    T_dyn, t_pad = scn.n_dynamic_texels, scn.baked.shape[1]
    dyn = 0.25 + jax.random.uniform(jax.random.PRNGKey(7),
                                    (scn.baked.shape[0], T_dyn))
    baked_now = scn.baked.at[:, :T_dyn].set(dyn)
    args = (scn.lines_width, agents.angles, agents.positions, c.res,
            c.half_screen_width, c.agent_radius)
    attrs = fused.line_attrs(lines_now, scn)

    rebuilt = fused.observe(lines_now, attrs, fused.pack_table8(scn, baked_now),
                            *args, want_seen=False, env_block=2, interpret=True)
    patched = fused.observe(lines_now, attrs,
                            fused.split_table8(fused.pack_table8(scn)), *args,
                            want_seen=False, env_block=2,
                            table_patch=fused.pack_table8_patch(scn, dyn),
                            patch_rows=fused.dynamic_rows(T_dyn, t_pad),
                            interpret=True)

    np.testing.assert_array_equal(np.asarray(rebuilt.indices),
                                  np.asarray(patched.indices))
    np.testing.assert_array_equal(np.asarray(rebuilt.distances),
                                  np.asarray(patched.distances))
    np.testing.assert_array_equal(np.asarray(rebuilt.screen),
                                  np.asarray(patched.screen))


def test_fused_observe_grouped_matches_full():
    """Size-bucketed observe (per-group L/B padding) returns exactly the full
    kernel's outputs, including seen counts re-padded to the global table."""
    geoms = floorplans.sample(3) + [toys.box()]
    geoms = scene.sort_by_size(geoms, 2)
    scn = scene.scenery(geoms, n_agents=2, random=np.random.RandomState(5))
    c = core.Core(scn, res=64, fov=130)
    agents = c.init_agents()
    key = jax.random.PRNGKey(2)
    agents['positions'] = 2.5 + 2 * jax.random.uniform(key, agents.positions.shape)
    agents['angles'] = jax.random.uniform(
        jax.random.fold_in(key, 1), agents.angles.shape, minval=-180, maxval=180)

    lines_now = render.draw(scn, agents)
    attrs = fused.line_attrs(lines_now, scn)
    table = fused.split_table8(fused.pack_table8(scn))
    args = (scn.lines_width, agents.angles, agents.positions, c.res,
            c.half_screen_width, c.agent_radius)

    groups = fused.size_groups(scn.lines_width, scn.tex_width,
                               n_groups=2, gran=2)
    assert len(groups) == 2
    # group maxes bound their members and undercut the global pad
    assert groups[0][3] <= groups[1][3] <= scn.baked.shape[1] // 128 + 1

    full = fused.observe(lines_now, attrs, table, *args, want_seen=True,
                         env_block=2, interpret=True)
    grouped = fused.observe_grouped(groups, lines_now, attrs, table, *args,
                                    want_seen=True, env_block=2,
                                    interpret=True)

    # Indices are exact; float outputs tolerate the ~1-ULP drift XLA's
    # shape-dependent fusion introduces between the sliced and full programs
    # (a bare env-axis slice alone reproduces it in interpret mode).
    np.testing.assert_array_equal(np.asarray(full.indices),
                                  np.asarray(grouped.indices))
    np.testing.assert_allclose(np.asarray(full.distances),
                               np.asarray(grouped.distances), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(full.screen),
                               np.asarray(grouped.screen), rtol=2e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(full.seen_counts),
                                  np.asarray(grouped.seen_counts))


def test_pregrouped_inputs_bit_identical():
    """group_tables/group_lines pre-sliced inputs give bit-identical outputs
    to passing full arrays to observe_grouped (which slices per call): the
    pre-slicing exists purely so a static table isn't re-copied every step."""
    geoms = floorplans.sample(3) + [toys.box()]
    geoms = scene.sort_by_size(geoms, 2)
    scn = scene.scenery(geoms, n_agents=2, random=np.random.RandomState(5))
    c = core.Core(scn, res=64, fov=130)
    agents = c.init_agents()
    key = jax.random.PRNGKey(2)
    agents['positions'] = 2.5 + 2 * jax.random.uniform(key, agents.positions.shape)
    agents['angles'] = jax.random.uniform(
        jax.random.fold_in(key, 1), agents.angles.shape, minval=-180, maxval=180)

    lines_now = render.draw(scn, agents)
    attrs = fused.line_attrs(lines_now, scn)
    table = fused.split_table8(fused.pack_table8(scn))
    args = (scn.lines_width, agents.angles, agents.positions, c.res,
            c.half_screen_width, c.agent_radius)
    groups = fused.size_groups(scn.lines_width, scn.tex_width,
                               n_groups=2, gran=2)
    assert len(groups) == 2

    insliced = fused.observe_grouped(groups, lines_now, attrs, table, *args,
                                     want_seen=True, env_block=2,
                                     interpret=True)
    lines_g, attrs_g = fused.group_lines(groups, lines_now, attrs)
    table_g = fused.group_tables(groups, table)
    assert isinstance(table_g, tuple) and len(table_g) == 2
    pre = fused.observe_grouped(groups, lines_g, attrs_g, table_g, *args,
                                want_seen=True, env_block=2, interpret=True,
                                seen_blocks=table.shape[-2] // 8)
    for k in ('indices', 'distances', 'screen', 'seen_counts'):
        np.testing.assert_array_equal(np.asarray(insliced[k]),
                                      np.asarray(pre[k]))


def test_fused_observe_grouped_patch_matches_full():
    """Grouped observe composes with the in-kernel table patch: identical to
    the ungrouped patched kernel (wrap row dropped where sliced away)."""
    geoms = scene.sort_by_size(floorplans.sample(3) + [toys.box()], 2)
    scn = scene.scenery(geoms, n_agents=2, random=np.random.RandomState(5))
    c = core.Core(scn, res=64, fov=130)
    agents = c.init_agents()
    key = jax.random.PRNGKey(4)
    agents['positions'] = 2.5 + 2 * jax.random.uniform(key, agents.positions.shape)
    agents['angles'] = jax.random.uniform(
        jax.random.fold_in(key, 1), agents.angles.shape, minval=-180, maxval=180)

    lines_now = render.draw(scn, agents)
    attrs = fused.line_attrs(lines_now, scn)
    T_dyn, t_pad = scn.n_dynamic_texels, scn.baked.shape[1]
    dyn = 0.25 + jax.random.uniform(jax.random.PRNGKey(9),
                                    (scn.baked.shape[0], T_dyn))
    table = fused.split_table8(fused.pack_table8(scn))
    patch = fused.pack_table8_patch(scn, dyn)
    rows = fused.dynamic_rows(T_dyn, t_pad)
    args = (scn.lines_width, agents.angles, agents.positions, c.res,
            c.half_screen_width, c.agent_radius)
    groups = fused.size_groups(scn.lines_width, scn.tex_width,
                               n_groups=2, gran=2)

    full = fused.observe(lines_now, attrs, table, *args, want_seen=False,
                         env_block=2, table_patch=patch, patch_rows=rows,
                         interpret=True)
    grouped = fused.observe_grouped(groups, lines_now, attrs, table, *args,
                                    want_seen=False, env_block=2,
                                    table_patch=patch, patch_rows=rows,
                                    interpret=True)

    np.testing.assert_array_equal(np.asarray(full.indices),
                                  np.asarray(grouped.indices))
    np.testing.assert_allclose(np.asarray(full.distances),
                               np.asarray(grouped.distances), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(full.screen),
                               np.asarray(grouped.screen), rtol=2e-6, atol=1e-6)


def test_rebake_grouped_matches_full():
    """The size-bucketed dynamic re-bake (per-group static-line slicing +
    l_max texel lookup) reproduces the full-array re-bake."""
    from megastep_tpu.ops import bake

    geoms = scene.sort_by_size(floorplans.sample(3) + [toys.box()], 2)
    scn = scene.scenery(geoms, n_agents=2, random=np.random.RandomState(5))
    c = core.Core(scn, res=64, fov=130)
    agents = c.init_agents()
    key = jax.random.PRNGKey(11)
    agents['positions'] = 2.5 + 2 * jax.random.uniform(key, agents.positions.shape)
    agents['angles'] = jax.random.uniform(
        jax.random.fold_in(key, 1), agents.angles.shape, minval=-180, maxval=180)
    lines_now = render.draw(scn, agents)

    full = bake.dynamic_texel_intensity(scn, lines_now)
    k_max = int(np.asarray(scn.lights_width).max())
    groups = fused.size_groups(scn.lines_width, scn.tex_width,
                               n_groups=2, gran=2)
    grouped = jnp.concatenate([
        bake.dynamic_texel_intensity(scn.env_slice(g0, g1),
                                     lines_now[g0:g1, :Lg], k_max=k_max)
        for g0, g1, Lg, _ in groups])
    np.testing.assert_allclose(np.asarray(full), np.asarray(grouped),
                               rtol=2e-6, atol=1e-6)


def test_fast_shade_two_splits():
    """splits=2 (fast shade) keeps indices/distances exact and shades within
    the documented ~1.5e-5 relative error; splits=3 stays bit-exact."""
    scn, c, agents = _setup()
    lines_now = render.draw(scn, agents)
    attrs = fused.line_attrs(lines_now, scn)
    args = (scn.lines_width, agents.angles, agents.positions, c.res,
            c.half_screen_width, c.agent_radius)

    exact = fused.observe(lines_now, attrs,
                          fused.split_table8(fused.pack_table8(scn), 3),
                          *args, want_seen=False, env_block=2, interpret=True)
    fast = fused.observe(lines_now, attrs,
                         fused.split_table8(fused.pack_table8(scn), 2),
                         *args, want_seen=False, env_block=2, interpret=True)

    np.testing.assert_array_equal(np.asarray(exact.indices),
                                  np.asarray(fast.indices))
    np.testing.assert_array_equal(np.asarray(exact.distances),
                                  np.asarray(fast.distances))
    np.testing.assert_allclose(np.asarray(exact.screen),
                               np.asarray(fast.screen), rtol=5e-5, atol=5e-5)
    # and the fast patch path composes
    T_dyn, t_pad = scn.n_dynamic_texels, scn.baked.shape[1]
    dyn = 0.25 + jax.random.uniform(jax.random.PRNGKey(7),
                                    (scn.baked.shape[0], T_dyn))
    baked_now = scn.baked.at[:, :T_dyn].set(dyn)
    fast_rebuild = fused.observe(
        lines_now, attrs,
        fused.split_table8(fused.pack_table8(scn, baked_now), 2), *args,
        want_seen=False, env_block=2, interpret=True)
    fast_patch = fused.observe(
        lines_now, attrs, fused.split_table8(fused.pack_table8(scn), 2), *args,
        want_seen=False, env_block=2,
        table_patch=fused.pack_table8_patch(scn, dyn, splits=2),
        patch_rows=fused.dynamic_rows(T_dyn, t_pad), interpret=True)
    np.testing.assert_array_equal(np.asarray(fast_rebuild.screen),
                                  np.asarray(fast_patch.screen))


def test_explorer_static_lines_bit_exact():
    """With one agent the own model sits inside the camera near plane, so the
    fused observe fed *static* lines (dynamic slots zeroed, attrs from the
    undrawn scenery) is bit-identical to the drawn-lines kernel — the basis of
    Explorer's skip-draw fast path (envs/explorer.py __init__)."""
    scn, c, agents = _setup(n_agents=1)
    assert float(np.linalg.norm(np.asarray(scn.model), axis=-1).max()) \
        < c.agent_radius
    args = (scn.lines_width, agents.angles, agents.positions, c.res,
            c.half_screen_width, c.agent_radius)
    table8 = fused.split_table8(fused.pack_table8(scn), 3)

    lines_drawn = render.draw(scn, agents)
    drawn = fused.observe(lines_drawn, fused.line_attrs(lines_drawn, scn),
                          table8, *args, env_block=2, interpret=True)
    lines0 = scn.lines.at[:, :scn.n_dynamic].set(0.)
    static = fused.observe(lines0, fused.line_attrs(lines0, scn),
                           table8, *args, env_block=2, interpret=True)
    # ... and with the zeroed slots sliced out of the raycast entirely
    # (skip_dyn), indices rebased into the full id space.
    sliced = fused.observe(lines0, fused.line_attrs(lines0, scn),
                           table8, *args, env_block=2,
                           skip_dyn=scn.n_dynamic, interpret=True)

    for k in ('indices', 'distances', 'screen', 'seen_counts'):
        np.testing.assert_array_equal(np.asarray(drawn[k]),
                                      np.asarray(static[k]), err_msg=k)
        np.testing.assert_array_equal(np.asarray(drawn[k]),
                                      np.asarray(sliced[k]), err_msg=k)
    # no ray ever reports a dynamic line
    assert not ((np.asarray(drawn.indices) >= 0)
                & (np.asarray(drawn.indices) < scn.n_dynamic)).any()


def test_draw_in_kernel_bit_exact():
    """observe(draw_model=M) fed the *static* scenery lines/attrs rotates the
    agent models in-kernel and must be bit-identical to the kernel fed
    XLA-drawn lines (multi-agent, so other agents' models are genuinely
    visible and win rays)."""
    scn, c, agents = _setup(n_agents=2)
    args = (scn.lines_width, agents.angles, agents.positions, c.res,
            c.half_screen_width, c.agent_radius)
    table8 = fused.split_table8(fused.pack_table8(scn), 3)

    lines_drawn = render.draw(scn, agents)
    drawn = fused.observe(lines_drawn, fused.line_attrs(lines_drawn, scn),
                          table8, *args, env_block=2, interpret=True)
    kernel_drawn = fused.observe(scn.lines, fused.line_attrs(scn.lines, scn),
                                 table8, *args, env_block=2,
                                 draw_model=scn.n_model_lines, interpret=True)

    # other agents' models must actually be visible in this fixture
    assert ((np.asarray(drawn.indices) >= 0)
            & (np.asarray(drawn.indices) < scn.n_dynamic)).any()
    for k in ('indices', 'distances', 'screen', 'seen_counts'):
        np.testing.assert_array_equal(np.asarray(drawn[k]),
                                      np.asarray(kernel_drawn[k]), err_msg=k)


def test_deathmatch_draw_fused_bit_exact():
    """Deathmatch with in-kernel draw (draw_fused=True) steps *bit-identically*
    to the fused path with XLA-side draw: same obs, shooting, health."""
    from megastep_tpu.envs import Deathmatch
    from megastep_tpu.arrdict import arrdict

    geoms = floorplans.sample(2)
    key = jax.random.PRNGKey(3)
    envs = []
    for d in (False, True):
        np.random.seed(11)
        envs.append(Deathmatch(8, n_agents=4, geometries=geoms, res=128,
                               subsample=4, fused=True, draw_fused=d))
    states, worlds = zip(*[e.reset(key) for e in envs])

    for t in range(3):
        k = jax.random.fold_in(key, t)
        actions = jax.random.randint(k, (8, 1), 0, 7)
        outs = [e.step(s, arrdict(actions=actions), k)
                for e, s in zip(envs, states)]
        states = [o[0] for o in outs]
        worlds = [o[1] for o in outs]

    for get in (lambda i: states[i].matchings, lambda i: states[i].health,
                lambda i: worlds[i].reward, lambda i: worlds[i].obs.rgb,
                lambda i: worlds[i].obs.d):
        np.testing.assert_array_equal(np.asarray(get(0)), np.asarray(get(1)))


def test_grouped_composes_with_skip_dyn_and_draw_model():
    """Size-bucketed observe composes with the two in-kernel draw modes:
    per-group L slicing happens before the skip_dyn head slice / model
    rotation, and outputs match the ungrouped kernels exactly."""
    # single-agent + skip_dyn
    geoms = floorplans.sample(3) + [toys.box()]
    geoms = scene.sort_by_size(geoms, 1)
    scn = scene.scenery(geoms, n_agents=1, random=np.random.RandomState(5))
    c = core.Core(scn, res=64, fov=130)
    agents = c.init_agents()
    key = jax.random.PRNGKey(4)
    agents['positions'] = 2.5 + 2 * jax.random.uniform(key, agents.positions.shape)
    agents['angles'] = jax.random.uniform(
        jax.random.fold_in(key, 1), agents.angles.shape, minval=-180, maxval=180)
    attrs = fused.line_attrs(scn.lines, scn)
    table = fused.split_table8(fused.pack_table8(scn))
    args = (scn.lines_width, agents.angles, agents.positions, c.res,
            c.half_screen_width, c.agent_radius)
    groups = fused.size_groups(scn.lines_width, scn.tex_width,
                               n_groups=2, gran=2)
    assert len(groups) == 2
    full = fused.observe(scn.lines, attrs, table, *args, env_block=2,
                         skip_dyn=scn.n_dynamic, interpret=True)
    grouped = fused.observe_grouped(groups, scn.lines, attrs, table, *args,
                                    env_block=2, skip_dyn=scn.n_dynamic,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(full.indices),
                                  np.asarray(grouped.indices))
    np.testing.assert_allclose(np.asarray(full.distances),
                               np.asarray(grouped.distances), rtol=2e-6)
    np.testing.assert_array_equal(np.asarray(full.seen_counts),
                                  np.asarray(grouped.seen_counts))

    # multi-agent + draw_model
    geoms2 = scene.sort_by_size(geoms, 2)
    scn2 = scene.scenery(geoms2, n_agents=2, random=np.random.RandomState(5))
    c2 = core.Core(scn2, res=64, fov=130)
    ag2 = c2.init_agents()
    ag2['positions'] = 2.5 + 2 * jax.random.uniform(key, ag2.positions.shape)
    ag2['angles'] = jax.random.uniform(
        jax.random.fold_in(key, 2), ag2.angles.shape, minval=-180, maxval=180)
    attrs2 = fused.line_attrs(scn2.lines, scn2)
    table2 = fused.split_table8(fused.pack_table8(scn2))
    args2 = (scn2.lines_width, ag2.angles, ag2.positions, c2.res,
             c2.half_screen_width, c2.agent_radius)
    groups2 = fused.size_groups(scn2.lines_width, scn2.tex_width,
                                n_groups=2, gran=2)
    full2 = fused.observe(scn2.lines, attrs2, table2, *args2, env_block=2,
                          want_seen=False, draw_model=scn2.n_model_lines,
                          interpret=True)
    grouped2 = fused.observe_grouped(groups2, scn2.lines, attrs2, table2,
                                     *args2, env_block=2, want_seen=False,
                                     draw_model=scn2.n_model_lines,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(full2.indices),
                                  np.asarray(grouped2.indices))
    np.testing.assert_allclose(np.asarray(full2.screen),
                               np.asarray(grouped2.screen), rtol=2e-6,
                               atol=1e-6)


def test_fast_div_close_to_exact():
    """fast_div (reciprocal-multiply raycast, opt-in) stays within a few ulps
    of the exact path: identical indices on non-degenerate scenes, distances
    to ~1e-6 relative, screens to shade tolerance."""
    scn, c, agents = _setup()
    lines_now = render.draw(scn, agents)
    attrs = fused.line_attrs(lines_now, scn)
    t8 = fused.split_table8(fused.pack_table8(scn), 3)
    args = (scn.lines_width, agents.angles, agents.positions, c.res,
            c.half_screen_width, c.agent_radius)
    exact = fused.observe(lines_now, attrs, t8, *args, want_seen=False,
                          env_block=2, interpret=True)
    fast = fused.observe(lines_now, attrs, t8, *args, want_seen=False,
                         env_block=2, fast_div=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(exact.indices),
                                  np.asarray(fast.indices))
    np.testing.assert_allclose(np.asarray(exact.distances),
                               np.asarray(fast.distances), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(exact.screen),
                               np.asarray(fast.screen), rtol=1e-4, atol=1e-6)


def test_winner_selection_einsum_ulp_documented():
    """Documents (and pins the scale of) a real numerics fact the round-5
    session established: the jnp reference raycast computes uxv/t_num as
    HIGHEST MXU einsums while the kernel uses VPU expressions, so kernel
    distances sit within ~1 ULP of the reference rather than bit-equal
    (indices — the hard invariant — stay exact; a re-derivation experiment
    that tried to tighten this chip-measured a 2.4% loss and was reverted,
    see PERF.md negative results)."""
    scn, c, agents = _setup()
    lines_now = render.draw(scn, agents)
    want = _reference(scn, c, agents, lines_now)
    got = fused.observe(
        lines_now, fused.line_attrs(lines_now, scn),
        fused.split_table8(fused.pack_table8(scn)),
        scn.lines_width, agents.angles, agents.positions, c.res,
        c.half_screen_width, c.agent_radius, want_seen=False,
        env_block=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(want.indices),
                                  np.asarray(got.indices))
    w, g = np.asarray(want.distances), np.asarray(got.distances)
    finite = np.isfinite(w)
    np.testing.assert_array_equal(finite, np.isfinite(g))
    rel = np.abs(w[finite] - g[finite]) / np.maximum(np.abs(w[finite]), 1e-30)
    assert rel.max() < 1e-6, rel.max()   # ~a few ULP, not bit-equal
