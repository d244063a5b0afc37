"""The Deathmatch environment: multi-agent combat with line-of-sight shooting.

Counterpart of the reference ``megastep/demo/envs/deathmatch.py:21-170``: each of
``n_envs // 4`` floorplans hosts ``n_agents`` agents; an agent "shoots" whichever
opponents' body models appear in the middle two columns of its (downsampled) render;
health/damage bookkeeping, an out-of-bounds penalty, and respawn-on-death. The env
exposes ``n_envs = n_scenes * n_agents`` by reshaping every (scene, agent) pair into
its own single-agent sub-env (``expand``/``collapse``, ``deathmatch.py:11-19``) —
with padded arrays that is a pure reshape.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .. import core, cubicasa, modules, scene, spaces
from ..arrdict import arrdict, jaxify, numpyify
from ..dotdict import dotdict, mapping
from ..pytree import pytree

CLEARANCE = 1.


@mapping
def expand(x):
    """(B, A, ...) -> (B*A, 1, ...): each (scene, agent) pair becomes a sub-env."""
    B, A = x.shape[:2]
    return x.reshape(B * A, 1, *x.shape[2:])


def collapse(x, n_agents):
    """(B*A, 1, ...) -> (B, A, ...): back to the scene-major layout."""
    @mapping
    def _collapse(v):
        B = v.shape[0]
        return v.reshape(B // n_agents, n_agents, *v.shape[2:])
    return _collapse(x)


@pytree('core', '_rgb', '_depth', '_imu', '_movement', '_spawner', '_bounds',
        '_table8', '_lines_static', '_attrs_static')
class Deathmatch:
    """Multi-agent combat (see module docstring).

    :param n_envs: total sub-env count; there are ``n_envs // n_agents`` scenes.
    :param n_agents: agents per scene.

    Deliberate divergence: the reference computes the scene count as
    ``max(n_envs // 4, 1)`` regardless of ``n_agents`` (``deathmatch.py:23``), so
    its ``n_envs`` accounting only holds at the default ``n_agents=4``. Here the
    scene count is ``n_envs // n_agents`` so ``n_envs == n_scenes * n_agents``
    always holds (identical at the default; see PARITY.md).
    """

    def __init__(self, n_envs, n_agents=4, geometries=None, subsample=4,
                 fused=None, obs_groups=None, sort_scenes=True, shade_splits=3,
                 draw_fused=False, pad_to=None, random=None, shard_mesh=None,
                 shard_axis='env', obs_group_spec=None, obs_gran=64, obs_cuts='dp', **kwargs):
        n_scenes = max(n_envs // n_agents, 1)
        geometries = cubicasa.sample(n_scenes) if geometries is None else geometries
        # shard_mesh: run the fused observe (and the bucketed re-bake) under
        # jax.shard_map over this mesh, scene axis split on shard_axis — the
        # production multi-device path (see ops.fused.observe_grouped). Size
        # buckets become per-shard-LOCAL with scenes striped so each shard's
        # block is internally size-sorted.
        self.shard_mesh = shard_mesh
        self.shard_axis = shard_axis
        n_shards = shard_mesh.shape[shard_axis] if shard_mesh is not None else 1
        # Scenes are re-ordered by texel count so the fused observe can run
        # size buckets padded to their own max (ops.fused.size_groups) instead
        # of the global worst case. NOTE: scene i then uses
        # ``geometries[self.scene_order[i]]`` of the caller's list — pass
        # ``sort_scenes=False`` to keep the caller's order. Multi-process
        # builds pass sort_scenes=False + obs_group_spec and order geometries
        # themselves (parallel.host).
        self.scene_order = (scene.striped_order(geometries, n_agents, n_shards)
                            if sort_scenes else np.arange(len(geometries)))
        geometries = [geometries[i] for i in self.scene_order]
        # random: seeded texture/light construction (reproducible scenes);
        # pad_to: global padded shapes for per-host construction
        # (parallel.host.sharded_deathmatch builds one scene slice per host).
        scenery = scene.scenery(geometries, n_agents, random=random,
                                pad_to=pad_to)
        self.core = core.Core(scenery, res=kwargs.pop('res', 4 * 128),
                              fov=kwargs.pop('fov', 70), **kwargs)
        self.fused = fused
        self._rgb = modules.RGB(self.core, n_agents=1, subsample=subsample)
        self._depth = modules.Depth(self.core, n_agents=1, subsample=subsample)
        self._imu = modules.IMU(self.core, n_agents=1)
        self._movement = modules.MomentumMovement(self.core, n_agents=1)
        self._spawner = modules.RandomSpawns(geometries, self.core, random=random)

        self.action_space = self._movement.space
        self.obs_space = dotdict(
            rgb=self._rgb.space,
            d=self._depth.space,
            imu=self._imu.space,
            health=spaces.MultiVector(1, 1))

        self._bounds = jaxify(np.stack(
            [np.array(g.masks.shape) * g.res for g in geometries]))

        self.n_envs = self.core.n_envs * self.core.n_agents
        # Static bound on the per-env light count: lets the per-step re-bake
        # slice dead padded light slots off its (N, P, K) streams.
        self._k_lights = int(np.asarray(scenery.lights_width).max())
        # Pre-split static shade table for the fused kernel: the per-frame
        # dynamic re-bake only changes a few rows (the agent-model texels'
        # baked channel), which the kernel patches in VMEM
        # (ops.fused.pack_table8_patch) instead of rebuilding the table.
        self._shade_splits = shade_splits
        # draw_fused: rotate + translate the agent models inside the observe
        # kernel (ops.fused.observe(draw_model=...)) instead of an XLA-side
        # draw over the full line array per step. Bit-exact with the drawn
        # path (tests/test_fused.py::test_draw_in_kernel_bit_exact); opt-in
        # until benched on chip.
        self.draw_fused = draw_fused
        if self._use_fused:
            from ..ops import fused as fused_ops
            # The default of 16 buckets is measured on chip at the res-512
            # floorplan bench: 16 buckets beat 4 by 12% (the kernel cost
            # scales with each group's own L/B padding; see PERF.md) —
            # size_groups halves the count automatically when the scene batch
            # doesn't divide. With a shard_mesh, buckets are per-shard-local
            # (one SPMD program; padding maxima match the global sort's).
            G = 16 if obs_groups is None else obs_groups
            if obs_group_spec is not None:
                # Multi-process builds: the LOCAL group spec, computed from
                # the GLOBAL geometry list so every host compiles one SPMD
                # program (parallel.host.sharded_deathmatch).
                self._groups = tuple(tuple(g) for g in obs_group_spec)
            elif shard_mesh is not None:
                self._groups = fused_ops.sharded_size_groups(
                    scenery.lines_width, scenery.tex_width, n_shards,
                    n_groups=G, gran=obs_gran, method=obs_cuts)
            else:
                self._groups = fused_ops.size_groups(
                    scenery.lines_width, scenery.tex_width, n_groups=G,
                    gran=obs_gran, method=obs_cuts)
            rows = None
            if shard_mesh is not None and len(self._groups) > 1:
                n_local = self._groups[-1][1]
                rows = fused_ops.shard_group_rows(
                    self._groups, scenery.n_envs // n_local, n_local)
            self._group_rows = rows
            # shade_splits=2 is the opt-in fast mode: ~1.5e-5 relative shade
            # error (vs exact f32 at 3) for one less MXU pass per lookup.
            # Static inputs are pre-sliced per size group — an in-step slice
            # of a static table re-copies it every frame
            # (ops.fused.group_tables).
            self._table8 = fused_ops.group_tables(
                self._groups, fused_ops.split_table8(
                    fused_ops.pack_table8(scenery), splits=shade_splits),
                rows=rows)
            if draw_fused:
                # Only the in-kernel draw path reads the static (pre-sliced)
                # lines/attrs; the default XLA-draw path rebuilds both per
                # step from the drawn lines — don't hold dead copies for it.
                self._lines_static, self._attrs_static = fused_ops.group_lines(
                    self._groups, scenery.lines,
                    fused_ops.line_attrs(scenery.lines, scenery), rows=rows)
            else:
                self._lines_static = self._attrs_static = None
        else:
            self._table8 = None
            self._groups = ()
            self._group_rows = None
            self._lines_static = self._attrs_static = None

    def _respawn(self, agents, health, damage, reset, key):
        agents = self._spawner(agents, reset, key)
        health = jnp.where(reset, 1., health)
        damage = jnp.where(reset, 0., damage)
        return agents, health, damage

    def _shoot(self, agents, health, damage, opponents_mid):
        """Matches shooters to targets via the middle two columns of the opponent-id
        image, applies damage/wounds/out-of-bounds penalties
        (reference ``deathmatch.py:54-72``).

        :param opponents_mid: (N, A, 1, 2) opponent ids at the two middle
            columns of the downsampled render (pre-picked by the caller —
            the fused path slices them straight off the kernel's index rows).
        :return: ``(health, damage, matchings, hits)``.
        """
        A = self.core.n_agents
        ids = jnp.arange(A)
        # matchings: (N, shooter, target)
        matchings = (opponents_mid[:, :, None] == ids[None, None, :, None, None])
        matchings = matchings.any(-1).any(-1)

        hits = matchings.sum(2).astype(jnp.float32)
        wounds = matchings.sum(1).astype(jnp.float32)

        damage = damage + .05 * hits

        pos = agents.positions
        outside = (pos < -CLEARANCE).any(-1) | \
                  (pos > (self._bounds[:, None] + CLEARANCE)).any(-1)

        # 5% damage per wound, 5% for being out of bounds, .1% per timestep.
        health = health - .05 * (wounds + outside) - .001
        return health, damage, matchings, hits.reshape(-1)

    @property
    def _use_fused(self):
        return modules.use_fused(self.fused)

    def _opponents(self, line_idxs):
        """Opponent agent ids from (N, A, 1, 2) middle-column line indices
        (-1 where the pixel shows no agent model) - shared by both observe
        paths (reference ``deathmatch.py:74-86``)."""
        obj_idxs = line_idxs // self.core.scenery.n_model_lines
        mask = (0 <= line_idxs) & (obj_idxs < self.core.n_agents)
        return jnp.where(mask, obj_idxs, -1)

    def _rebake(self, scn, dyn_lines):
        """Per-step dynamic-texel re-bake from this frame's drawn agent models
        (``(N, n_dynamic, 2, 2)``; walls come from the static scenery, which
        draw never touches), ridden over the same size buckets as the fused
        observe: each group's occlusion stream runs over only the group's own
        (padded) static line count instead of the global max. With a
        ``shard_mesh`` the buckets are shard-local, so the grouped slicing
        runs under ``jax.shard_map`` on each device's own scene block."""
        from ..ops import bake
        nd = scn.n_dynamic

        def grouped(scn, dyn_lines):
            if len(self._groups) <= 1:
                return bake.dynamic_texel_intensity_parts(
                    scn, dyn_lines, scn.lines[:, nd:], k_max=self._k_lights)
            return jnp.concatenate([
                bake.dynamic_texel_intensity_parts(
                    scn.env_slice(g0, g1), dyn_lines[g0:g1],
                    scn.lines[g0:g1, nd:Lg], k_max=self._k_lights)
                for g0, g1, Lg, _ in self._groups])

        if self.shard_mesh is None:
            return grouped(scn, dyn_lines)
        from jax.sharding import PartitionSpec
        spec = PartitionSpec(self.shard_axis)
        per_env = ('lines', 'lines_width', 'lights', 'lights_width',
                   'textures', 'tex_width', 'baked', 'line_tex_starts',
                   'line_tex_widths', 'tex_line')
        scn_specs = scn.replace(**{f: spec for f in per_env},
                                model=PartitionSpec())
        return jax.shard_map(grouped, mesh=self.shard_mesh,
                             in_specs=(scn_specs, spec), out_specs=spec,
                             check_vma=False)(scn, dyn_lines)

    def _observe_fused(self, agents, health, damage):
        """One-kernel observe (:mod:`megastep_tpu.ops.fused`) with per-frame
        dynamic re-bake: agent-model texel lighting is recomputed before the
        shade table is packed, matching ``render(rebake_dynamic=True)``."""
        from ..ops import fused as fused_ops, render as render_ops
        scn = self.core.scenery
        c = self.core
        dyn_lines = render_ops.draw_dynamic(scn, agents)
        dyn = self._rebake(scn, dyn_lines)
        if self._table8 is not None:
            table8 = self._table8
            patch = fused_ops.pack_table8_patch(scn, dyn,
                                                splits=self._shade_splits)
            rows = fused_ops.dynamic_rows(scn.n_dynamic_texels,
                                          scn.baked.shape[1])
        else:
            # Fallback (env built with fused off, stepped with it on): full
            # per-frame table rebuild, split in-kernel.
            baked_now = scn.baked.at[:, :scn.n_dynamic_texels].set(dyn)
            table8, patch, rows = fused_ops.pack_table8(scn, baked_now), None, ()
        if self.draw_fused and self._attrs_static is not None:
            # In-kernel draw: static (pre-sliced) lines/attrs in, the kernel
            # rotates the model slots per agent itself — no per-step
            # full-line-array update or attrs rebuild.
            lines_in, attrs_in = self._lines_static, self._attrs_static
            dm = scn.n_model_lines
        else:
            lines_in = scn.lines.at[:, :scn.n_dynamic].set(dyn_lines)
            attrs_in = fused_ops.line_attrs(lines_in, scn)
            dm = 0
        s = self._rgb.subsample
        # The two rays the shoot test reads: downsample(indices, s)[..., s//2]
        # at the middle two downsampled columns — a strided slice of the raw
        # index rows (the ONLY consumers of the full-res indices). The
        # epilogue runs in the kernel's raw block layout, per size group, so
        # the full-res streams never ride the multi-agent transpose or the
        # group concat (see ops.fused.observe's epilogue contract).
        res_ds = c.res // s
        r0 = s * (res_ds // 2 - 1) + s // 2

        def epilogue(raw):
            rgb, d = modules.fused_obs_raw(raw, s, c.agent_radius,
                                           self._depth.max_depth, c.res)
            return arrdict(rgb=rgb, d=d,
                           mid=raw.indices[..., r0:r0 + s + 1:s])

        out = fused_ops.observe_grouped(
            self._groups,
            lines_in, attrs_in, table8,
            scn.lines_width, agents.angles, agents.positions, c.res,
            c.half_screen_width, c.agent_radius, want_seen=False,
            table_patch=patch, patch_rows=rows, draw_model=dm,
            interpret=not modules.on_tpu(),
            shard_mesh=self.shard_mesh, shard_axis=self.shard_axis,
            epilogue=epilogue)

        opponents = self._opponents(out.mid[:, :, None])
        health, damage, matchings, hits = self._shoot(agents, health, damage,
                                                      opponents)
        obs = arrdict(rgb=out.rgb[:, :, :, None, :],
                      d=out.d[:, :, None, None, :],
                      imu=self._imu(agents), health=health[..., None])
        return obs, health, damage, matchings, hits

    def _observe(self, agents, health, damage):
        if self._use_fused:
            return self._observe_fused(agents, health, damage)
        r = modules.render(self.core, agents)
        line_idxs = modules.downsample(
            r.indices, self._rgb.subsample)[..., self._rgb.subsample // 2]
        res_ds = line_idxs.shape[-1]
        middle = slice(res_ds // 2 - 1, res_ds // 2 + 1)
        opponents = self._opponents(line_idxs[..., middle])
        health, damage, matchings, hits = self._shoot(agents, health, damage, opponents)
        obs = arrdict(
            rgb=self._rgb(r),
            d=self._depth(r),
            imu=self._imu(agents),
            health=health[..., None])
        return obs, health, damage, matchings, hits

    def reset(self, key):
        """Spawns everyone fresh. Returns ``(state, world)`` with the world expanded
        to the sub-env (agent-as-env) layout."""
        reset = self.core.agent_full(True)
        agents, health, damage = self._respawn(
            self.core.init_agents(), self.core.agent_full(0.),
            self.core.agent_full(0.), reset, key)
        obs, health, damage, matchings, reward = self._observe(agents, health, damage)
        state = arrdict(agents=agents, progress=self.core.agent_full(1.),
                        health=health, damage=damage, matchings=matchings)
        return state, arrdict(obs=expand(obs), reward=reward, reset=reset.reshape(-1))

    def step(self, state, decision, key):
        """One step: respawn the dead, move, observe/shoot
        (reference ``deathmatch.py:47-52, 88-96``). ``decision.actions`` is
        (n_envs, 1) in the sub-env layout. Returns ``(state, world)``."""
        reset = state.health <= 0
        agents, health, damage = self._respawn(
            state.agents, state.health, state.damage, reset, key)
        agents, progress = self._movement(
            agents, collapse(decision, self.core.n_agents))
        obs, health, damage, matchings, reward = self._observe(agents, health, damage)
        state = arrdict(agents=agents, progress=progress,
                        health=health, damage=damage, matchings=matchings)
        return state, arrdict(obs=expand(obs), reward=reward, reset=reset.reshape(-1))

    def state(self, state, world, e=0):
        """Numpy snapshot of scene ``e`` for plotting."""
        A = self.core.n_agents
        obs = collapse(world.obs, A)
        return arrdict(
            core=self.core.state(state.agents, state.progress, e),
            rgb=numpyify(obs.rgb[e]),
            d=numpyify(obs.d[e]),
            health=np.asarray(state.health[e]),
            damage=np.asarray(state.damage[e]),
            matchings=np.asarray(state.matchings[e]),
            bounds=np.asarray(self._bounds[e]))

    @classmethod
    def plot_state(cls, state):
        import matplotlib as mpl
        import matplotlib.pyplot as plt
        from .. import plotting

        n_agents = len(state.health)
        show_value = 'decision' in state

        fig = plt.figure()
        gs = plt.GridSpec(n_agents, 4 if show_value else 3, fig)
        colors = [f'C{i}' for i in range(n_agents)]

        plan = core.Core.plot_state(state.core, plt.subplot(gs[:-1, :-1]))

        origin, dest = state.matchings.nonzero()
        if len(origin):
            lines = state.core.agents.positions[np.stack([origin, dest], 1)]
            linecolors = np.array(colors)[origin]
            plan.add_collection(mpl.collections.LineCollection(
                lines, color=linecolors, linewidth=1, alpha=.5))

        size = state.bounds[::-1] + 2 * CLEARANCE
        plan.add_artist(mpl.patches.Rectangle(
            (-CLEARANCE, -CLEARANCE), *size,
            linewidth=1, edgecolor='k', facecolor=(0., 0., 0., 0.)))

        images = {'rgb': state.rgb, 'd': state.d}
        plotting.plot_images(images, [plt.subplot(gs[i, -1]) for i in range(n_agents)])

        ax = plt.subplot(gs[-1, 0])
        ax.barh(np.arange(n_agents), state.health, color=colors)
        ax.set_ylabel('health')
        ax.set_yticks([])
        ax.invert_yaxis()
        ax.set_xlim(0, 1)

        ax = plt.subplot(gs[-1, 1])
        ax.barh(np.arange(n_agents), state.damage, color=colors)
        ax.set_ylabel('inflicted')
        ax.set_yticks([])
        ax.invert_yaxis()

        if show_value:
            ax = plt.subplot(gs[-1, 2])
            ax.barh(np.arange(n_agents), state.decision.value, color=colors)
            ax.set_ylabel('value')
            ax.set_yticks([])
            ax.invert_yaxis()
        return fig

    def display(self, state, world, e=0):
        return self.plot_state(self.state(state, world, e))
