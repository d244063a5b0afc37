"""The Explorer environment: reward for seeing new texels.

Counterpart of the reference ``megastep/demo/envs/explorer.py:8-130``. The seen-texel
bookkeeping becomes a per-env boolean array over the padded texel axis (the padded
layout turns the reference's global ragged scatter_add into a per-env masked scatter
+ row sum), and all state (seen set, potential, episode lengths) lives in an explicit
state pytree so the whole env jits and shards.

One deliberate divergence: the reference writes ``seen[texindices] = True`` with
miss-pixels carrying index -1, which (by Python negative indexing) spuriously marks
the *last* texel of the whole batch as seen (``explorer.py:34-48``). Here misses are
dropped instead.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .. import core, cubicasa, modules, scene
from ..arrdict import arrdict, numpyify
from ..dotdict import dotdict
from ..pytree import pytree


@pytree('core', '_rgb', '_depth', '_mover', '_imu', '_respawner', '_table8',
        '_lines_static', '_attrs_static')
class Explorer:
    """Exploration env over multi-room floorplans: RGB + depth + IMU observations,
    momentum movement, reward per newly-seen texel.

    :param n_envs: number of environments.
    :param geometries: optional geometry list; defaults to :func:`cubicasa.sample`
        (with an offline procedural fallback).
    :param fused: use the fused observe kernel (raycast + shade + seen counts in
        one Pallas program, :mod:`megastep_tpu.ops.fused`). ``None`` (default)
        enables it on TPU; the split jnp pipeline otherwise. Both paths are
        tested equivalent.
    """

    def __init__(self, n_envs, geometries=None, subsample=4, fused=None,
                 pad_to=None, random=None, obs_groups=None, sort_scenes=True,
                 shade_splits=3, shard_mesh=None, shard_axis='env',
                 obs_group_spec=None, obs_gran=64, obs_cuts='dp', **kwargs):
        geometries = cubicasa.sample(n_envs) if geometries is None else geometries
        # shard_mesh: run the fused observe under jax.shard_map over this
        # mesh, env axis split on shard_axis — the production multi-device
        # path (a GSPMD-partitioned pallas_call would all-gather its
        # env-sharded operands; see ops.fused.observe_grouped). Size buckets
        # then become per-shard-LOCAL (sharded_size_groups) with scenes
        # striped so every shard's local block is internally size-sorted.
        self.shard_mesh = shard_mesh
        self.shard_axis = shard_axis
        n_shards = shard_mesh.shape[shard_axis] if shard_mesh is not None else 1
        # Scenes are re-ordered by texel count so the fused observe can run
        # size buckets padded to their own max (ops.fused.size_groups) instead
        # of the global worst case. NOTE: env i then uses
        # ``geometries[self.scene_order[i]]`` of the caller's list — pass
        # ``sort_scenes=False`` to keep the caller's order (at the cost of
        # mixed-size buckets). Multi-process builds pass sort_scenes=False +
        # obs_group_spec and order geometries themselves (parallel.host).
        self.scene_order = (scene.striped_order(geometries, 1, n_shards)
                            if sort_scenes else np.arange(len(geometries)))
        geometries = [geometries[i] for i in self.scene_order]
        scenery = scene.scenery(geometries, 1, random=random, pad_to=pad_to)
        self.core = core.Core(scenery, res=kwargs.pop('res', 4 * 64),
                              fov=kwargs.pop('fov', 130), **kwargs)
        self._rgb = modules.RGB(self.core, n_agents=1, subsample=subsample)
        self._depth = modules.Depth(self.core, n_agents=1, subsample=subsample)
        self._mover = modules.MomentumMovement(self.core)
        self._imu = modules.IMU(self.core)
        self._respawner = modules.RandomSpawns(geometries, self.core, random=random)
        self.fused = fused
        # The shade table is static for a single-agent env (no dynamic re-bake);
        # pre-packed + pre-split once for the fused kernel — only when that
        # path can actually run (scenery is immutable, so it cannot go stale).
        if self._use_fused:
            from ..ops import fused as fused_ops
            G = 4 if obs_groups is None else obs_groups
            if obs_group_spec is not None:
                # Multi-process builds: the LOCAL group spec, computed from the
                # GLOBAL geometry list so every host compiles one SPMD program
                # (parallel.host.sharded_explorer).
                self._groups = tuple(tuple(g) for g in obs_group_spec)
            elif shard_mesh is not None:
                self._groups = fused_ops.sharded_size_groups(
                    scenery.lines_width, scenery.tex_width, n_shards,
                    n_groups=G, gran=obs_gran, method=obs_cuts)
            else:
                self._groups = fused_ops.size_groups(
                    scenery.lines_width, scenery.tex_width, n_groups=G,
                    gran=obs_gran, method=obs_cuts)
            # Mesh layout: pre-sliced static inputs gather each shard's local
            # group block so an env-axis sharding hands every device its own
            # rows (ops.fused.shard_group_rows).
            rows = None
            if shard_mesh is not None and len(self._groups) > 1:
                n_local = self._groups[-1][1]
                rows = fused_ops.shard_group_rows(
                    self._groups, scenery.n_envs // n_local, n_local)
            self._group_rows = rows
            # shade_splits=2 is the opt-in fast mode: ~1.5e-5 relative shade
            # error (vs exact f32 at 3) for one less MXU pass per lookup.
            # The static table is pre-sliced per size group: slicing it inside
            # the step re-copies hundreds of MB of table every frame
            # (ops.fused.group_tables).
            self._table8 = fused_ops.group_tables(
                self._groups, fused_ops.split_table8(
                    fused_ops.pack_table8(scenery), splits=shade_splits),
                rows=rows)
            # Static observe inputs, skipping the per-step draw: with one agent
            # every model vertex sits strictly inside the camera near plane
            # (max ‖vertex‖ = width/2·√1.25 < radius = width/√2), so a drawn
            # own-model line can never pass the raycast's near < s test — the
            # kernel slices the dynamic slots out entirely (skip_dyn), so the
            # statics can simply alias the scenery arrays. Bit-exact with the
            # drawn path
            # (tests/test_fused.py::test_explorer_static_lines_bit_exact).
            model_norm = float(np.linalg.norm(
                np.asarray(scenery.model), axis=-1).max())
            if scenery.n_agents == 1 and model_norm < self.core.agent_radius:
                # Pre-sliced per size group, like the table (a per-step slice
                # of a static input is a per-step copy).
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

        self.action_space = self._mover.space
        self.obs_space = dotdict(
            rgb=self._rgb.space,
            d=self._depth.space,
            imu=self._imu.space)

    @property
    def _use_fused(self):
        return modules.use_fused(self.fused)

    @property
    def n_envs(self):
        return self.core.n_envs

    def _tex_indices(self, rc):
        """Texel index hit by each pixel (reference ``explorer.py:34-43``).

        :return: ``(tex, hit)`` — (N, A*R) int texel indices (clamped to 0 on miss)
            and the matching hit mask.
        """
        scn = self.core.scenery
        N = rc.indices.shape[0]
        line = rc.indices.reshape(N, -1)
        hit = line >= 0
        line = jnp.maximum(line, 0)
        if jax.default_backend() == 'tpu':
            from ..ops.render import onehot_lookup
            attrs = jnp.stack([scn.line_tex_starts, scn.line_tex_widths],
                              -1).astype(jnp.float32)
            sw = onehot_lookup(attrs, line)
            start = sw[..., 0].astype(jnp.int32)
            width = sw[..., 1].astype(jnp.int32)
        else:
            start = jnp.take_along_axis(scn.line_tex_starts, line, 1)
            width = jnp.take_along_axis(scn.line_tex_widths, line, 1)
        loc = jnp.where(hit, rc.locations.reshape(N, -1), 0.)
        ti = jnp.minimum(jnp.floor(width * loc), width - 1).astype(jnp.int32)
        return start + jnp.maximum(ti, 0), hit

    def _reward(self, state_seen, rc, reset):
        """Marks hit texels seen and pays one unit per newly-seen texel, normalized
        by the obs width (reference ``explorer.py:45-58``).

        :return: ``(seen, potential, reward)``.
        """
        tex, hit = self._tex_indices(rc)
        if jax.default_backend() == 'tpu':
            # Scatter-free: TPU scatters serialize; a one-hot MXU reduction
            # marks all newly-seen texels at memory-bandwidth speed.
            from ..ops.render import onehot_any
            seen = state_seen | onehot_any(tex, hit, state_seen.shape[1])
        else:
            seen = jax.vmap(lambda s, t, h: s.at[t].max(h))(state_seen, tex, hit)
        potential = seen.sum(-1).astype(jnp.float32)
        old_potential = state_seen.sum(-1).astype(jnp.float32)
        reward = (potential - old_potential) / (self.core.res // self._rgb.subsample)
        reward = jnp.where(reset, 0., reward)
        return seen, potential, reward

    def _observe_fused(self, agents, state_seen, reset):
        """One-kernel observe: raycast + shade + seen counts fused
        (:mod:`megastep_tpu.ops.fused`); obs assembled from the kernel's
        (N, A, 3, R) screen / (N, A, R) distances without re-transposing the
        full-res arrays."""
        from ..ops import fused as fused_ops
        from ..ops import render as render_ops
        scn = self.core.scenery
        c = self.core
        if self._lines_static is not None:
            # Single-agent fast path: the own model is unhittable, so the
            # frame's lines/attrs alias the static scenery (see __init__) and
            # the dynamic slots are sliced out of the raycast entirely
            # (skip_dyn rebases the reported indices). skip_dyn MUST stay on
            # here: the aliased head rows hold the unrotated model, not zeros.
            lines_now, attrs = self._lines_static, self._attrs_static
            skip = scn.n_dynamic
        else:
            lines_now = render_ops.draw(scn, agents)
            attrs = fused_ops.line_attrs(lines_now, scn)
            skip = 0
        s = self._rgb.subsample

        def epilogue(raw):
            # Pool in the kernel's raw block layout, per size group: only the
            # subsampled obs ride the group concat, not the full-res streams
            # (see ops.fused.observe's epilogue contract).
            rgb, d = modules.fused_obs_raw(raw, s, c.agent_radius,
                                           self._depth.max_depth, c.res)
            return arrdict(rgb=rgb, d=d)

        out = fused_ops.observe_grouped(
            self._groups,
            lines_now, attrs, self._table8,
            scn.lines_width, agents.angles, agents.positions, c.res,
            c.half_screen_width, c.agent_radius, want_seen=True,
            skip_dyn=skip,
            # Global block count: with pad_to the texel axis can be padded
            # beyond this batch's max, and the group specs only know local
            # sizes — the seen_counts width must still match state.seen.
            seen_blocks=-(-scn.baked.shape[1] // fused_ops.LO_WIDTH),
            interpret=not modules.on_tpu(),
            shard_mesh=self.shard_mesh, shard_axis=self.shard_axis,
            epilogue=epilogue)
        obs = arrdict(rgb=out.rgb[:, :, :, None, :],
                      d=out.d[:, :, None, None, :], imu=self._imu(agents))

        T = state_seen.shape[1]
        seen = state_seen | (out.seen_counts[:, :T] > 0)
        potential = seen.sum(-1).astype(jnp.float32)
        old_potential = state_seen.sum(-1).astype(jnp.float32)
        reward = (potential - old_potential) / (c.res // s)
        reward = jnp.where(reset, 0., reward)
        return obs, seen, potential, reward

    def _observe(self, agents, seen, reset):
        if self._use_fused and self._table8 is not None:
            return self._observe_fused(agents, seen, reset)
        r = modules.render(self.core, agents)
        obs = arrdict(
            rgb=self._rgb(r),
            d=self._depth(r),
            imu=self._imu(agents))
        seen, potential, reward = self._reward(seen, r, reset)
        return obs, seen, potential, reward

    def reset(self, key):
        """Spawns everyone fresh. Returns ``(state, world)``."""
        scn = self.core.scenery
        reset = self.core.env_full(True)
        agents = self._respawner(
            self.core.init_agents(), self.core.agent_full(True), key)
        seen0 = jnp.zeros(scn.baked.shape, bool)
        obs, seen, potential, reward = self._observe(agents, seen0, reset)
        state = arrdict(
            agents=agents,
            progress=self.core.agent_full(1.),
            seen=seen,
            potential=potential,
            lengths=self.core.env_full(0))
        return state, arrdict(obs=obs, reward=reward, reset=reset)

    def step(self, state, decision, key):
        """One step: move, maybe reset timed-out envs, observe, reward.
        Returns ``(state, world)`` (reference ``explorer.py:85-97``)."""
        agents, progress = self._mover(state.agents, decision)

        lengths = state.lengths + 1
        reset = lengths >= state.potential + 200

        # Respawn reset envs and clear their exploration bookkeeping.
        agents = self._respawner(agents, reset[:, None], key)
        seen = jnp.where(reset[:, None], False, state.seen)
        lengths = jnp.where(reset, 0, lengths)

        obs, seen, potential, reward = self._observe(agents, seen, reset)
        state = arrdict(
            agents=agents, progress=progress, seen=seen,
            potential=potential, lengths=lengths)
        return state, arrdict(obs=obs, reward=reward, reset=reset)

    def state(self, state, world, e=0):
        """Numpy snapshot of env ``e`` for plotting."""
        scn = self.core.scenery
        T = int(scn.tex_width[e])
        return arrdict(
            core=self.core.state(state.agents, state.progress, e),
            rgb=numpyify(world.obs.rgb[e]),
            d=numpyify(world.obs.d[e]),
            potential=np.asarray(state.potential[e]),
            seen=np.asarray(state.seen[e, :T]),
            length=np.asarray(state.lengths[e]),
            max_length=np.asarray(state.potential[e]) + 200)

    @classmethod
    def plot_state(cls, state):
        import matplotlib.pyplot as plt
        from .. import plotting
        fig = plt.figure()
        gs = plt.GridSpec(2, 2, fig, 0, 0, 1, 1)

        alpha = .1 + .9 * state.seen.astype(float)
        state = state.copy()
        state['core'] = state.core.copy()
        state.core['scenery'] = state.core.scenery.copy()
        state.core.scenery['textures'] = state.core.scenery.textures.copy()
        state.core.scenery.textures['vals'] = np.concatenate(
            [state.core.scenery.textures.vals, alpha[:, None]], 1)
        ax = core.Core.plot_state(state.core, plt.subplot(gs[:, 0]))

        images = {'rgb': state.rgb, 'd': state.d}
        plotting.plot_images(images, [plt.subplot(gs[:, 1])])

        s = (f'length: {int(state.length):d}/{state.max_length:.0f}\n'
             f'potential: {state.potential:.0f}')
        ax.annotate(s, (5., 5.), xycoords='axes points')
        return fig

    def display(self, state, world, e=0):
        return self.plot_state(self.state(state, world, e))
