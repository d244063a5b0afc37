"""Scene compilation: geometries -> padded device Scenery.

Counterpart of the reference's ``megastep/scene.py`` plus the C++ ``Scenery`` struct
(``/root/reference/megastep/src/common.h:185-214``). Where the reference packs per-env
variable-length walls/lights/texels into ragged arrays with a custom CUDA accessor,
the TPU-native design compiles them into **fixed-shape padded arrays with width
masks** — XLA requires static shapes, and padding turns the whole env batch into a
handful of dense HBM arrays addressed by precomputed index maps (SURVEY.md §7).

Layout invariant (same as the reference, ``kernels.cu:203`` / ``scene.py:83``): the
first ``n_agents * len(model)`` line slots of every env are the *dynamic* agent-model
lines, rewritten from agent poses each render; the static walls follow. Texels are
packed line-major, so the dynamic lines' texels are the first ``n_dynamic_texels``
texels of every env — re-baked each frame for live lighting of moving agents.
"""
import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from . import constants
from .arrdict import arrdict, postpad
from .dotdict import dotdict

# Ten bland colors (the reference's palette, scene.py:10-20).
COLORS = [
    "#c185ae", "#73a171", "#5666a4", "#9f7c4a", "#809cd5",
    "#566e40", "#8e537b", "#4f9fa4", "#b56d66", "#5a728c"]


def _to_rgb(spec):
    """Hex/named/grey-level color to an RGB triple (pure-numpy stand-in for
    matplotlib.colors.to_rgb, to keep the hot path import-light)."""
    if spec.startswith('#'):
        return np.array([int(spec[i:i + 2], 16) / 255 for i in (1, 3, 5)])
    named = {'g': (0., .5, 0.), 'r': (1., 0., 0.)}
    if spec in named:
        return np.array(named[spec])
    return np.full(3, float(spec))


def lengths(lines):
    return ((lines[..., 0, :] - lines[..., 1, :])**2).sum(-1)**.5


def agent_model():
    """The agent's octagonal body as an (8, 2, 2) array of line segments, scaled to
    the agent width (reference ``scene.py:25-33``)."""
    corners = [
        [-.5, -1.], [+.5, -1.],
        [+1., -.5], [+1., +.5],
        [+.5, +1.], [-.5, +1.],
        [-1., +.5], [-1., -.5]]
    n = len(corners)
    walls = [[corners[i], corners[(i + 1) % n]] for i in range(n)]
    return constants.AGENT_WIDTH / 2 * np.array(walls)


def agent_colors():
    """Per-edge colors of the agent model: grey flanks, green tail, red nose."""
    k, g, r = '.25', 'g', 'r'
    colors = (k, g, k, r, k, r, k, g)
    return np.stack([_to_rgb(s) for s in colors])


def resolutions(lines):
    """Texel count per line: one texel per 5 cm, rounded up (``scene.py:40-41``)."""
    return np.maximum(np.ceil(lengths(lines) / constants.TEXTURE_RES).astype(int), 1)


def texel_sizes(geometries, n_agents=1):
    """Exact per-geometry texel count (dynamic agent-model texels + wall
    texels) — the sort key for size-bucketed batching: ordering scenes by this
    before :func:`scenery` lets the fused observe run each contiguous bucket
    padded only to *its* max (``ops.fused.size_groups``), instead of every env
    paying for the global worst case."""
    dyn = int(resolutions(np.tile(agent_model(), (n_agents, 1, 1))).sum())
    return np.array([dyn + int(resolutions(
        np.asarray(g['walls'], dtype=float)).sum()) for g in geometries])


def size_order(geometries, n_agents=1):
    """Stable ascending argsort of :func:`texel_sizes` — the permutation envs
    apply to their scene list (``env.scene_order``): env/scene ``i`` uses
    ``geometries[env.scene_order[i]]`` of the caller's original list."""
    return np.argsort(texel_sizes(geometries, n_agents), kind='stable')


def size_widths(geometries, n_agents=1):
    """The ``(lines_width, tex_width)`` arrays a :func:`scenery` build of this
    list would record, computed from the geometry list alone (cheap numpy, no
    textures): line count = dynamic agent-model slots + walls, texel count =
    :func:`texel_sizes`. Lets every host of a multi-process build compute the
    globally-agreed size-bucket spec
    (:func:`megastep_tpu.ops.fused.sharded_size_groups`) without building any
    remote shard's textures (``parallel.host``)."""
    n_dyn = n_agents * len(agent_model())
    lw = np.array([n_dyn + len(np.asarray(g['walls'])) for g in geometries])
    return lw, texel_sizes(geometries, n_agents)


def striped_order(geometries, n_agents=1, n_shards=1):
    """:func:`size_order`, striped over ``n_shards`` contiguous env-axis shards
    (a device mesh's per-device blocks): env ``s * n_local + p`` gets the scene
    of global size rank ``p * n_shards + s``, so every shard's local sequence
    is ascending in texel count AND the union of all shards' local rows
    ``[g0, g1)`` is exactly the global rank range ``[g0 * S, g1 * S)`` — the
    property that makes per-shard size buckets
    (:func:`megastep_tpu.ops.fused.sharded_size_groups`) pad to the same
    maxima as a global sort would, on every shard, in one SPMD program."""
    order = size_order(geometries, n_agents)
    N = len(order)
    if n_shards <= 1:
        return order
    assert N % n_shards == 0, (N, n_shards)
    n_local = N // n_shards
    idx = np.arange(N)
    return order[(idx % n_local) * n_shards + idx // n_local]


def sort_by_size(geometries, n_agents=1):
    """Stable-sorts a geometry list by :func:`texel_sizes` (ascending). Scene
    order carries no semantics — scenes are independent iid samples — so envs
    sort at build time to enable size-bucketed observe batching."""
    return [geometries[i] for i in size_order(geometries, n_agents)]


def wall_pattern(n, l=.5, random=np.random):
    """A random piecewise-constant brightness pattern giving walls depth cues
    (``scene.py:43-48``)."""
    p = constants.TEXTURE_RES / l
    jumps = random.choice(np.array([0., 1.]), p=np.array([1 - p, p]), size=n)
    jumps = jumps * random.normal(size=n)
    return .5 + .5 * (jumps.cumsum() % 1)


def init_textures(agentlines, agentcolors, walls, random=np.random):
    """Per-texel linear-RGB colors for one env: agent edges use their fixed colors,
    walls cycle the palette, and a random brightness pattern is multiplied in
    (``scene.py:50-68``)."""
    colormap = np.array([_to_rgb(c) for c in COLORS])
    wallcolors = colormap[np.arange(len(walls)) % len(colormap)]
    colors = np.concatenate([agentcolors, wallcolors])

    texwidths = resolutions(np.concatenate([agentlines, walls]))
    starts = texwidths.cumsum() - texwidths

    indices = np.full(texwidths.sum(), 0)
    indices[starts] = 1
    indices = np.cumsum(indices) - 1
    textures = constants.gamma_decode(colors[indices])

    pattern = wall_pattern(textures.shape[0], random=random)
    pattern[:texwidths[:len(agentlines)].sum()] = 1.
    textures = textures * pattern[:, None]

    return textures, texwidths


def random_lights(lights, random=np.random):
    """Appends a random U(0.5, 2) intensity column to (K, 2) light positions."""
    return np.concatenate([lights, random.uniform(.5, 2., (len(lights), 1))], -1)


def _round_up(x, m):
    return int(-(-x // m) * m)


@struct.dataclass
class Scenery:
    """The static scene of a batch of environments, as padded device arrays.

    All per-env variable-length data is padded to batch-max sizes with ``*_width``
    arrays recording true extents. ``baked`` holds the precomputed light intensity of
    every texel. Registered as a flax struct, so a Scenery flows through jit/vmap and
    shards over a device mesh like any pytree.
    """
    lines: jax.Array            # (N, Lmax, 2, 2) f32
    lines_width: jax.Array      # (N,) i32 — true line count incl. dynamic slots
    lights: jax.Array           # (N, Kmax, 3) f32 — x, y, intensity
    lights_width: jax.Array     # (N,) i32
    textures: jax.Array         # (N, Tmax, 3) f32 — linear RGB texels, line-major
    tex_width: jax.Array        # (N,) i32 — true texel count
    baked: jax.Array            # (N, Tmax) f32 — baked illumination per texel
    line_tex_starts: jax.Array  # (N, Lmax) i32 — first texel of each line
    line_tex_widths: jax.Array  # (N, Lmax) i32 — texel count of each line
    tex_line: jax.Array         # (N, Tmax) i32 — owning line of each texel
    model: jax.Array            # (M, 2, 2) f32 — shared agent body model
    n_agents: int = struct.field(pytree_node=False)
    n_dynamic_texels: int = struct.field(pytree_node=False)

    @property
    def n_envs(self):
        return self.lines.shape[0]

    @property
    def n_model_lines(self):
        return self.model.shape[0]

    @property
    def n_dynamic(self):
        """Number of leading line slots holding dynamic agent-model lines."""
        return self.n_agents * self.model.shape[0]

    def env_slice(self, g0, g1):
        """View of envs ``[g0, g1)`` — every per-env field sliced, shared/static
        fields untouched. Used by size-bucketed per-group computation
        (``ops.fused.size_groups``)."""
        per_env = ('lines', 'lines_width', 'lights', 'lights_width',
                   'textures', 'tex_width', 'baked', 'line_tex_starts',
                   'line_tex_widths', 'tex_line')
        return self.replace(**{f: getattr(self, f)[g0:g1] for f in per_env})

    @property
    def line_mask(self):
        return jnp.arange(self.lines.shape[1])[None] < self.lines_width[:, None]

    @property
    def light_mask(self):
        return jnp.arange(self.lights.shape[1])[None] < self.lights_width[:, None]

    @property
    def tex_mask(self):
        return jnp.arange(self.textures.shape[1])[None] < self.tex_width[:, None]

    def state(self, e):
        """Snapshot of env ``e`` with padding trimmed, as a numpy arrdict — the
        plotting-friendly counterpart of the reference ``Scenery::state``
        (``src/wrappers.cpp:122-145``)."""
        L = int(self.lines_width[e])
        T = int(self.tex_width[e])
        return arrdict(
            model=np.asarray(self.model),
            lines=np.asarray(self.lines[e, :L]),
            lights=np.asarray(self.lights[e, :int(self.lights_width[e])]),
            textures=arrdict(
                vals=np.asarray(self.textures[e, :T]),
                widths=np.asarray(self.line_tex_widths[e, :L])),
            baked=arrdict(
                vals=np.asarray(self.baked[e, :T]),
                widths=np.asarray(self.line_tex_widths[e, :L])))


def padded_sizes(geometries, n_agents=1):
    """The padded (Lmax, Kmax, Tmax) this geometry list compiles to, computed
    without building any textures — cheap enough to run over the *global* list
    on every host so that per-host scenery shards (``pad_to=``) agree on shape
    (SURVEY §7 step 10's per-host geometry sharding)."""
    n_dyn = n_agents * len(agent_model())
    dyn_tex = int(resolutions(np.tile(agent_model(), (n_agents, 1, 1))).sum())
    Lmax = Kmax = Tmax = 1
    for g in geometries:
        walls = np.asarray(g['walls'], dtype=float)
        Lmax = max(Lmax, n_dyn + len(walls))
        Kmax = max(Kmax, len(g['lights']))
        Tmax = max(Tmax, dyn_tex + int(resolutions(walls).sum()))
    return _round_up(Lmax, 16), _round_up(Kmax, 4), _round_up(Tmax, 128)


def scenery(geometries, n_agents=1, random=None, bake_fn='auto', pad_to=None):
    """Compiles a list of geometries into a single padded :class:`Scenery` and bakes
    the static lighting.

    Counterpart of the reference's ``scene.scenery()`` (``scene.py:76-100``): one
    host-side numpy pass builds textures/lights/lines per env, pads them to common
    shapes, uploads once, and runs the bake.

    :param geometries: list of geometry dotdicts (walls, lights, masks, res).
    :param n_agents: agents per env; their model lines head each env's line array.
    :param random: numpy RandomState for texture patterns and light intensities.
    :param bake_fn: 'auto' to run the standard bake, None to leave ``baked`` as ones.
    :param pad_to: optional (Lmax, Kmax, Tmax) from :func:`padded_sizes` — pass the
        global list's sizes when building a per-host shard so shards agree.
    """
    random = np.random if random is None else random
    agentlines = np.tile(agent_model(), (n_agents, 1, 1))
    acolors = np.tile(agent_colors(), (n_agents, 1))

    per_env = []
    for g in geometries:
        lights = random_lights(np.asarray(g['lights'], dtype=float), random)
        lines = np.concatenate([agentlines, np.asarray(g['walls'], dtype=float)])
        textures, texwidths = init_textures(agentlines, acolors, np.asarray(g['walls'], dtype=float), random)
        per_env.append((lights, lines, textures, texwidths))

    N = len(per_env)
    if pad_to is None:
        Lmax = _round_up(max(len(p[1]) for p in per_env), 16)
        Kmax = _round_up(max(max(len(p[0]) for p in per_env), 1), 4)
        Tmax = _round_up(max(len(p[2]) for p in per_env), 128)
    else:
        Lmax, Kmax, Tmax = pad_to
        assert Lmax >= max(len(p[1]) for p in per_env), 'pad_to Lmax too small'
        assert Kmax >= max(len(p[0]) for p in per_env), 'pad_to Kmax too small'
        assert Tmax >= max(len(p[2]) for p in per_env), 'pad_to Tmax too small'

    lines = np.zeros((N, Lmax, 2, 2), np.float32)
    lines_width = np.zeros(N, np.int32)
    lights = np.zeros((N, Kmax, 3), np.float32)
    lights_width = np.zeros(N, np.int32)
    textures = np.zeros((N, Tmax, 3), np.float32)
    tex_width = np.zeros(N, np.int32)
    line_tex_starts = np.zeros((N, Lmax), np.int32)
    line_tex_widths = np.zeros((N, Lmax), np.int32)
    tex_line = np.zeros((N, Tmax), np.int32)

    for n, (K, L, tex, texw) in enumerate(per_env):
        lines[n, :len(L)] = L
        lines_width[n] = len(L)
        lights[n, :len(K)] = K
        lights_width[n] = len(K)
        textures[n, :len(tex)] = tex
        tex_width[n] = len(tex)
        starts = texw.cumsum() - texw
        line_tex_starts[n, :len(L)] = starts
        line_tex_widths[n, :len(L)] = texw
        owner = np.zeros(len(tex), np.int32)
        owner[starts] = 1
        tex_line[n, :len(tex)] = owner.cumsum() - 1

    n_dynamic_texels = int(resolutions(agentlines).sum())

    scn = Scenery(
        lines=jnp.asarray(lines),
        lines_width=jnp.asarray(lines_width),
        lights=jnp.asarray(lights),
        lights_width=jnp.asarray(lights_width),
        textures=jnp.asarray(textures),
        tex_width=jnp.asarray(tex_width),
        baked=jnp.ones((N, Tmax), jnp.float32),
        line_tex_starts=jnp.asarray(line_tex_starts),
        line_tex_widths=jnp.asarray(line_tex_widths),
        tex_line=jnp.asarray(tex_line),
        model=jnp.asarray(agent_model().astype(np.float32)),
        n_agents=n_agents,
        n_dynamic_texels=n_dynamic_texels)

    if bake_fn == 'auto':
        from .ops import bake
        scn = bake.bake(scn)
    return scn


def display(scn, e=0):
    """Plots the scenery of env ``e``."""
    import matplotlib.pyplot as plt
    from . import plotting
    ax = plt.axes()
    state = arrdict(scenery=scn.state(e))
    plotting.plot_lines(ax, state, zoom=False)
    plotting.plot_lights(ax, state)
    plotting.adjust_view(ax, state, zoom=False)
    return ax.figure
