"""Matplotlib rendering of env-state snapshots.

Counterpart of the reference ``megastep/plotting.py`` (``/root/reference/megastep/
plotting.py``), operating on the numpy state snapshots produced by
:meth:`megastep_tpu.core.Core.state` / :meth:`megastep_tpu.scene.Scenery.state`:
texel-colored wall segments, light discs, FOV wedges, pose discs, and horizontal
observation strips. Pure host-side matplotlib — nothing here touches the device.
"""
import numpy as np
import matplotlib as mpl
import matplotlib.pyplot as plt

from . import constants

VIEW_RADIUS = 5


def imshow_arrays(arrs, transpose=False):
    """Stacks ``{name: (A, C, H, W)}`` observation arrays into one displayable
    (H', W', 3) image per agent (reference ``plotting.py:12-30``)."""
    arrs = {k: v.transpose(0, 3, 1, 2) if transpose else v for k, v in arrs.items()}
    [A] = {v.shape[0] for v in arrs.values()}
    ims = {}
    for a in range(A):
        layers = []
        for k, v in arrs.items():
            layer = v[a].astype(float)
            if layer.shape[0] == 1:
                layer = layer.repeat(3, 0)
            else:
                layer = constants.gamma_encode(layer)
            layers.append(layer)
        ims[a] = np.concatenate(layers, 1).transpose(1, 2, 0)
    return ims


def plot_images(arrs, axes=None, aspect=1, **kwargs):
    """Plots per-agent observation strips, one row per channel-set
    (reference ``plotting.py:32-50``)."""
    ims = imshow_arrays(arrs, **kwargs)
    A = len(ims)
    H, W = ims[0].shape[:2]

    axes = plt.subplots(A, 1, squeeze=False)[1].flatten() if axes is None else axes

    aspect = aspect / min(A, 4) * W / H
    for a in range(A):
        ax = axes[a]
        ax.imshow(ims[a], aspect=aspect, interpolation='none')
        ax.set_yticks(np.arange(H))
        ax.set_ylim(H - .5, -.5)
        ax.set_yticklabels(arrs.keys())
        ax.set_xticks([])
        ax.set_title(f'agent #{a}', fontdict={'color': f'C{a}', 'weight': 'bold'})
    return axes


def n_agent_texels(scenery):
    """Texel count of the dynamic agent-model lines heading each env's line array."""
    A = scenery.n_agents if 'n_agents' in scenery else 1
    M = len(scenery.model)
    return int(scenery.textures.widths[:A * M].sum())


def line_arrays(state):
    """Splits every line into its per-texel segments and returns (segments, colors),
    where colors are the gamma-encoded baked-lit texel colors
    (reference ``plotting.py:57-78``)."""
    scenery = state.scenery
    widths = scenery.textures.widths
    starts = widths.cumsum() - widths

    owner = np.zeros(len(scenery.textures.vals), dtype=int)
    owner[starts] = 1
    owner = owner.cumsum() - 1
    offsets = np.arange(len(owner)) - starts[owner]

    f0 = offsets / widths[owner]
    f1 = (offsets + 1) / widths[owner]
    a, b = scenery.lines[owner, 0], scenery.lines[owner, 1]
    seg_starts = a * (1 - f0[:, None]) + b * f0[:, None]
    seg_ends = a * (1 - f1[:, None]) + b * f1[:, None]
    lines = np.stack([seg_starts, seg_ends], 1)

    baked = scenery.baked.vals.copy()
    baked[:n_agent_texels(scenery)] = 1.
    colors = constants.gamma_encode(scenery.textures.vals * baked[:, None])
    return lines, np.clip(colors, 0., 1.)


def plot_lights(ax, state):
    lights = state.scenery.lights
    if len(lights) == 0:
        return
    vmin = lights[:, 2].min() - 1e-2
    vmax = lights[:, 2].max()
    for light in lights:
        alpha = (light[2] - vmin) / (vmax - vmin)
        ax.add_patch(mpl.patches.Circle(light[:2], radius=.05, alpha=alpha, color='yellow'))


def extent(state, zoom, radius=VIEW_RADIUS):
    if zoom and 'agents' in state:
        r, t = state.agents.positions.max(0) + radius
        l, b = state.agents.positions.min(0) - radius
    else:
        r, t = state.scenery.lines.max(0).max(0) + 1
        l, b = state.scenery.lines.min(0).min(0) - 1

    w = max(t - b, r - l) / 2
    cx, cy = (r + l) / 2, (t + b) / 2
    return (cx - w, cx + w), (cy - w, cy + w)


def plot_lines(ax, state, zoom=True):
    lines, colors = line_arrays(state)
    (l, r), (b, t) = extent(state, zoom)
    xs, ys = lines[:, :, 0], lines[:, :, 1]
    mask = ((l < xs) & (xs < r) & (b < ys) & (ys < t)).any(-1)
    seen = mpl.collections.LineCollection(
        lines[mask], colors=colors[mask], linestyle='solid', linewidth=2)
    ax.add_collection(seen)


def adjust_view(ax, state, zoom=True):
    xs, ys = extent(state, zoom)
    ax.set_xlim(*xs)
    ax.set_ylim(*ys)
    ax.set_aspect(1)
    ax.set_facecolor('#c6c1b3')


def plot_wedge(ax, angle, position, distance, fov, radians=False, **kwargs):
    scale = 180 / np.pi if radians else 1
    left = scale * angle - fov / 2
    right = scale * angle + fov / 2
    width = distance - constants.AGENT_RADIUS
    wedge = mpl.patches.Wedge(position, distance, left, right, width=width, **kwargs)
    ax.add_patch(wedge)


def plot_fov(ax, state, distance=1, field='agents'):
    agents = state[field]
    for i in range(len(agents.angles)):
        plot_wedge(ax, agents.angles[i], agents.positions[i], distance, state.fov,
                   color=f'C{i}', alpha=.1)


def plot_poses(poses, ax=None, radians=True, color='C9', **kwargs):
    """Draws agents as circles with a heading tick (reference ``plotting.py:131-141``)."""
    ax = ax or plt.subplot()
    for angle, position in zip(poses.angles, poses.positions):
        ax.add_patch(mpl.patches.Circle(
            position, radius=constants.AGENT_RADIUS, edgecolor=color, facecolor=[0, 0, 0, 0]))
        scale = 1 if radians else np.pi / 180
        offset = constants.AGENT_RADIUS * np.array([np.cos(scale * angle), np.sin(scale * angle)])
        line = np.stack([position, position + offset])
        ax.plot(*line.T, color=color)
    return ax
