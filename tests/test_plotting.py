"""Pins `megastep_tpu.plotting` behavior: texel-segment geometry, image
stacking, and the full display paths (Core.plot_state, env.display)."""
import matplotlib
matplotlib.use('Agg')

import numpy as np
import pytest

from megastep_tpu import core, plotting, scene, toys


@pytest.fixture(scope='module')
def box_state():
    scn = scene.scenery([toys.box()], n_agents=1,
                        random=np.random.RandomState(3))
    c = core.Core(scn, res=32, fov=130, fps=10)
    agents = c.init_agents()
    return c.state(agents, np.ones((1, 1)), 0)


def test_line_arrays_geometry(box_state):
    segments, colors = plotting.line_arrays(box_state)
    scenery = box_state.scenery
    widths = np.asarray(scenery.textures.widths)
    assert len(segments) == len(colors) == widths.sum()

    # Each line's texel chain starts at its first endpoint, ends at its second,
    # and is contiguous.
    starts = widths.cumsum() - widths
    for i in range(len(widths)):
        chain = segments[starts[i]:starts[i] + widths[i]]
        np.testing.assert_allclose(chain[0, 0], scenery.lines[i, 0], atol=1e-12)
        np.testing.assert_allclose(chain[-1, 1], scenery.lines[i, 1], atol=1e-12)
        np.testing.assert_allclose(chain[:-1, 1], chain[1:, 0], atol=1e-12)

    assert colors.min() >= 0 and colors.max() <= 1
    # The agent-model texels are drawn fully lit.
    n_dyn = plotting.n_agent_texels(scenery)
    expected = np.clip(
        scenery.textures.vals[:n_dyn] ** (1 / 2.2), 0, 1)  # gamma_encode
    np.testing.assert_allclose(colors[:n_dyn], expected, atol=1e-6)


def test_texel_frames_cover_unit_interval(box_state):
    scenery = box_state.scenery
    owner, f0, f1 = plotting.texel_frames(scenery)
    widths = np.asarray(scenery.textures.widths)
    assert owner.max() == len(widths) - 1
    # Fractions tile [0, 1] exactly per line.
    for i in (0, len(widths) - 1):
        sel = owner == i
        assert f0[sel][0] == 0 and f1[sel][-1] == pytest.approx(1)
        np.testing.assert_allclose(f1[sel][:-1], f0[sel][1:])


def test_imshow_arrays_stacks_channel_sets():
    rgb = np.random.rand(2, 3, 1, 8)
    depth = np.random.rand(2, 1, 1, 8)
    ims = plotting.imshow_arrays({'rgb': rgb, 'd': depth})
    assert set(ims) == {0, 1}
    assert ims[0].shape == (2, 8, 3)  # two rows stacked along H
    # Depth is broadcast, not gamma-encoded.
    np.testing.assert_allclose(ims[1][1, :, 0], depth[1, 0, 0])
    np.testing.assert_allclose(ims[0][0], plotting._as_rgb(rgb[0]).transpose(1, 2, 0)[0])


def test_plot_state_smoke(box_state):
    ax = core.Core.plot_state(box_state)
    # One LineCollection (walls) + one EllipseCollection (lights).
    kinds = {type(c).__name__ for c in ax.collections}
    assert 'LineCollection' in kinds
    assert len(ax.patches) >= 1  # the FOV wedge
    l, r = ax.get_xlim()
    assert r > l


def test_plot_poses_smoke():
    from megastep_tpu.dotdict import dotdict
    poses = dotdict(angles=np.array([0., 90.]),
                    positions=np.array([[0., 0.], [1., 1.]]))
    import matplotlib.pyplot as plt
    _, ax = plt.subplots()
    ax = plotting.plot_poses(poses, ax=ax, radians=False)
    assert len(ax.collections) == 2
