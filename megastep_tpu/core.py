"""The Core: static simulation config + scenery + the state pytrees they act on.

Counterpart of the reference ``megastep/core.py`` and the C++ ``Agents`` struct
(``/root/reference/megastep/src/common.h:162-177``). Where the reference Core owns
mutable CUDA tensors advanced in place, the TPU Core is an immutable flax-struct of
(scenery, render/physics config); agent state is a separate arrdict pytree threaded
through the pure :meth:`physics` and :meth:`render` steps — the shape demanded by
``jit``/``lax.scan`` and by sharding the whole env batch over a device mesh.

Conventions (identical to the reference): angles in degrees, positions in meters,
``fps`` simulation steps per second, observations are linear RGB in [0, 1] that need
:func:`~megastep_tpu.constants.gamma_encode` for display; infinity renders black.
"""
import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from . import constants
from .arrdict import arrdict, clone
from .dotdict import dotdict
from .scene import Scenery
from .ops import physics as _physics, render as _render

# Re-exported for parity with the reference's core module.
AGENT_WIDTH = constants.AGENT_WIDTH
TEXTURE_RES = constants.TEXTURE_RES
AGENT_RADIUS = constants.AGENT_RADIUS
gamma_encode = constants.gamma_encode
gamma_decode = constants.gamma_decode


def init_agents(n_envs, n_agents, dtype=jnp.float32):
    """Zero-initialized agent state: ``angles`` (N, A) deg, ``positions`` (N, A, 2) m,
    ``angvelocity`` (N, A) deg/s, ``velocity`` (N, A, 2) m/s."""
    return arrdict(
        angles=jnp.zeros((n_envs, n_agents), dtype),
        positions=jnp.zeros((n_envs, n_agents, 2), dtype),
        angvelocity=jnp.zeros((n_envs, n_agents), dtype),
        velocity=jnp.zeros((n_envs, n_agents, 2), dtype))


@struct.dataclass
class Core:
    """The core physics and rendering interface.

    :var scenery: the compiled :class:`~megastep_tpu.scene.Scenery`.
    :var res: horizontal resolution of observations (pixels).
    :var fov: field of view, degrees (< 180).
    :var fps: simulation step rate.
    :var agent_radius: disc radius of each agent, meters.
    """
    scenery: Scenery
    res: int = struct.field(pytree_node=False, default=64)
    fov: float = struct.field(pytree_node=False, default=130.)
    fps: float = struct.field(pytree_node=False, default=10.)
    agent_radius: float = struct.field(pytree_node=False, default=AGENT_RADIUS)

    def __post_init__(self):
        assert self.fov < 180, 'FOV should be less than 180°'

    @property
    def n_envs(self):
        return self.scenery.n_envs

    @property
    def n_agents(self):
        return self.scenery.n_agents

    @property
    def half_screen_width(self):
        """tan(fov/2) — the screen extent at unit depth (``kernels.cu:22``)."""
        return float(np.tan(np.pi / 180 * self.fov / 2))

    def init_agents(self):
        return init_agents(self.n_envs, self.n_agents)

    def physics(self, agents):
        """Collision-resolved motion step. Returns ``(new_agents, progress)``;
        ``progress < 1`` marks a collision (see ``ops.physics``)."""
        return _physics.physics(self.scenery, agents, self.fps, self.agent_radius)

    def render(self, agents, **kwargs):
        """Raycast render pass. Returns an arrdict of
        ``indices/locations/dots/distances/screen`` (see ``ops.render``)."""
        return _render.render(self.scenery, agents, self.res,
                              self.half_screen_width, self.agent_radius, **kwargs)

    def env_full(self, x):
        """An (n_envs,)-array full of ``x`` (convenience, reference ``core.py:136-142``)."""
        dtypes = {bool: jnp.bool_, int: jnp.int32, float: jnp.float32}
        return jnp.full((self.n_envs,), x, dtype=dtypes[type(x)])

    def agent_full(self, x):
        """An (n_envs, n_agents)-array full of ``x``."""
        dtypes = {bool: jnp.bool_, int: jnp.int32, float: jnp.float32}
        return jnp.full((self.n_envs, self.n_agents), x, dtype=dtypes[type(x)])

    def state(self, agents, progress, e=0):
        """Numpy snapshot of env ``e`` for plotting (counterpart of
        ``core.py:91-122``)."""
        return dotdict(
            n_envs=self.n_envs, n_agents=self.n_agents, res=self.res, fov=self.fov,
            agent_radius=self.agent_radius, fps=self.fps,
            scenery=self.scenery.state(e),
            agents=arrdict(
                angles=np.asarray(agents.angles[e]),
                positions=np.asarray(agents.positions[e])),
            progress=np.asarray(progress[e]))

    @classmethod
    def plot_state(cls, state, ax=None, zoom=False):
        import matplotlib.pyplot as plt
        from . import plotting
        ax = ax or plt.axes()
        plotting.plot_lines(ax, state, zoom=zoom)
        plotting.plot_lights(ax, state)
        plotting.adjust_view(ax, state, zoom=zoom)
        plotting.plot_fov(ax, state)
        ax.set_xticks([])
        ax.set_yticks([])
        return ax
