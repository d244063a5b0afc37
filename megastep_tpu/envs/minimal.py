"""A minimal environment: box world, RGB observations, simple movement.

Counterpart of the reference ``megastep/demo/envs/minimal.py:7-52`` — the template to
copy when building your own environment.
"""
import jax
import jax.numpy as jnp

from .. import core, modules, scene, toys
from ..arrdict import arrdict, numpyify
from ..dotdict import dotdict
from ..pytree import pytree


@pytree('core', 'spawner', 'rgb', 'movement')
class Minimal:
    """A box env with depth observations and simple movement. A good foundation for
    building your own environments.

    :var obs_space: the observation space presented to the network.
    :var action_space: the action space presented to the network.
    """

    def __init__(self, n_envs=1):
        geometries = n_envs * [toys.box()]
        scenery = scene.scenery(geometries, n_agents=1)
        self.core = core.Core(scenery)
        self.spawner = modules.RandomSpawns(geometries, self.core)
        self.rgb = modules.RGB(self.core)
        self.movement = modules.SimpleMovement(self.core)

        self.obs_space = self.rgb.space
        self.action_space = self.movement.space

    @property
    def n_envs(self):
        return self.core.n_envs

    def reset(self, key):
        """Spawns all agents. Returns ``(state, world)``."""
        agents = self.spawner(
            self.core.init_agents(), self.core.agent_full(True), key)
        state = arrdict(agents=agents, progress=self.core.agent_full(1.))
        return state, arrdict(obs=self.rgb(agents=agents))

    def step(self, state, decision, key):
        """Moves agents by ``decision.actions`` and re-observes.
        Returns ``(state, world)``."""
        agents, progress = self.movement(state.agents, decision)
        state = arrdict(agents=agents, progress=progress)
        return state, arrdict(obs=self.rgb(agents=agents))

    def state(self, state, world, e=0):
        """Numpy snapshot of env ``e`` for plotting."""
        return dotdict(
            core=self.core.state(state.agents, state.progress, e),
            rgb=numpyify(world.obs[e]))

    @classmethod
    def plot_state(cls, state):
        import matplotlib.pyplot as plt
        fig = plt.figure()
        gs = plt.GridSpec(1, 3, fig)
        plan = plt.subplot(gs[:, :2])
        core.Core.plot_state(state.core, plan)
        im = plt.subplot(gs[:, -1])
        modules.RGB.plot_state(state.rgb, [im])
        return fig

    def display(self, state, world, e=0):
        return self.plot_state(self.state(state, world, e))
