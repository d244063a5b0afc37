"""Env-building modules: movement systems, observers, and lifecycle helpers.

Counterpart of the reference ``megastep/modules.py`` (``/root/reference/megastep/
modules.py:24-381``), redesigned functionally: a module object holds only *static*
configuration (action tables, spawn tables, scales), and its ``__call__`` is a pure
function ``(state, ...) -> (new_state, out)`` — no tensor is ever mutated. That makes
every module directly composable under ``jit``/``vmap``/``lax.scan`` and shardable
over a device mesh, where the reference's in-place writes into ``core.agents`` forced
a host-ordered mutation sequence.

Randomness is threaded through explicit ``jax.random`` keys instead of the
reference's hidden ``torch.randint_like`` global state.
"""
import numpy as np
import jax
import jax.numpy as jnp

from . import spaces, geometry
from .arrdict import arrdict, jaxify, stack
from .ops import geom
from .pytree import pytree

to_local_frame = geom.to_local_frame
to_global_frame = geom.to_global_frame

# noop, forward/backward, strafe left/right, turn left/right — the reference's
# seven-action basis (modules.py:45-46).
_VELOCITY_BASIS = np.array(
    [[0., 0.], [0., 1.], [0., -1.], [1., 0.], [-1., 0.], [0., 0.], [0., 0.]])
_ANGVELOCITY_BASIS = np.array([0., 0., 0., 0., 0., +1., -1.])


@pytree('core', '_actionset')
class SimpleMovement:
    """A momentum-free movement system: seven discrete actions set the velocity
    directly (reference ``modules.py:24-66``).

    :var space: the action space to present to the controlling network.
    """

    def __init__(self, core, speed=10, ang_speed=180, n_agents=None):
        self.core = core
        self._actionset = arrdict(
            velocity=jnp.asarray(speed / core.fps * _VELOCITY_BASIS, jnp.float32),
            angvelocity=jnp.asarray(ang_speed / core.fps * _ANGVELOCITY_BASIS, jnp.float32))
        self.space = spaces.MultiDiscrete(n_agents or core.n_agents, 7)

    def __call__(self, agents, decision):
        """Sets agent (angular) velocity from ``decision.actions`` and steps the
        physics. Returns ``(new_agents, progress)``."""
        delta = self._actionset[decision.actions.astype(jnp.int32)]
        agents = type(agents)(
            angles=agents.angles,
            positions=agents.positions,
            angvelocity=delta.angvelocity,
            velocity=to_global_frame(agents.angles, delta.velocity))
        return self.core.physics(agents)


@pytree('core', '_actionset')
class MomentumMovement:
    """A movement system *with* momentum: actions apply acceleration on top of
    decayed velocity (reference ``modules.py:68-118``).

    :var space: the action space to present to the controlling network.
    :var decay: multiplicative velocity decay per timestep.
    """

    def __init__(self, core, accel=5, ang_accel=180, decay=.125, n_agents=None):
        self.core = core
        self._actionset = arrdict(
            velocity=jnp.asarray(accel / core.fps * _VELOCITY_BASIS, jnp.float32),
            angvelocity=jnp.asarray(ang_accel / core.fps * _ANGVELOCITY_BASIS, jnp.float32))
        self.decay = decay
        self.space = spaces.MultiDiscrete(n_agents or core.n_agents, 7)

    def __call__(self, agents, decision):
        """Composes decayed velocity with this step's acceleration and steps the
        physics. Returns ``(new_agents, progress)``."""
        delta = self._actionset[decision.actions.astype(jnp.int32)]
        agents = type(agents)(
            angles=agents.angles,
            positions=agents.positions,
            angvelocity=(1 - self.decay) * agents.angvelocity + delta.angvelocity,
            velocity=(1 - self.decay) * agents.velocity
                     + to_global_frame(agents.angles, delta.velocity))
        return self.core.physics(agents)


def render(core, agents, **kwargs):
    """Renders and reshapes for convolution stacks: adds the height-1 axis, and
    permutes ``screen`` to (n_envs, n_agents, channels, 1, res) — the layout conv
    modules expect (reference ``modules.py:126-136``)."""
    r = core.render(agents, **kwargs)
    r = arrdict({k: v[:, :, None] for k, v in r.items()})
    r['screen'] = r.screen.transpose(0, 1, 4, 2, 3)
    return r


def on_tpu():
    return jax.default_backend() == 'tpu'


def use_fused(flag):
    """The fused-observe dispatch policy shared by the envs: an explicit flag
    wins; ``None`` means "when running on TPU"."""
    return on_tpu() if flag is None else flag


def pool_mean(x, subsample, dot=None):
    """Mean-pools the trailing axis by ``subsample``, as either the reshape +
    trailing-axis reduce or one (R, R/s) MXU product against a fixed 1/s
    pooling matrix.

    Which wins is context-dependent (both chip-measured 2026-08-19): on a
    single-agent observe the kernel outputs reach the pool as plain reshapes
    and the MXU product wins big (Explorer 2.14M → 2.28M steps/s); on a
    multi-agent observe the pool's input is a (NB, A, E, ·) transpose that
    XLA fuses the *reduce* into for free, and forcing a dot materializes the
    transpose first (Deathmatch 1.27M → 1.25M). ``dot=None`` picks the dot
    on TPU when axis 1 (the agent axis) is 1. The dot accumulates the s taps
    in a different order than the reduce (~1-ulp drift; the products are
    exact — 1/s is a power-of-two scale and HIGHEST splits are lossless), so
    the CPU *default* — the reference path — reduces; an explicit ``dot=True``
    is honored on any backend so the production TPU path has a CPU unit test
    pinning it against the reduce (tests/test_modules.py)."""
    s = subsample
    if dot is None:
        dot = on_tpu() and x.ndim >= 2 and x.shape[1] == 1
    if s == 1 or not dot:
        return downsample(x, s).mean(-1)
    R = x.shape[-1]
    i = jax.lax.broadcasted_iota(jnp.int32, (R, R // s), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (R, R // s), 1)
    pool = jnp.where(i // s == j, 1. / s, 0.)
    y = jnp.dot(x.reshape(-1, R), pool,
                precision=jax.lax.Precision.HIGHEST)
    return y.reshape(*x.shape[:-1], R // s)


def fused_obs(out, subsample, agent_radius, max_depth):
    """Builds the (rgb, depth) observation pair from a fused-kernel observe
    result (``ops.fused.observe``): pooled linear RGB (n, a, 3, 1, res/s) and
    clipped depth (n, a, 1, 1, res/s) — one shared implementation for every
    env using the fused path (the depth formula mirrors :class:`Depth`)."""
    rgb = pool_mean(out.screen, subsample)[:, :, :, None, :]
    depth = 1 - jnp.clip((out.distances - agent_radius) / max_depth, 0, 1)
    d = pool_mean(depth, subsample)[:, :, None, None, :]
    return rgb, d


def fused_obs_raw(raw, subsample, agent_radius, max_depth, res):
    """:func:`fused_obs` on the kernel's RAW (NB, A, E, ·) block layout — the
    body of an ``ops.fused.observe(epilogue=...)`` hook: pooling here runs
    before the multi-agent transpose and the size-group concat, so only
    ``1/subsample`` of the data rides either (the full-res copies were ~1.5
    ms/step at the Deathmatch 16k config). Pooled values are bit-identical to
    :func:`fused_obs` of the transposed outputs: the reduce is per env row,
    and ``pool_mean``'s agent-axis auto rule sees the same ``A`` at axis 1.

    :param raw: arrdict with ``screen`` (NB, A, E, 3·res) (channels at static
        lane offsets) and ``distances`` (NB, A, E, res).
    :return: ``(rgb, d)`` — (NB, A, E, 3, res/s) and (NB, A, E, res/s).
    """
    scr = raw.screen.reshape(*raw.screen.shape[:-1], 3, res)   # free split
    rgb = pool_mean(scr, subsample)
    depth = 1 - jnp.clip((raw.distances - agent_radius) / max_depth, 0, 1)
    d = pool_mean(depth, subsample)
    return rgb, d


def downsample(screen, subsample):
    """Factors the final width dimension into (width/subsample, subsample); chase
    with a mean/min/max over the trailing axis (reference ``modules.py:138-145``)."""
    return screen.reshape(*screen.shape[:-1], screen.shape[-1] // subsample, subsample)


@pytree('core')
class Depth:
    """Depth observations in [0, 1]: 1 at the near plane, 0 at ``max_depth`` meters
    (reference ``modules.py:147-189``).

    :var space: the observation space to present to the controlling network.
    """

    def __init__(self, core, n_agents=None, subsample=1, max_depth=10):
        n_agents = n_agents or core.n_agents
        self.core = core
        self.space = spaces.MultiImage(n_agents, 1, 1, core.res // subsample)
        self.max_depth = max_depth
        self.subsample = subsample

    def __call__(self, r=None, agents=None):
        """Returns an (n_env, n_agent, 1, 1, res)-tensor of depths. Pass ``r`` (the
        output of :func:`render`) to reuse an existing render."""
        r = render(self.core, agents) if r is None else r
        depth = 1 - jnp.clip((r.distances - self.core.agent_radius) / self.max_depth, 0, 1)
        return downsample(depth, self.subsample).mean(-1)[:, :, :, None]


@pytree('core')
class RGB:
    """Linear-RGB observations in [0, 1]; :func:`~megastep_tpu.constants.gamma_encode`
    before display (reference ``modules.py:191-238``).

    :var space: the observation space to present to the controlling network.
    """

    def __init__(self, core, n_agents=None, subsample=1):
        n_agents = n_agents or core.n_agents
        self.core = core
        self.space = spaces.MultiImage(n_agents, 3, 1, core.res // subsample)
        self.subsample = subsample

    def __call__(self, r=None, agents=None):
        """Returns an (n_env, n_agent, 3, 1, res)-tensor. Pass ``r`` to reuse an
        existing render."""
        r = render(self.core, agents) if r is None else r
        return downsample(r.screen, self.subsample).mean(-1)

    @classmethod
    def plot_state(cls, state, axes=None):
        """Plots a numpyified RGB observation with imshow."""
        import matplotlib.pyplot as plt
        from . import plotting
        n_agents = state.shape[0]
        axes = plt.subplots(n_agents, 1, squeeze=False) if axes is None else axes
        plotting.plot_images({'rgb': state}, axes)
        return axes


@pytree('core')
class IMU:
    """Inertial measurements: (angular velocity, medial velocity, lateral velocity)
    in the agent's local frame, scaled to ~[-1, 1] (reference ``modules.py:240-270``).

    :var space: the observation space to present to the controlling network.
    """

    def __init__(self, core, speed_scale=10., ang_scale=360., n_agents=None):
        self.core = core
        self.space = spaces.MultiVector(n_agents or core.n_agents, 3)
        self.speed_scale = speed_scale
        self.ang_scale = ang_scale

    def __call__(self, agents):
        return jnp.concatenate([
            agents.angvelocity[..., None] / self.ang_scale,
            to_local_frame(agents.angles, agents.velocity) / self.speed_scale], -1)


def random_empty_positions(geometries, n_agents, n_points, random=np.random):
    """Pre-samples ``n_points`` empty spawn points per (geometry, agent) from the
    occupancy masks, as an (n_geometries, n_agents, n_points, 2) float array
    (reference ``modules.py:272-293``). Host-side, done once at env build."""
    points = []
    for g in geometries:
        sample = np.stack((np.asarray(g.masks) > 0).nonzero(), -1)

        # There might be fewer open points than we're asking for.
        n_possible = min(len(sample) // n_agents, n_points)
        sample = sample[random.choice(np.arange(len(sample)), (n_possible, n_agents), replace=True)]

        # So repeat the sample until we've got enough.
        sample = np.concatenate([sample] * int(n_points / len(sample) + 1))[-n_points:]
        sample = random.permutation(sample)
        points.append(geometry.centers(sample, g.masks.shape, g.res).transpose(1, 0, 2))
    return np.stack(points)


@pytree('core', '_spawns')
class RandomSpawns:
    """Respawns masked agents at precomputed random empty locations with zeroed
    velocities (reference ``modules.py:295-326``).

    Spawn tables are precomputed on the host at construction; the per-step respawn is
    a pure gather keyed by an explicit PRNG key.
    """

    def __init__(self, geometries, core, n_spawns=100, random=None):
        self.core = core
        random = np.random.RandomState(1) if random is None else random
        positions = random_empty_positions(geometries, core.n_agents, n_spawns, random)
        angles = random.uniform(-180, +180, (len(geometries), core.n_agents, n_spawns))
        self._spawns = jaxify(arrdict(positions=positions, angles=angles))

    def __call__(self, agents, reset, key, onehot=None):
        """Returns a new agents pytree with the ``reset``-masked agents respawned.

        :param reset: (n_env, n_agent) bool mask.
        :param key: a jax PRNG key consumed to choose spawn slots.
        :param onehot: spawn-slot lookup strategy; ``None`` picks one-hot on
            TPU and the gather elsewhere. Explicit values are honored on any
            backend so a CPU unit test can pin the two paths equal
            (tests/test_modules.py), like ``pool_mean(dot=...)``.
        """
        n_spawns = self._spawns.angles.shape[-1]
        choices = jax.random.randint(key, reset.shape, 0, n_spawns)
        if on_tpu() if onehot is None else onehot:
            # One-hot select instead of take_along_axis: TPU emulates gathers
            # serially (~0.4 ms/step at 16k agent-envs on the profile — the
            # whole physics stage's dominant cost). Exactly one slot matches,
            # so the masked sum reproduces the gathered row bit-for-bit.
            oh = choices[..., None] == jnp.arange(n_spawns)        # (N, A, S)
            angles = jnp.where(oh, self._spawns.angles, 0.).sum(-1)
            positions = jnp.where(
                oh[..., None], self._spawns.positions, 0.).sum(-2)
        else:
            angles = jnp.take_along_axis(
                self._spawns.angles, choices[..., None], -1)[..., 0]
            positions = jnp.take_along_axis(
                self._spawns.positions, choices[..., None, None], -2)[..., 0, :]
        return type(agents)(
            angles=jnp.where(reset, angles, agents.angles),
            positions=jnp.where(reset[..., None], positions, agents.positions),
            angvelocity=jnp.where(reset, 0., agents.angvelocity),
            velocity=jnp.where(reset[..., None], 0., agents.velocity))


@pytree('core')
class RandomLifespans:
    """Randomized per-agent lifespans, for decorrelating otherwise-synchronous env
    batches (reference ``modules.py:328-381``).

    Functional: lifespan counters live in an explicit state arrdict created by
    :meth:`init_state` and threaded through ``__call__``.
    """

    def __init__(self, core, max_lifespan, min_lifespan=None):
        self.core = core
        self.min_lifespan = max_lifespan // 2 if min_lifespan is None else min_lifespan
        self.max_lifespan = max_lifespan

    def init_state(self, key):
        shape = (self.core.n_envs, self.core.n_agents)
        return arrdict(
            lifespans=jnp.zeros(shape, jnp.int32),
            max_lifespans=jax.random.randint(
                key, shape, self.min_lifespan, self.max_lifespan))

    def __call__(self, state, key, reset=None):
        """Increments time-lived; agents past their lifespan (or in ``reset``) get a
        True in the returned mask and a re-rolled lifespan.

        :return: ``(new_state, reset_mask)``.
        """
        lifespans = state.lifespans + 1
        reset = jnp.zeros_like(lifespans, bool) if reset is None else reset
        reset = (lifespans >= state.max_lifespans) | reset
        rerolled = jax.random.randint(
            key, lifespans.shape, self.min_lifespan, self.max_lifespan)
        new_state = arrdict(
            lifespans=jnp.where(reset, 0, lifespans),
            max_lifespans=jnp.where(reset, rerolled, state.max_lifespans))
        return new_state, reset

    def state(self, state, e):
        """Numpy snapshot of env ``e`` for plotting."""
        return arrdict(lifespan=np.asarray(state.lifespans[e]),
                       max_lifespan=np.asarray(state.max_lifespans[e]))
