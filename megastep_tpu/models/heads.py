"""Space-driven network head factories.

Counterpart of the reference ``megastep/demo/heads.py:9-126``: :func:`intake` maps an
observation space to an encoder module producing a ``width``-dim feature, and
:func:`output` maps an action space to a decoder head producing (log-)policies.
Built on flax.linen; heads accept arbitrary leading batch dims (T, B, ...) and operate
on the trailing space dims, so one definition serves single steps and whole rollout
chunks.
"""
from collections.abc import Mapping

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..dotdict import dotdict


class MultiVectorIntake(nn.Module):
    """Encodes a (A, C) vector space: per-agent MLP, then a projection over the
    concatenated agents (reference ``heads.py:9-26``)."""
    space: object
    width: int

    @nn.compact
    def __call__(self, obs):
        A, C = self.space.shape
        lead = obs.shape[:-2]
        x = nn.relu(nn.Dense(self.width)(obs))
        x = x.reshape(*lead, A * self.width)
        return nn.relu(nn.Dense(self.width)(x))


class MultiImageIntake(nn.Module):
    """Encodes a (A, C, H, W) image space with the reference's 1-D conv stack —
    kernels 8/4/3, strides 4/2/2 (``heads.py:28-54``) — then a two-layer projection.

    Convolutions run in NHWC over a width axis of static size, so XLA lowers them to
    MXU-tiled matmuls.
    """
    space: object
    width: int

    @nn.compact
    def __call__(self, obs):
        A, C, H, W = self.space.shape
        lead = obs.shape[:-4]
        if obs.dtype == jnp.uint8:
            obs = obs / 255.

        # (T, B, ...) -> (B, T, ...) before the conv flatten: the learner's
        # minibatches arrive (time, env) with the env axis device-sharded on a
        # mesh, and merging batch axes with a replicated axis MAJOR interleaves
        # the shards — GSPMD then all-gathers the activations (and their
        # cotangents) around every conv. Env-major merging keeps everything
        # chip-local; per-sample convs make the reorder numerically free.
        swap = len(lead) == 2
        if swap:
            obs = obs.swapaxes(0, 1)

        # (..., A, C, H, W) -> (batch*A, H, W, C) for NHWC convs.
        x = obs.reshape(-1, C, H, W).transpose(0, 2, 3, 1)
        x = nn.relu(nn.Conv(32, (1, 8), strides=(1, 4), padding='VALID')(x))
        x = nn.relu(nn.Conv(64, (1, 4), strides=(1, 2), padding='VALID')(x))
        x = nn.relu(nn.Conv(128, (1, 3), strides=(1, 2), padding='VALID')(x))

        x = x.reshape(*(lead[::-1] if swap else lead),
                      A * int(np.prod(x.shape[1:])))
        if swap:
            x = x.swapaxes(0, 1)
        x = nn.relu(nn.Dense(self.width)(x))
        return nn.relu(nn.Dense(self.width)(x))


class ConcatIntake(nn.Module):
    """Encodes a dict space by concatenating per-key intakes through a linear mix
    (reference ``heads.py:56-67``)."""
    space: object
    width: int

    @nn.compact
    def __call__(self, obs):
        ys = [intake(v, self.width, name=k)(obs[k]) for k, v in self.space.items()]
        return nn.Dense(self.width)(jnp.concatenate(ys, -1))


def intake(space, width, name=None):
    """Space → encoder module (reference ``heads.py:69-75``)."""
    if isinstance(space, Mapping):
        return ConcatIntake(space, width, name=name)
    cls = globals().get(f'{type(space).__name__}Intake')
    if cls is None:
        raise ValueError(f"Can't handle {space}")
    return cls(space, width, name=name)


class MultiDiscreteOutput(nn.Module):
    """Decodes to per-agent categorical log-policies (reference ``heads.py:77-93``)."""
    space: object
    width: int

    @nn.compact
    def __call__(self, x):
        shape = self.space.shape
        y = nn.Dense(int(np.prod(shape)))(x)
        y = y.reshape(*x.shape[:-1], *shape)
        return jax.nn.log_softmax(y, -1)

    @staticmethod
    def sample(key, logits, test=False):
        if test:
            return jnp.argmax(logits, -1)
        return jax.random.categorical(key, logits, -1)


class DictOutput(nn.Module):
    """Decodes a dict space: a linear split into per-key features, one output head
    each (reference ``heads.py:95-108``)."""
    space: object
    width: int

    def setup(self):
        self.core = nn.Dense(self.width * len(self.space))
        self.outputs = {k: output(v, self.width) for k, v in self.space.items()}

    def __call__(self, x):
        ys = jnp.split(self.core(x), len(self.outputs), -1)
        return dotdict({k: m(ys[i]) for i, (k, m) in enumerate(self.outputs.items())})

    def sample(self, key, logits, test=False):
        keys = jax.random.split(key, len(self.outputs))
        return dotdict({k: m.sample(keys[i], logits[k], test)
                        for i, (k, m) in enumerate(self.outputs.items())})


class ValueOutput(nn.Module):
    """A scalar value head (reference ``heads.py:110-117``)."""
    width: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(1)(x)[..., 0]


def output(space, width, name=None):
    """Space → decoder module (reference ``heads.py:119-126``)."""
    if isinstance(space, Mapping):
        return DictOutput(space, width, name=name)
    cls = globals().get(f'{type(space).__name__}Output')
    if cls is None:
        raise ValueError(f"Can't handle {space}")
    return cls(space, width, name=name)
