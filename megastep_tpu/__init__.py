"""megastep_tpu: a TPU-native vectorized 2-D RL environment engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
megastep engine (see SURVEY.md): tens of thousands of floorplan worlds stepped in
lockstep under one ``jit``, with momentum physics, line-segment collision resolution,
and a 1-D raycast renderer producing texture-mapped RGB/depth/lidar observations —
plus composable env-building modules, demo environments, a reset-aware recurrent
PPO/V-trace training stack, and experiment support under :mod:`megastep_tpu.rebar`.
"""
__version__ = '0.1.0'

import importlib

from . import constants, spaces, geometry, toys
from .dotdict import dotdict
from .arrdict import arrdict

__all__ = ['constants', 'spaces', 'geometry', 'toys', 'dotdict', 'arrdict',
           'core', 'scene', 'modules', 'ops', 'envs', 'models', 'demo',
           'cubicasa', 'floorplans', 'plotting', 'rebar', 'parallel',
           'ragged', 'pytree']

_LAZY = {'core', 'scene', 'modules', 'ops', 'envs', 'models', 'demo',
         'cubicasa', 'floorplans', 'plotting', 'rebar', 'parallel',
         'ragged', 'pytree'}


def __getattr__(name):
    """Lazily imports the heavier subsystems (jax/flax-dependent) on first access,
    keeping ``import megastep_tpu`` light."""
    if name in _LAZY:
        return importlib.import_module(f'.{name}', __name__)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
