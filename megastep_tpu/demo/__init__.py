"""The demo RL stack: agent, PPO/V-trace optimization, and the training driver.

Counterpart of the reference ``megastep/demo/__init__.py``. The reference's
Python-level actor loop (32 sequential ``env.step`` + ``agent`` calls) and learner
loop are re-expressed as jitted ``lax.scan`` programs, so one device program rolls
out a whole chunk and one program runs an optimization step — observations never
leave the device and there is no per-step Python dispatch.
"""
from . import learning
from .train import (Agent, as_chunk, optimize, rollout, train, make_train_step,
                    init_carry, demo)

__all__ = ['learning', 'Agent', 'as_chunk', 'optimize', 'rollout', 'train',
           'make_train_step', 'init_carry', 'demo']
