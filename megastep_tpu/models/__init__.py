"""Network components for the demo RL stack.

Counterpart of the reference ``megastep/demo/{heads,lstm,transformer}.py``, rebuilt
on flax.linen: space-driven intake/output head factories, a reset-aware scan LSTM,
and a Transformer-XL-style memory core with GTrXL gating. All recurrent state is
explicit (passed in and returned), replacing the reference's ``rebar.recurrence``
hidden-state registry — the functional shape ``lax.scan`` and ``pjit`` want.
"""
from . import heads, lstm, transformer
from .agent import Agent

__all__ = ['heads', 'lstm', 'transformer', 'Agent']
