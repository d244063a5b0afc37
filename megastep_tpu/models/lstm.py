"""A reset-aware LSTM core.

Counterpart of the reference ``megastep/demo/lstm.py:7-94``. The reference re-segments
each (T, B) chunk at episode resets into a ``PackedSequence`` so cuDNN never carries
state across boundaries; on TPU the same semantics fall out of a ``lax.scan`` whose
carry is zeroed wherever ``reset[t]`` is set — simpler, fully fused by XLA, and
identical in effect (hidden state is exactly zero at the start of every episode).

State is explicit: ``initial_state(batch)`` makes the (h, c) arrdict, ``__call__``
takes and returns it — replacing the reference's ``recurrence.State`` registry.
"""
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..arrdict import arrdict


class LSTM(nn.Module):
    """A single-layer LSTM over (T, B, d_model) inputs with per-step reset masking.

    :param d_model: input and hidden width.
    """
    d_model: int

    @nn.nowrap
    def initial_state(self, batch, dtype=jnp.float32):
        return arrdict(
            h=jnp.zeros((batch, self.d_model), dtype),
            c=jnp.zeros((batch, self.d_model), dtype))

    @nn.compact
    def __call__(self, x, reset, state):
        """:param x: (T, B, d_model) inputs.
        :param reset: (T, B) bool; True zeroes the carried state *before* consuming
            ``x[t]`` (an episode boundary between t-1 and t).
        :param state: (h, c) arrdict from :meth:`initial_state` or a previous call.
        :return: ``(y, new_state)`` with y (T, B, d_model).
        """
        cell = nn.OptimizedLSTMCell(self.d_model)

        def step(cell, carry, inp):
            c, h = carry
            x_t, r_t = inp
            keep = ~r_t[:, None]
            c = jnp.where(keep, c, 0.)
            h = jnp.where(keep, h, 0.)
            (c, h), y = cell((c, h), x_t)
            return (c, h), y

        scan = nn.scan(step, variable_broadcast='params', split_rngs={'params': False})
        (c, h), y = scan(cell, (state.c, state.h), (x, reset))
        return y, arrdict(h=jax.lax.stop_gradient(h), c=jax.lax.stop_gradient(c))
