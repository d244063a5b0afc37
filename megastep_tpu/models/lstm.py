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


def _stacked_orthogonal(key, shape, dtype=jnp.float32):
    """Per-gate orthogonal init for a (H, 4H) concatenated recurrent kernel —
    four independent (H, H) orthogonals, matching what four separate gate
    kernels (flax's LSTMCell parameterization) would draw."""
    H, H4 = shape
    ortho = nn.initializers.orthogonal()
    return jnp.concatenate(
        [ortho(k, (H, H), dtype) for k in jax.random.split(key, H4 // H)],
        axis=-1)


class LSTM(nn.Module):
    """A single-layer LSTM over (T, B, d_model) inputs with per-step reset masking.

    The input projection for ALL timesteps is hoisted out of the recurrent
    scan as one (T·B, D) @ (D, 4H) matmul — it has no serial dependency, and
    inside the scan it sat on the critical path (the reference's cuDNN LSTM
    does the same batching internally). Per step only the recurrent
    (B, H) @ (H, 4H) product remains. Gate math mirrors
    ``nn.OptimizedLSTMCell`` exactly: gates split in (i, f, g, o) order, the
    recurrent half carries the bias, sums ordered h-part + x-part.

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
        H = self.d_model
        xw = nn.Dense(4 * H, use_bias=False, name='wi')(x)     # (T, B, 4H)
        dense_h = nn.Dense(4 * H, use_bias=True, name='wh',
                           kernel_init=_stacked_orthogonal)

        def step(dense_h, carry, inp):
            c, h = carry
            xw_t, r_t = inp
            keep = ~r_t[:, None]
            c = jnp.where(keep, c, 0.)
            h = jnp.where(keep, h, 0.)
            z = dense_h(h) + xw_t
            zi, zf, zg, zo = jnp.split(z, 4, axis=-1)
            i = nn.sigmoid(zi)
            f = nn.sigmoid(zf)
            g = nn.tanh(zg)
            o = nn.sigmoid(zo)
            c = f * c + i * g
            h = o * nn.tanh(c)
            return (c, h), h

        scan = nn.scan(step, variable_broadcast='params', split_rngs={'params': False})
        (c, h), y = scan(dense_h, (state.c, state.h), (xw, reset))
        return y, arrdict(h=jax.lax.stop_gradient(h), c=jax.lax.stop_gradient(c))
