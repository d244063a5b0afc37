"""A Transformer-XL-style memory core with GTrXL gating.

Counterpart of the reference ``megastep/demo/transformer.py``: recurrent activation
memory spanning rollout chunks, relative position scores, reset-aware masking so
attention never crosses episode boundaries, and GRU-type layer gating
(GTrXL, ``transformer.py:188-222``).

TPU-first redesign:
  * memory is a *fixed-length* ring of the last ``mem_len`` activations with a
    validity mask (the reference grows a ragged ``[0..mem_len]`` tensor — dynamic
    shapes XLA can't compile once);
  * the reset mask is computed from an inclusive cumulative reset count over
    [memory, chunk]: key ``j`` is visible from query ``i`` iff no reset lies in
    ``(j, i]`` — equivalent to the reference's ``ResetMasker`` diagonal-cumsum
    construction (``transformer.py:48-78``) but O(TM) instead of O(T·M²);
  * relative position scores are a direct gather over distance embeddings instead
    of the ``rel_shift`` padding trick (``transformer.py:38-46``) — same result,
    shape-static.

State is an explicit arrdict (per-layer memory + reset/validity flags), replacing
``recurrence.State``.
"""
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..arrdict import arrdict


def positional_embedding(pos, d_model, lim=1024):
    """Sinusoidal embeddings of (...,) positions (reference ``transformer.py:8-35``)."""
    inv_freq = 2 * np.pi / (lim ** (np.arange(0., d_model, 2.) / d_model))
    ang = pos[..., None] * inv_freq
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)


def visibility(mem_reset, mem_valid, reset, mem_len):
    """Attention visibility over the concatenated [memory, chunk] axis.

    :param mem_reset: (M, B) bool reset flags of the memory slots.
    :param mem_valid: (M, B) bool — False for not-yet-filled slots.
    :param reset: (T, B) bool chunk resets.
    :return: (T, M+T, B) bool — True where query i may attend key j.
    """
    M, B = mem_reset.shape
    T = reset.shape[0]
    all_reset = jnp.concatenate([mem_reset, reset], 0)          # (M+T, B)
    cum = jnp.cumsum(all_reset.astype(jnp.int32), 0)            # inclusive

    q_pos = M + jnp.arange(T)
    k_pos = jnp.arange(M + T)
    causal = k_pos[None, :] <= q_pos[:, None]                   # (T, M+T)
    window = k_pos[None, :] > q_pos[:, None] - mem_len

    same_episode = cum[q_pos][:, None] == cum[k_pos][None]      # (T, M+T, B)
    valid = jnp.concatenate([mem_valid, jnp.ones((T, B), bool)], 0)
    return causal[..., None] & window[..., None] & same_episode & valid[None, k_pos]


class Attention(nn.Module):
    """One block of relative-position multi-head attention over [memory, chunk]
    (reference ``Weights``+``Values``, ``transformer.py:80-186``)."""
    d_model: int
    mem_len: int
    n_head: int = 1
    d_head: int = None
    content: bool = True
    position: bool = True
    use_norm: bool = True

    @nn.compact
    def __call__(self, h, reset, mem):
        """:param h: (T, B, d_model); :param mem: arrdict(m, reset, valid) with m
        (M, B, d_model); :return: (out, new_mem)."""
        NH = self.n_head
        DH = self.d_head or self.d_model // NH
        T, B = h.shape[:2]
        M = mem.m.shape[0]
        TM = T + M

        norm = nn.LayerNorm() if self.use_norm else (lambda x: x)
        cat = norm(jnp.concatenate([mem.m, h], 0))              # (TM, B, d)
        q = nn.Dense(NH * DH, use_bias=False, name='q')(cat[-T:]).reshape(T, B, NH, DH)

        vis = visibility(mem.reset, mem.valid, reset, self.mem_len)  # (T, TM, B)
        score = jnp.zeros((T, TM, B, NH), h.dtype)

        if self.content:
            k = nn.Dense(NH * DH, use_bias=False, name='k')(cat).reshape(TM, B, NH, DH)
            k_bias = self.param('k_bias', nn.initializers.normal(1.), (NH, DH))
            score += jnp.einsum('ibnd,jbnd->ijbn', q + k_bias, k)

        if self.position:
            # r_emb[d] embeds a key that is d steps before the query.
            dist = jnp.arange(TM, dtype=h.dtype)
            r_all = nn.Dense(NH * DH, use_bias=False, name='r')(
                positional_embedding(dist, self.d_model)).reshape(TM, NH, DH)
            r_bias = self.param('r_bias', nn.initializers.normal(1.), (NH, DH))
            p = jnp.einsum('ibnd,jnd->ijbn', q + r_bias, r_all)  # (T, dist, B, NH)
            d_idx = (M + jnp.arange(T)[:, None]) - jnp.arange(TM)[None]  # (T, TM)
            score += jnp.take_along_axis(
                p, jnp.clip(d_idx, 0, TM - 1)[:, :, None, None].repeat(B, 2).repeat(NH, 3), 1)

        score = score / DH**.5
        score = jnp.where(vis[..., None], score, -65000.)
        prob = jax.nn.softmax(score, 1)
        # Zero rows where nothing was visible (start-of-episode with no memory).
        prob = jnp.where(vis.any(1)[:, None, :, None], prob, 0.)

        v = nn.Dense(NH * DH, use_bias=False, name='v')(cat).reshape(TM, B, NH, DH)
        summary = jnp.einsum('ijbn,jbnd->ibnd', prob, v).reshape(T, B, NH * DH)
        out = nn.relu(nn.Dense(self.d_model, use_bias=False, name='o')(summary))

        new_mem = arrdict(
            m=jax.lax.stop_gradient(jnp.concatenate([mem.m, h], 0)[-self.mem_len:]),
            reset=jnp.concatenate([mem.reset, reset], 0)[-self.mem_len:],
            valid=jnp.concatenate(
                [mem.valid, jnp.ones((T, B), bool)], 0)[-self.mem_len:])
        return out, new_mem


class Gate(nn.Module):
    """GRU-type gating of a residual branch (GTrXL; reference
    ``transformer.py:188-205``). ``bias`` > 0 starts the gate mostly-closed so early
    training behaves like the identity."""
    d_model: int
    bias: float = 2.

    @nn.compact
    def __call__(self, x, y):
        wr, wz, wg = jnp.split(nn.Dense(3 * self.d_model, use_bias=False, name='W')(y), 3, -1)
        ur, uz = jnp.split(nn.Dense(2 * self.d_model, use_bias=False, name='U')(x), 2, -1)
        b = self.param('b', nn.initializers.constant(self.bias), (self.d_model,))

        r = jax.nn.sigmoid(wr + ur)
        z = jax.nn.sigmoid(wz + uz - b)
        hh = jnp.tanh(wg + nn.Dense(self.d_model, use_bias=False, name='Ug')(r * x))
        return (1 - z) * x + z * hh


class GatedAttention(nn.Module):
    """Attention + feedforward, each gated (reference ``transformer.py:207-222``)."""
    d_model: int
    mem_len: int
    n_head: int = 1
    d_head: int = None

    @nn.compact
    def __call__(self, h, reset, mem):
        a, new_mem = Attention(self.d_model, self.mem_len, self.n_head, self.d_head,
                               name='attn')(h, reset, mem)
        h = Gate(self.d_model, name='attn_gate')(h, a)
        ff = nn.relu(nn.Dense(self.d_model, name='ff')(nn.LayerNorm(name='ff_norm')(h)))
        return Gate(self.d_model, name='ff_gate')(h, ff), new_mem


class Transformer(nn.Module):
    """A stack of gated memory-attention layers (reference
    ``transformer.py:224-237``). Call signature matches :class:`~.lstm.LSTM`:
    ``(x, reset, state) -> (y, new_state)``."""
    d_model: int
    mem_len: int = 32
    n_layers: int = 1
    n_head: int = 1
    d_head: int = None

    @nn.nowrap
    def initial_state(self, batch, dtype=jnp.float32):
        """Zeroed memory. All leaves are batch-first — (B, mem_len, ...) — the
        layout the learner slices minibatches of envs from."""
        one = arrdict(
            m=jnp.zeros((batch, self.mem_len, self.d_model), dtype),
            reset=jnp.zeros((batch, self.mem_len), bool),
            valid=jnp.zeros((batch, self.mem_len), bool))
        return arrdict({f'layer{i}': one for i in range(self.n_layers)})

    @nn.compact
    def __call__(self, x, reset, state):
        new_state = {}
        for i in range(self.n_layers):
            mem = arrdict(m=state[f'layer{i}'].m.transpose(1, 0, 2),
                          reset=state[f'layer{i}'].reset.T,
                          valid=state[f'layer{i}'].valid.T)
            layer = GatedAttention(self.d_model, self.mem_len, self.n_head,
                                   self.d_head, name=f'layer{i}')
            x, new_mem = layer(x, reset, mem)
            new_state[f'layer{i}'] = arrdict(
                m=new_mem.m.transpose(1, 0, 2), reset=new_mem.reset.T,
                valid=new_mem.valid.T)
        return x, arrdict(new_state)
