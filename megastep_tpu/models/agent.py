"""The demo policy/value agent.

Counterpart of the reference ``megastep/demo/__init__.py:13-35``: space-driven intake
→ recurrent core → output for the policy, and an independent intake → core → scalar
head for the value, with recurrent state explicit (an arrdict threaded through calls,
replacing ``rebar.recurrence``).
"""
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..arrdict import arrdict
from . import heads
from .lstm import LSTM
from .transformer import Transformer


def _core(kind, width):
    if kind == 'lstm':
        return LSTM(width)
    if kind == 'transformer':
        return Transformer(width)
    raise ValueError(f'Unknown core {kind!r}')


class Agent(nn.Module):
    """A recurrent policy/value agent over a world's obs/action spaces.

    :param obs_space: observation space (dict or Multi* space).
    :param action_space: action space.
    :param width: hidden width (reference default 256).
    :param core: 'lstm' or 'transformer'.
    """
    obs_space: object
    action_space: object
    width: int = 256
    core: str = 'lstm'

    @nn.nowrap
    def initial_state(self, batch):
        """Zeroed recurrent state for both the policy and value cores."""
        c = _core(self.core, self.width)
        return arrdict(policy=c.initial_state(batch), value=c.initial_state(batch))

    @nn.compact
    def __call__(self, world, state, key=None, sample=False, value=False, test=False):
        """Runs the agent over a (T, B, ...) world chunk.

        :param world: arrdict with ``obs`` and ``reset`` (T, B) leaves.
        :param state: recurrent state from :meth:`initial_state` or a previous call.
        :param key: PRNG key; required when ``sample=True`` and not ``test``.
        :return: ``(decision, new_state)`` — decision holds ``logits`` and optionally
            ``actions``/``value``.
        """
        px = heads.intake(self.obs_space, self.width, name='policy_intake')(world.obs)
        py, pstate = _core(self.core, self.width)(px, world.reset, state.policy)
        out = heads.output(self.action_space, self.width, name='policy_out')
        logits = out(py)

        decision = arrdict(logits=logits)
        if sample or test:
            if key is None:
                key = jax.random.PRNGKey(0)
            decision['actions'] = out.sample(key, logits, test)

        new_state = arrdict(policy=pstate, value=state.value)
        if value:
            vx = heads.intake(self.obs_space, self.width, name='value_intake')(world.obs)
            vy, vstate = _core(self.core, self.width)(vx, world.reset, state.value)
            decision['value'] = heads.ValueOutput(self.width, name='value_out')(vy)
            new_state = arrdict(policy=pstate, value=vstate)
        return decision, new_state
