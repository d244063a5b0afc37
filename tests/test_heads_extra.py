"""Dict-valued action spaces and the transformer-core agent in the training loop."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from megastep_tpu import spaces
from megastep_tpu.dotdict import dotdict
from megastep_tpu.models import Agent, heads
from megastep_tpu.rebar import fsm
from megastep_tpu.demo.train import init_carry, make_train_step


def test_dict_output():
    """DictOutput splits features per key and samples a dict of actions
    (reference ``heads.py:95-108``)."""
    space = dotdict(move=spaces.MultiDiscrete(1, 4), turn=spaces.MultiDiscrete(1, 3))
    W = 8
    out = heads.output(space, W)
    x = jnp.ones((2, W))
    params = out.init(jax.random.PRNGKey(0), x)
    logits = out.apply(params, x)
    assert logits.move.shape == (2, 1, 4)
    assert logits.turn.shape == (2, 1, 3)

    # sample via the bound module (setup-defined submodules need an apply ctx)
    def sample(m, l):
        return m.sample(jax.random.PRNGKey(1), l)
    actions = out.apply(params, logits, method=sample)
    assert actions.move.shape == (2, 1)
    assert actions.turn.shape == (2, 1)
    assert int(actions.move.max()) < 4 and int(actions.turn.max()) < 3


@pytest.mark.slow
def test_transformer_agent_learns():
    """The TXL-memory core solves the memory-requiring FSM, like the LSTM."""
    env = fsm.DelayedMatchCoin(48)
    agent = Agent(env.obs_space, env.action_space, width=32, core='transformer')
    opt = optax.amsgrad(3e-3)
    key = jax.random.PRNGKey(0)
    carry = init_carry(env, agent, opt, key)
    step = jax.jit(make_train_step(env, agent, opt, buffer_size=12,
                                   batch_size=12 * 48))
    rewards = []
    for i in range(35):
        key, k = jax.random.split(key)
        carry, metrics = step(env, carry, k)
        rewards.append(float(metrics['traj_reward']))
    assert np.mean(rewards[-5:]) > .4, rewards
