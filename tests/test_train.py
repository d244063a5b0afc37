"""Training-stack tests: the jitted rollout+PPO step learns FSM envs with known
solutions — the reference's intended validation ladder (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from megastep_tpu.models import Agent
from megastep_tpu.rebar import fsm
from megastep_tpu.demo.train import init_carry, make_train_step, rollout


def _train(env, steps, width=16, lr=3e-3, buffer=8, seed=0):
    agent = Agent(env.obs_space, env.action_space, width=width)
    opt = optax.amsgrad(lr)
    key = jax.random.PRNGKey(seed)
    carry = init_carry(env, agent, opt, key)
    step = jax.jit(make_train_step(env, agent, opt, buffer_size=buffer,
                                   batch_size=buffer * env.n_envs))
    rewards = []
    for i in range(steps):
        key, k = jax.random.split(key)
        carry, metrics = step(env, carry, k)
        rewards.append(float(metrics['traj_reward']))
    return rewards


def test_learns_match_coin():
    """MatchCoin is solvable without memory; optimal traj reward = +1, random
    play is 0 — assert the policy is clearly above random within a short budget
    (the slow full-convergence check is the marked-slow DelayedMatchCoin test)."""
    rewards = _train(fsm.MatchCoin(32), steps=30)
    assert np.mean(rewards[-5:]) > .3, rewards


@pytest.mark.slow
def test_learns_delayed_match_coin():
    """DelayedMatchCoin *requires* memory — passing proves the reset-aware LSTM
    carries information across steps (reference ``fsm.py:249-263``)."""
    rewards = _train(fsm.DelayedMatchCoin(64), steps=40, width=32, buffer=16)
    assert np.mean(rewards[-5:]) > .5, rewards


def test_rollout_shapes():
    env = fsm.ObliviousCoin(8)
    agent = Agent(env.obs_space, env.action_space, width=8)
    opt = optax.amsgrad(1e-3)
    key = jax.random.PRNGKey(0)
    carry = init_carry(env, agent, opt, key)

    apply = lambda params, world, state, **kw: agent.apply(
        {'params': params}, world, state, **kw)
    env_state, world, agent_state, chunk = rollout(
        env, apply, carry.params, carry.env_state, carry.world,
        carry.agent_state, key, T=5)
    assert chunk.world.reward.shape == (5, 8)
    assert chunk.decision.actions.shape == (5, 8, 1)
    assert chunk.decision.value.shape == (5, 8)
