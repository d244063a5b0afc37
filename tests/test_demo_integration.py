"""Integration tests for the demo drivers: the ``train()`` entry point (stats +
logging + checkpoint wiring) and the ``demo()`` video rollout (recording backends)."""
import numpy as np
import jax
import pytest

from megastep_tpu import demo
from megastep_tpu.models import Agent
from megastep_tpu.rebar import fsm, paths, stats, storing


def test_train_entry_point(tmp_path, monkeypatch):
    """train() runs end-to-end on an FSM env: jitted steps, stats written,
    checkpoint stored (reference ``train()``, ``demo/__init__.py:109-148``)."""
    monkeypatch.chdir(tmp_path)
    env = fsm.ObliviousCoin(16)
    carry = demo.train(env=env, width=8, buffer_size=4, batch_size=4 * 16,
                       steps=2, run_name='test-train', seed=0)
    assert carry is not None

    # Stats were recorded...
    df = stats.Reader('test-train').resample('1s')
    assert 'step-reward' in df.columns
    # ...and a checkpoint was stored and loads.
    ckpt = storing.load('test-train')
    assert 'agent' in ckpt


def test_demo_video(tmp_path, monkeypatch):
    """demo() rolls out a (fresh) agent and encodes a video with whatever backend
    is available (reference ``demo()``, ``demo/__init__.py:150-173``)."""
    import matplotlib
    matplotlib.use('Agg')
    monkeypatch.chdir(tmp_path)

    from megastep_tpu.envs import Minimal

    class _MinimalWorld(Minimal):
        """Minimal env with the reward/reset keys the demo driver expects."""

        def reset(self, key):
            state, world = super().reset(key)
            world['reward'] = self.core.env_full(0.)
            world['reset'] = self.core.env_full(True)
            return state, world

        def step(self, state, decision, key):
            state, world = super().step(state, decision, key)
            world['reward'] = self.core.env_full(0.)
            world['reset'] = self.core.env_full(False)
            return state, world

    env = _MinimalWorld(1)
    agent = Agent(env.obs_space, env.action_space, width=8)
    key = jax.random.PRNGKey(0)
    state, world = env.reset(key)
    agent_state = agent.initial_state(env.core.n_envs)
    params = agent.init(key, jax.tree_util.tree_map(lambda x: x[None], world),
                        agent_state, value=True)['params']

    encoder = demo.demo(env=env, agent=agent, params=params, length=3, d=0,
                        N=1, backend='serial')
    video = encoder.result()
    assert len(video) > 0
    assert encoder.mimetype in ('mp4', 'gif')
