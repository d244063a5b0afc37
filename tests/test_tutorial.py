"""The tutorial's build-your-own-env code must actually run: the first two
```python blocks of docs/tutorials.md execute verbatim, and the env they define
drives reset/step under jit (the reference's minimal-env tutorial contract)."""
import re
from pathlib import Path

import jax
import pytest

DOC = Path(__file__).parents[1] / 'docs' / 'tutorials.md'


def _blocks():
    return re.findall(r'```python\n(.*?)```', DOC.read_text(), re.S)


def test_build_your_own_env_block_runs():
    blocks = _blocks()
    ns = {}
    exec(blocks[0], ns)  # the MyEnv template
    env = ns['MyEnv'](4)
    key = jax.random.PRNGKey(0)
    state, world = env.reset(key)
    assert world.obs.shape[0] == 4

    from megastep_tpu.arrdict import arrdict
    act = arrdict(actions=jax.random.randint(key, (4, 1), 0,
                                             env.action_space.shape[-1]))
    step = jax.jit(lambda env, s, d, k: env.step(s, d, k))
    state, world = step(env, state, act, key)
    assert world.obs.shape == (4, 1, 1, 1, env.core.res)


def test_fsm_testbed_block_runs(capsys):
    ns = {}
    exec(_blocks()[1], ns)
    assert ns['env'].n_states > 0
