"""PPO + V-trace training driver.

Counterpart of the reference ``megastep/demo/__init__.py:37-173``. The TPU-native
re-design collapses the reference's Python actor loop and learner loop into one
jitted :func:`train_step`:

  * **rollout**: a ``lax.scan`` over ``buffer_size`` env steps, each fusing the agent
    forward, sampling, physics, render, and reward into one device program;
  * **learn**: a ``lax.scan`` over minibatches applying PPO-clip/V-trace updates,
    with the reference's KL>0.02 early stop as a ``lax.cond`` that skips the
    remaining minibatches' forward+backward once tripped.

Observations, parameters, and optimizer state never leave the device; the only
host↔device traffic is the scalar metrics dict once per step and throttled
checkpoints.
"""
import logging
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..arrdict import arrdict
from ..models import Agent
from . import learning

log = logging.getLogger(__name__)


def _expand_t(tree):
    return jax.tree_util.tree_map(lambda x: x[None], tree)


def _squeeze_t(tree):
    return jax.tree_util.tree_map(lambda x: x[0], tree)


def _take_envs(tree, idxs, axis):
    """Slices the env (batch) axis of every leaf by ``idxs``."""
    return jax.tree_util.tree_map(lambda x: jnp.take(x, idxs, axis=axis), tree)


def rollout(env, apply, params, env_state, world, agent_state, key, T):
    """Rolls the env forward ``T`` steps under the current policy, as one scan.

    :return: ``(env_state, world, agent_state, chunk)`` — chunk has (T, B, ...)
        leaves of ``world`` and ``decision`` (the reference's buffer,
        ``demo/__init__.py:124-134``).
    """
    def step(carry, key_t):
        env_state, world, agent_state = carry
        k_act, k_env = jax.random.split(key_t)
        decision, agent_state = apply(
            params, _expand_t(world), agent_state, key=k_act, sample=True, value=True)
        decision = _squeeze_t(decision)
        new_env_state, new_world = env.step(env_state, decision, k_env)
        return ((new_env_state, new_world, agent_state),
                arrdict(world=world, decision=decision))

    keys = jax.random.split(key, T)
    (env_state, world, agent_state), chunk = jax.lax.scan(
        step, (env_state, world, agent_state), keys)
    return env_state, world, agent_state, chunk


def as_chunk(chunk):
    """Scalar rollout statistics (the on-device subset of the reference's
    ``as_chunk`` stats, ``demo/__init__.py:37-52``)."""
    w = chunk.world
    n = w.reset.size
    return dict(
        samples=jnp.full((), n, jnp.float32),
        trajs=w.reset.sum().astype(jnp.float32),
        step_reward=w.reward.sum() / n,
        traj_reward=w.reward.sum() / jnp.maximum(w.reset.sum(), 1))


def ppo_loss(apply, params, batch, state0, entropy=1e-2, gamma=.99, clip=.2):
    """PPO-clip policy loss + clipped V-trace value loss + entropy bonus
    (reference ``optimize``, ``demo/__init__.py:54-107``)."""
    w, d0 = batch.world, batch.decision
    d, _ = apply(params, w, state0, value=True)

    logits = learning.flatten(d.logits)
    old_logits = learning.flatten(learning.gather(d0.logits, d0.actions)).sum(-1)
    new_logits = learning.flatten(learning.gather(d.logits, d0.actions)).sum(-1)
    ratio = jnp.clip(jnp.exp(new_logits - old_logits), .05, 20)

    v_target = learning.v_trace(ratio, d.value, w.reward, w.reset, gamma=gamma)
    v_clipped = d0.value + jnp.clip(d.value - d0.value, -10, +10)
    v_loss = .5 * jnp.maximum((d.value - v_target)**2, (v_clipped - v_target)**2).mean()

    adv = learning.generalized_advantages(d.value, w.reward, d.value, w.reset, gamma=gamma)
    normed_adv = (adv - adv.mean()) / (1e-3 + adv.std())
    free_adv = ratio * normed_adv
    clip_adv = jnp.clip(ratio, 1 - clip, 1 + clip) * normed_adv
    p_loss = -jnp.minimum(free_adv, clip_adv).mean()

    h_loss = (jnp.exp(logits) * logits).sum(-1).mean()
    loss = v_loss + p_loss + entropy * h_loss

    kl_div = -(new_logits - old_logits).mean()
    aux = dict(v_loss=v_loss, p_loss=p_loss, h_loss=h_loss, kl_div=kl_div,
               v_target_mean=v_target.mean(), adv_std=adv.std())
    return loss, aux


def optimizer(lr=3e-4, max_grad_norm=100.):
    """The demo optimizer: Adam(amsgrad) behind a global-norm-100 gradient clip
    (reference ``demo/__init__.py:78-81`` — ``clip_grad_norm_(..., 100)`` then
    ``Adam(3e-4, amsgrad=True)``)."""
    return optax.chain(optax.clip_by_global_norm(max_grad_norm), optax.amsgrad(lr))


def optimize(apply, opt, params, opt_state, batch, state0, **hp):
    """One gradient step on one minibatch. Returns ``(params, opt_state, aux)``.
    Gradient clipping lives in the optimizer chain (:func:`optimizer`), matching
    the reference ``demo/__init__.py:76-81``."""
    (loss, aux), grads = jax.value_and_grad(
        lambda p: ppo_loss(apply, p, batch, state0, **hp), has_aux=True)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    aux['loss'] = loss
    return params, opt_state, aux


def make_train_step(env, agent, opt, buffer_size=32, batch_size=16 * 1024,
                    kl_limit=.02, shard_mesh=None, shard_axis='env', **hp):
    """Builds the jitted one-chunk training step: rollout → minibatched PPO with
    KL early stop (reference outer loop, ``demo/__init__.py:124-145``).

    :param shard_mesh: a :class:`jax.sharding.Mesh` the env batch is sharded
        over. The single-chip minibatcher gathers a random env subset per
        minibatch (``jnp.take`` over the env axis) — under GSPMD that
        all-gathers the whole rollout chunk onto every device, every
        minibatch. With a mesh, every device instead permutes its LOCAL envs
        by one shared per-chunk permutation (under ``jax.shard_map``) and
        minibatches are static local blocks spanning all devices evenly, so
        the learner's only collective is the gradient all-reduce.
    :return: ``step(env, carry, key) -> (carry, metrics)`` where carry is the
        arrdict (params, opt_state, env_state, world, agent_state). The env is an
        explicit argument so that under jit its scenery/spawn tables remain
        runtime buffers instead of program constants (envs are pytrees).
    """
    apply = lambda params, world, state, **kw: agent.apply(
        {'params': params}, world, state, **kw)
    n_envs = env.n_envs
    batch_width = max(batch_size // buffer_size, 1)
    n_batches = n_envs // batch_width
    if n_batches < 1:
        raise ValueError(
            f'batch_size // buffer_size = {batch_width} env columns per '
            f'minibatch exceeds n_envs = {n_envs}: the learner would run '
            f'ZERO minibatches (and silently never train). Lower batch_size '
            f'or raise n_envs.')
    if shard_mesh is not None:
        from jax.sharding import PartitionSpec as P
        n_dev = shard_mesh.shape[shard_axis]
        n_local = n_envs // n_dev
        lw_local = batch_width // n_dev
        if lw_local < 1 or batch_width % n_dev:
            raise ValueError(
                f'minibatch width {batch_width} must be a multiple of the '
                f'mesh\'s {n_dev} devices so every device contributes an '
                f'equal local block')

        def shard_local_batches(chunk, state0, k_perm):
            """(chunk, state0) -> minibatch-major (xs for the learner scan),
            permuted and blocked shard-locally. The same local permutation on
            every device keeps the program SPMD; randomness across devices
            comes from the envs themselves (independent scenes/spawns)."""
            perm = jax.random.permutation(k_perm, n_local)

            def local(chunk, state0, perm):
                c = _take_envs(chunk, perm, 1)
                s = _take_envs(state0, perm, 0)
                used = n_batches * lw_local
                cb = jax.tree_util.tree_map(
                    lambda x: jnp.moveaxis(
                        x[:, :used].reshape(x.shape[0], n_batches, lw_local,
                                            *x.shape[2:]), 1, 0), c)
                sb = jax.tree_util.tree_map(
                    lambda x: x[:used].reshape(n_batches, lw_local,
                                               *x.shape[1:]), s)
                return cb, sb

            return jax.shard_map(
                local, mesh=shard_mesh,
                in_specs=(P(None, shard_axis), P(shard_axis), P()),
                out_specs=(P(None, None, shard_axis), P(None, shard_axis)),
                check_vma=False)(chunk, state0, perm)

    def step(env, carry, key):
        k_roll, k_perm = jax.random.split(key)
        state0 = carry.agent_state
        env_state, world, agent_state, chunk = rollout(
            env, apply, carry.params, carry.env_state, carry.world,
            carry.agent_state, k_roll, buffer_size)

        def minibatch(mcarry, xs):
            params, opt_state, dead = mcarry

            def live(params, opt_state):
                if shard_mesh is None:
                    batch = _take_envs(chunk, xs, 1)
                    s0 = _take_envs(state0, xs, 0)  # recurrent state is batch-first
                else:
                    batch, s0 = xs
                return optimize(apply, opt, params, opt_state, batch, s0, **hp)

            def skip(params, opt_state):
                aux_shapes = jax.eval_shape(live, params, opt_state)[2]
                zeros = jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), aux_shapes)
                return params, opt_state, zeros

            # KL early stop: once exceeded, later minibatches skip their
            # forward+backward entirely (reference breaks its Python loop,
            # demo/__init__.py:138-141).
            params, opt_state, aux = jax.lax.cond(dead, skip, live,
                                                  params, opt_state)
            aux['ran'] = 1. - dead.astype(jnp.float32)
            dead = dead | (aux['kl_div'] > kl_limit)
            aux['skipped'] = dead.astype(jnp.float32)
            return (params, opt_state, dead), aux

        if shard_mesh is None:
            perm = jax.random.permutation(k_perm, n_envs)
            xs = perm[:n_batches * batch_width].reshape(n_batches, batch_width)
        else:
            xs = shard_local_batches(chunk, state0, k_perm)
        (params, opt_state, _), aux = jax.lax.scan(
            minibatch, (carry.params, carry.opt_state, jnp.zeros((), bool)),
            xs)

        # Average opt stats over the minibatches that actually ran, so a
        # tripped KL stop doesn't dilute kl_div/loss with the skip branch's
        # zeros (the reference averages only executed minibatches too).
        ran = aux.pop('ran')
        n_ran = jnp.maximum(ran.sum(), 1.)
        metrics = {k: (v * ran).sum() / n_ran for k, v in aux.items()}
        metrics['skipped'] = aux['skipped'].mean()
        metrics.update(as_chunk(chunk))
        new_carry = arrdict(
            params=params, opt_state=opt_state, env_state=env_state,
            world=world, agent_state=agent_state)
        return new_carry, metrics

    return step


def init_carry(env, agent, opt, key):
    """Initializes (params, opt_state, env_state, world, agent_state)."""
    k_env, k_init = jax.random.split(key)
    env_state, world = env.reset(k_env)
    agent_state = agent.initial_state(env.n_envs)
    params = agent.init(k_init, _expand_t(world), agent_state, value=True)['params']
    opt_state = opt.init(params)
    return arrdict(params=params, opt_state=opt_state, env_state=env_state,
                   world=world, agent_state=agent_state)


def train(env=None, n_envs=8 * 1024, buffer_size=32, batch_size=16 * 1024,
          width=256, lr=3e-4, steps=None, run_name=None, seed=0, resume=None,
          profile=None, full_checkpoint=None, checkpoint_every=25, **hp):
    """The training entry point (reference ``train()``,
    ``demo/__init__.py:109-148``): Explorer + 256-wide LSTM agent + clipped
    Adam(amsgrad), stats and throttled checkpoints to the run directory. Runs
    until interrupted (Ctrl-C is deferred to a chunk boundary) or for ``steps``
    chunks.

    :param resume: a run name (or negative index) whose latest checkpoint to
        load params from before training — the resume half of the reference's
        manual ``storing.load`` → ``load_state_dict`` flow
        (``demo/__init__.py:155-156``).
    :param profile: chunk index at which to capture a ``jax.profiler`` trace
        into the run's ``profile`` directory (the TPU counterpart of the
        reference's nvprof ``-lineinfo`` hooks, SURVEY §5.1); None disables.
    :param full_checkpoint: directory for orbax full-carry checkpoints
        (params + optimizer + env + recurrent state,
        :mod:`megastep_tpu.parallel.checkpoint`). If it already holds a
        checkpoint, training resumes from it with full fidelity — beyond the
        reference's weights-only store. Saved every ``checkpoint_every``
        chunks.
    """
    from ..envs import Explorer
    from ..rebar import interrupting, paths, stats, storing, widgets
    from ..rebar import logging as rlogging

    env = Explorer(n_envs) if env is None else env
    agent = Agent(env.obs_space, env.action_space, width=width)
    opt = optimizer(lr)

    key = jax.random.PRNGKey(seed)
    carry = init_carry(env, agent, opt, key)
    if resume is not None:
        carry['params'] = jax.tree_util.tree_map(
            jnp.asarray, storing.load(resume)['agent'])
        log.info('resumed params from run %r', resume)
    ckpt_base = 0
    if full_checkpoint is not None:
        from ..parallel import checkpoint
        restored = checkpoint.restore(full_checkpoint, carry)
        if restored is not None:
            carry = restored
            # Continue step numbering past the restored checkpoint — orbax
            # silently skips saves at steps <= its latest otherwise.
            ckpt_base = checkpoint.latest_step(full_checkpoint)
            log.info('resumed full carry from %s (step %s)', full_checkpoint,
                     ckpt_base)
    step = jax.jit(make_train_step(env, agent, opt, buffer_size, batch_size, **hp))

    run_name = run_name or f'{time.strftime("%Y-%m-%d %H%M%S")} {type(env).__name__}'
    paths.clear(run_name)
    compositor = widgets.Compositor()
    with rlogging.via_dir(run_name, compositor), stats.via_dir(run_name, compositor), \
            interrupting.interrupter() as interrupt:
        i = 0
        while steps is None or i < steps:
            key, k = jax.random.split(key)
            t0 = time.time()
            if i == profile:
                with jax.profiler.trace(
                        str(paths.subdirectory(run_name, 'profile'))):
                    carry, metrics = step(env, carry, k)
                    jax.block_until_ready(metrics['loss'])
            else:
                carry, metrics = step(env, carry, k)
            metrics = {k2: float(v) for k2, v in metrics.items()}
            step_s = time.time() - t0
            t1 = time.time()
            storing.store_latest(
                run_name, dict(agent=jax.device_get(carry.params)), throttle=60)
            if full_checkpoint is not None and (i + 1) % checkpoint_every == 0:
                from ..parallel import checkpoint
                checkpoint.save(full_checkpoint, ckpt_base + i + 1, carry)
            with stats.defer():
                stats.rate('sample-rate/actor', int(metrics.pop('samples')))
                stats.mean('traj-reward/mean', metrics.pop('traj_reward'))
                stats.mean('step-reward', metrics.pop('step_reward'))
                stats.cumsum('count/traj', metrics.pop('trajs'))
                for k2, v in metrics.items():
                    stats.mean(f'opt/{k2}', v)
                stats.duty('duty/step', step_s)
                stats.duty('duty/store', time.time() - t1)
                # Device vitals each chunk, like the reference's per-chunk GPU
                # memory scrape (demo/__init__.py:147-148).
                stats.device.vitals(throttle=10)
            log.info('step %d done', i)
            i += 1
            interrupt.check()
    return carry


def demo(run=-1, length=None, test=True, N=None, env=None, agent=None,
         params=None, d=0, seed=0, backend='process'):
    """Rolls out a trained agent and encodes a video of env ``d``
    (reference ``demo()``, ``demo/__init__.py:150-173``)."""
    from ..envs import Explorer
    from ..rebar import storing, recording

    env = Explorer(d + 1) if env is None else env
    agent = Agent(env.obs_space, env.action_space) if agent is None else agent
    if params is None:
        params = storing.load(run)['agent']

    apply = lambda world, state, **kw: agent.apply({'params': params}, world, state, **kw)
    key = jax.random.PRNGKey(seed)
    key, k = jax.random.split(key)
    env_state, world = env.reset(k)
    agent_state = agent.initial_state(env.n_envs)

    steps = 0
    with recording.ParallelEncoder(env.plot_state, N=N, backend=backend) as encoder:
        while True:
            key, k_act, k_env = jax.random.split(key, 3)
            decision, agent_state = apply(
                _expand_t(world), agent_state, key=k_act, sample=True, test=test, value=True)
            decision = _squeeze_t(decision)
            env_state, world = env.step(env_state, decision, k_env)
            steps += 1
            if length is None and bool(world.reset.any()):
                break
            state = env.state(env_state, world, d)
            state['decision'] = arrdict(value=np.asarray(decision.value[d]).reshape(-1))
            encoder(state)
            if steps == length:
                break
    return encoder
