"""Throughput benchmark: Explorer env-steps/s with random actions.

Mirrors the reference's headline benchmark (Explorer at 180k FPS on an RTX 2080 Ti,
``/root/reference/docs/index.rst:13-25``): render res 256 subsampled to 64-px
RGB+depth+IMU observations, momentum movement, exploration reward — stepped in
lockstep under one jit with on-device random actions.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the multiple of the reference's 180k FPS.
"""
import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 180_000.

#: Exit code for "the accelerator backend is unreachable" — distinct from a
#: crash (1) or the driver's timeout (124), so an outage yields a diagnosable
#: BENCH capture in seconds instead of burning the driver's whole window.
EXIT_BACKEND_DOWN = 3


def _bail_backend_down(stage, exc):
    print(json.dumps({
        'metric': 'backend_unavailable',
        'value': 0,
        'unit': 'steps/s',
        'vs_baseline': 0.0,
        'error': f'{stage}: {type(exc).__name__}: {str(exc)[:300]}'}))
    sys.exit(EXIT_BACKEND_DOWN)


def _looks_backend_down(exc):
    s = str(exc)
    return ('Unable to initialize backend' in s
            or 'UNAVAILABLE' in s
            or 'DEADLINE_EXCEEDED' in s)


def probe_backend(deadline_s=240):
    """Touch the backend once, in a SUBPROCESS under a hard timeout, before any
    expensive work.

    When the axon tunnel is down, ``jax.devices()`` either raises UNAVAILABLE
    after ~1-2 min or wedges *inside C++ without releasing the GIL* — a
    SIGALRM handler never runs (measured: an in-process alarm slept through a
    6m40s hang), so the probe must be a child process the OS can kill. Both
    failure shapes turn into a fast, distinct exit rather than the retry/halve
    loop (round 2's capture died rc=124 on exactly this).
    """
    import subprocess
    code = ("import jax, jax.numpy as jnp; jax.devices(); "
            "jnp.zeros(8).sum().block_until_ready(); print('PROBE_OK')")
    try:
        r = subprocess.run([sys.executable, '-c', code],
                           capture_output=True, text=True, timeout=deadline_s)
    except subprocess.TimeoutExpired:
        _bail_backend_down(
            'probe', TimeoutError(f'backend probe exceeded {deadline_s}s'))
    if r.returncode != 0 or 'PROBE_OK' not in r.stdout:
        detail = (r.stderr.strip() or f'probe exited {r.returncode}')[-300:]
        _bail_backend_down('probe', RuntimeError(detail))


def build(n_envs, res=256, subsample=4, kind='explorer', shade_splits=3,
          draw_fused=False, obs_groups=None, mesh_devices=0, geom_size=None,
          geom_depth=9, obs_cuts='dp'):
    from megastep_tpu import floorplans
    from megastep_tpu.envs import Deathmatch, Explorer
    shard_mesh = None
    if mesh_devices:
        # A/B knob for the mesh-mode overhead at matched config (actor-only):
        # the fused observe + re-bake run under shard_map with per-shard size
        # buckets — the exact multi-device program, on an N-device mesh.
        from megastep_tpu.parallel.mesh import mesh
        shard_mesh = mesh(mesh_devices)
    geom_kw = {}
    if geom_size:
        # Cubicasa-scale scenes (200+ walls) through the PRODUCTION bucketed
        # path — the VERDICT-r4 refresh of the old ungrouped 324k number.
        geom_kw = dict(width=geom_size, height=geom_size,
                       max_depth=geom_depth, stop=.02)
    if kind == 'deathmatch':
        # Reference Deathmatch bench: res 512, 4 agents/scene, agent-steps
        # accounting (docs/index.rst:19, deathmatch.py:44).
        n_scenes = max(n_envs // 4, 1)
        geoms = floorplans.sample(min(n_scenes, 512), **geom_kw)
        geoms = [geoms[i % len(geoms)] for i in range(n_scenes)]
        return Deathmatch(n_envs, n_agents=4, geometries=geoms, res=res,
                          subsample=subsample, shade_splits=shade_splits,
                          draw_fused=draw_fused, obs_groups=obs_groups,
                          shard_mesh=shard_mesh, obs_cuts=obs_cuts)
    geoms = floorplans.sample(min(n_envs, 512), **geom_kw)
    geoms = [geoms[i % len(geoms)] for i in range(n_envs)]
    return Explorer(n_envs, geometries=geoms, res=res, subsample=subsample,
                    shade_splits=shade_splits, obs_groups=obs_groups,
                    shard_mesh=shard_mesh, obs_cuts=obs_cuts)


def bench(env, steps=64, reps=3):
    key = jax.random.PRNGKey(0)
    state, world = env.reset(key)
    n_envs = env.n_envs

    # The env is a pytree and rides through jit as an ARGUMENT — a closure would
    # bake the whole padded scenery into the program as literal constants.
    @jax.jit
    def run(env, carry, key):
        def body(carry, key_t):
            state, world = carry
            k_act, k_env = jax.random.split(key_t)
            from megastep_tpu.arrdict import arrdict
            actions = jax.random.randint(k_act, (n_envs, 1), 0, 7)
            state, world = env.step(state, arrdict(actions=actions), k_env)
            return (state, world), world.reward.sum()
        return jax.lax.scan(body, carry, jax.random.split(key, steps))

    # Compile + warm up.
    carry = (state, world)
    carry, _ = run(env, carry, key)
    jax.block_until_ready(carry)

    best = 0.
    for i in range(reps):
        t0 = time.perf_counter()
        carry, r = run(env, carry, jax.random.fold_in(key, i))
        # Force a real device->host fetch inside the timed region: on the
        # axon backend block_until_ready alone has been observed to signal
        # early once after warmup (perf/pool_bench.py), which would inflate
        # a best-of-reps throughput.
        float(r[-1])
        dt = time.perf_counter() - t0
        best = max(best, n_envs * steps / dt)
    return best


DM_BASELINE_FPS = 1_200_000.


def run_kind(kind, args):
    """Benchmarks one env kind with the retry/halve discipline and prints its
    JSON line. Returns True on success (False = every env count failed)."""
    import gc
    res = args.res or (512 if kind == 'deathmatch' else 256)
    baseline = DM_BASELINE_FPS if kind == 'deathmatch' else BASELINE_FPS

    def attempt_once(n):
        env = build(n, res=res, kind=kind,
                    shade_splits=2 if args.fast else 3,
                    draw_fused=args.draw_fused, obs_groups=args.obs_groups,
                    mesh_devices=args.mesh, geom_size=args.geom_size,
                    geom_depth=args.geom_depth, obs_cuts=args.cuts)
        return bench(env, steps=args.steps)

    n_envs = args.envs
    fps = None
    while n_envs >= 256:
        # The remote-compile tunnel fails transiently; retry before shrinking.
        for attempt in range(2):
            try:
                fps = attempt_once(n_envs)
                break
            except Exception as e:
                if _looks_backend_down(e):
                    # Tunnel compiles do flake with UNAVAILABLE once in a
                    # while (retry those), but a repeat means the tunnel is
                    # actually down — halving can't help and the loop would
                    # eat the driver's window. Bail with the distinct code.
                    if attempt > 0:
                        _bail_backend_down(f'{kind}@{n_envs}envs', e)
                print(f'attempt {attempt} at {n_envs} envs failed '
                      f'({type(e).__name__}: {str(e)[:200]})', file=sys.stderr)
                # Drop the traceback's frame references (they pin the failed
                # attempt's device buffers) before retrying/shrinking.
                e.__traceback__ = None
                gc.collect()
                jax.clear_caches()
        if fps is not None:
            break
        print(f'halving from {n_envs} envs', file=sys.stderr)
        n_envs //= 2
    if fps is None:
        print(f'{kind}: bench failed at every env count', file=sys.stderr)
        return False

    print(json.dumps({
        'metric': f'{kind}_env_steps_per_s@{n_envs}',
        'value': round(fps),
        'unit': 'steps/s',
        'vs_baseline': round(fps / baseline, 3)}), flush=True)
    # Free the env/program buffers before the next kind compiles.
    gc.collect()
    jax.clear_caches()
    return True


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--envs', type=int, default=16 * 1024)
    p.add_argument('--res', type=int, default=None)
    p.add_argument('--steps', type=int, default=64)
    p.add_argument('--kind', choices=['explorer', 'deathmatch', 'both'],
                   default='both',
                   help='"both" (default) emits one JSON line per headline '
                        'benchmark — Explorer first (the driver-recorded '
                        'metric), then Deathmatch')
    p.add_argument('--fast', action='store_true',
                   help='fast shade (2 bf16 table components, ~1.5e-5 '
                        'relative shade error; default is exact f32)')
    p.add_argument('--draw-fused', action='store_true',
                   help='deathmatch: rotate agent models inside the observe '
                        'kernel (bit-exact; skips the XLA-side draw)')
    p.add_argument('--mesh', type=int, default=0,
                   help='run the env on an N-device mesh (shard_map observe, '
                        'per-shard size buckets) — the matched-config A/B for '
                        'the mesh-mode overhead; 0 (default) = unmeshed')
    p.add_argument('--obs-groups', type=int, default=None,
                   help='size-bucket count for the fused observe (1 disables '
                        'bucketing; default: the env\'s own default — 4 for '
                        'explorer, 16 for deathmatch). A/B knob for the '
                        'bucketing lever.')
    p.add_argument('--geom-size', type=float, default=None,
                   help='outer floorplan extent (m); ~35 with --geom-depth 9 '
                        'gives cubicasa-scale (200+ wall) scenes. Default: '
                        'the standard bench floorplans.')
    p.add_argument('--geom-depth', type=int, default=9)
    p.add_argument('--cuts', choices=['dp', 'uniform'], default='dp',
                   help='bucket-cut placement A/B: the DP cost optimizer '
                        '(default) vs uniform N/G groups')
    args = p.parse_args()

    if args.draw_fused and args.kind == 'explorer':
        p.error('--draw-fused only applies to deathmatch (Explorer skips the '
                'draw automatically)')

    probe_backend()

    kinds = ['explorer', 'deathmatch'] if args.kind == 'both' else [args.kind]
    ok = [run_kind(kind, args) for kind in kinds]
    if not any(ok):
        raise RuntimeError('bench failed at every env count')


if __name__ == '__main__':
    main()
