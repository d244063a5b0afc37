"""Microbench: obs downsample as reshape-mean vs MXU pooling matrix.

The Deathmatch epilogue mean-pools the full-res (N, A, 3, R) screen and
(N, A, R) depth by `subsample` (modules.downsample(...).mean(-1)). On TPU the
trailing-axis-s reduce is a strided lane reduction; a (R, R/s) matmul against
a fixed 1/s pooling matrix runs on the MXU instead. This times both inside a
lax.scan at bench shapes and reports the max deviation (the dot accumulates
in a different order: ~1-ulp class, same tolerance family as the size-group
slicing drift). Usage::

    python perf/pool_bench.py --envs 4096 --res 512
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--envs', type=int, default=4096)
    p.add_argument('--agents', type=int, default=4)
    p.add_argument('--res', type=int, default=512)
    p.add_argument('--sub', type=int, default=4)
    p.add_argument('--steps', type=int, default=32)
    args = p.parse_args()
    N, A, R, s = args.envs, args.agents, args.res, args.sub

    key = jax.random.PRNGKey(0)
    screen = jax.random.uniform(key, (N, A, 3, R))
    dist = jax.random.uniform(jax.random.fold_in(key, 1), (N, A, R)) * 10

    pool = (np.kron(np.eye(R // s), np.full((s, 1), 1. / s))
            .astype(np.float32))                                    # (R, R/s)
    pool = jnp.asarray(pool)

    def reduce_pool(x, pool):
        return x.reshape(*x.shape[:-1], x.shape[-1] // s, s).mean(-1)

    def dot_pool(x, pool):
        return jnp.dot(x.reshape(-1, R), pool,
                       precision=HI).reshape(*x.shape[:-1], R // s)

    def body(fn, screen, dist, pool):
        # screen/dist/pool arrive as scan ARGUMENTS: a closure over main()'s
        # device arrays would bake ~134 MB into the program as constants
        # (the CLAUDE.md HTTP-413 failure mode) and time constant-folded
        # operands instead of the HBM path the production epilogue uses.
        def f(carry, _):
            # Two algebra traps to defeat (both measured as µs/step "pools"):
            # pooling is linear, so pool(x + c) = pool(x) + c hoists out of
            # the scan — abs() breaks the factoring; and mean(pool(x)) ==
            # mean(x), so a mean consumer lets XLA delete the pool — max()
            # needs every pooled value.
            rgb = fn(jnp.abs(screen - carry), pool)
            d = fn(jnp.abs(dist - carry), pool)
            return carry + 1e-4, rgb.max() + d.max()
        return f

    for name, fn in (('reduce', reduce_pool), ('dot', dot_pool)):
        @jax.jit
        def scan(screen, dist, pool, c0):
            return jax.lax.scan(body(fn, screen, dist, pool), c0,
                                jnp.arange(args.steps))
        _, out = scan(screen, dist, pool, jnp.zeros(()))
        float(out[-1])
        times = []
        for rep in range(4):
            # Per-rep hygiene for the axon backend: vary the inputs (an
            # identical re-dispatch can be answered early), force a real
            # device->host fetch inside the timed region
            # (block_until_ready alone has been observed to signal ~40 ms
            # early once after warmup), and take the MEDIAN of the reps.
            c0 = jnp.float32(1e-3 * (rep + 1))
            t0 = time.perf_counter()
            _, out = scan(screen, dist, pool, c0)
            float(out[-1])
            times.append((time.perf_counter() - t0) / args.steps)
        print(f'{name}: {float(np.median(times)) * 1e3:.3f} ms/step')

    err = jnp.abs(reduce_pool(screen, pool) - dot_pool(screen, pool)).max()
    print(f'max |reduce - dot| = {float(err):.3e}')


if __name__ == '__main__':
    main()
