"""Roofline / MFU accounting for the fused observe kernel and the train step.

PERF.md's appendix is generated from this script (VERDICT r4 #6):
(a) COUNTS the fused kernel's per-step work analytically from its shapes
    (pass-by-pass over ``ops/fused._observe_kernel``'s (L, R) chain — the
    count is code, so a reviewer can re-derive it against the kernel source);
(b) divides by PUBLISHED TPU v5e peaks (bf16 MXU 197 Tflop/s, HBM 819 GB/s;
    VPU ~4 Tops/s f32 derived from the (8,128)x4-ALU layout) into per-unit
    floors. The compute units and the HBM DMAs run CONCURRENTLY inside the
    kernel, so the binding floor is max(MXU, VPU, HBM), with the sum as a
    no-overlap upper bound;
(c) optionally (--measure) runs peak microbenches on the chip. Treat those
    as LOWER BOUNDS on attainable: a dependent-chain XLA probe is latency-
    bound (6-13x under what the kernel itself sustains — see
    EXPERIMENTS.md trap #6), the Pallas VPU probe and the matmul chain both
    read ~40-55% of spec through the axon tunnel, and the measured
    shade-component cost (fbS1/fbS3b ablation) implies a rate ABOVE the
    matmul-chain reading — the microbenches bound the chip from below, the
    spec from above.

Usage::

    python perf/roofline.py                 # analytic tables @ spec peaks
    python perf/roofline.py --measure       # also run the peak microbenches
"""
import argparse
import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, *args, steps=32, reps=4):
    """Median seconds per scan step, axon-hygienic (CLAUDE.md measurement
    traps): per-rep input perturbation, in-region fetch, median of reps."""
    f = jax.jit(fn, static_argnames=('steps',))
    out = f(*args, jnp.zeros(()), steps=steps)
    jax.block_until_ready(out)
    times = []
    for rep in range(reps):
        c0 = jnp.float32(1e-6 * (rep + 1))
        t0 = time.perf_counter()
        out = f(*args, c0, steps=steps)
        float(jnp.asarray(out).ravel()[-1])
        times.append((time.perf_counter() - t0) / steps)
    return float(np.median(times))


def measure_mxu(dim=4096, steps=32):
    """Attainable bf16 matmul flops/s at a large square shape (a dependent
    matmul chain — each 4096³ product has ample internal parallelism, so the
    dependency does not stall the systolic array)."""
    a = jax.random.normal(jax.random.PRNGKey(0), (dim, dim), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (dim, dim), jnp.bfloat16)

    def run(a, b, c0, steps):
        def body(x, _):
            return jnp.dot(x, b, preferred_element_type=jnp.bfloat16), ()
        y, _ = jax.lax.scan(body, a + c0.astype(jnp.bfloat16), None,
                            length=steps)
        return y.astype(jnp.float32).sum()

    dt = _timed(run, a, b, steps=steps)
    return 2 * dim**3 / dt


def measure_vpu(L=256, R=512, chain=256, E=8, n=64, steps=16):
    """Attainable f32 elementwise op rate, measured INSIDE a Pallas kernel at
    the observe kernel's own working shapes — ``chain`` multiplies over an
    (L, R) VMEM tile, ``E`` envs per program. An XLA elementwise chain is the
    wrong probe (fused loops process register chunks serially down the chain,
    so a dependent chain is latency-bound — the first two versions of this
    measured 6-13× under what the observe kernel demonstrably achieves).

    Returns element-ops/s (1 op = one f32 multiply over one element)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        for e in range(E):
            y = x_ref[0, e]
            # Two interleaved multiply chains: enough ILP to pipeline, still
            # serially dependent so nothing folds away.
            a = y * np.float32(1.0000001)
            b = y * np.float32(0.9999999)
            for _ in range(chain // 2 - 1):
                a = a * np.float32(1.0000001)
                b = b * np.float32(0.9999999)
            o_ref[0, e] = a + b

    x = jax.random.normal(jax.random.PRNGKey(0), (n, E, L, R), jnp.float32)
    call = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, E, L, R), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, E, L, R), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, E, L, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    def run(x, c0, steps):
        def body(y, _):
            return call(y), ()
        y, _ = jax.lax.scan(body, x * (1. + c0), None, length=steps)
        return y.sum()

    dt = _timed(run, x, steps=steps)
    return chain * n * E * L * R / dt


def measure_hbm(mb=512, steps=16):
    """Attainable HBM stream bandwidth: elementwise scale of a large 2-D
    array (read + write per scan step)."""
    n = mb * 1024 * 1024 // 4
    x = jnp.ones((4096, n // 4096), jnp.float32)

    def run(x, c0, steps):
        def body(x, _):
            return x * (1. + c0 * 1e-6), ()
        y, _ = jax.lax.scan(body, x, None, length=steps)
        return y[:1, :1]

    dt = _timed(run, x, steps=steps)
    return 2 * x.size * 4 / dt


# ---------------------------------------------------------------------------
# Analytic op counts — mirrors ops/fused._observe_kernel pass by pass.
# ---------------------------------------------------------------------------

def kernel_counts(L, R, B, A, S=3, want_seen=False, W=128):
    """Per-(env, agent) work of one fused-observe program.

    Counted against the kernel source (ops/fused.py): each entry is the number
    of (L, R)-shaped elementwise VPU passes a line of the kernel costs. Cross-
    sublane reductions over the L axis cost (L/8 - 1) row ops + 3 intra-tile
    shuffle steps, i.e. (L/8 + 2) passes of (8, R) = (L + 16)/L of an (L, R)
    pass. Divides are counted separately (multi-pass on the VPU).

    MXU occupancy: Mosaic pads the M (sublane) axis of a matmul to 8-row
    granularity, not to the 128 tile — chip-measured: the shade dot's
    per-component cost at M=152 tracks the useful flops, not a 256-row pad.
    """
    red = (L + 16) / L          # one min-reduce over the L axis, in (L,R) units
    vpu_lr = (
        3        # uxv = vy*rux - vx*ruy
        + 3      # t_num = pqx*ruy - pqy*rux
        + 2      # not_distant = abs(uxv) >= eps
        + 6      # valid = not_distant & 0<=tq & tq<=1 & near<sq (3 cmp, 3 and)
        + 1      # s_masked = where(valid, sq, inf)
        + red    # s_min reduce
        + 1      # eligible = s_masked < s_min + tol
        + 1 + red  # idx = min(where(eligible, iota, L))
        + 1      # found/idx0 bookkeeping at (L,R): onehot = iota_l == idx0
        + 1 + red  # s_sel = min(where(onehot, sq, inf))
        + 1 + red  # t_sel
        + 1      # onehot.astype(bf16) for the attrs dots
    )
    divides_lr = 2              # sq, tq true divides
    # One-hot builds for the shade lookup, in (L, R)-pass units.
    vpu_onehot = (2 * W + 2 * B) * R / (L * R)
    # Per-ray (1, R) epilogue in the kernel (shade filter, lambert, writes):
    # ~40 ops on (1, R) rows; count them in (L, R) units.
    vpu_rays = 40 * R / (L * R)
    if want_seen:
        vpu_rays += 10 * R / (L * R)          # tex index chain
        vpu_onehot += (2 * W + B) * R / (L * R)  # lo/hi seen masks
    vpu_passes = vpu_lr + vpu_onehot + vpu_rays

    # MXU work: useful flops, and "occupied" padding M up to 8 sublanes
    # (the attrs dot is 3 exact bf16 component passes since round 5).
    attr_flops = 3 * 2 * 4 * L * R
    attr_occupied = 3 * 2 * 8 * L * R
    shade_flops = S * 2 * (B * 8) * W * R
    shade_occupied = shade_flops            # B*8 is already 8-aligned
    seen_flops = 2 * B * W * R if want_seen else 0
    seen_occupied = 2 * max(B, 8) * W * R if want_seen else 0
    return dict(
        vpu_lr_elems=vpu_passes * L * R,
        div_elems=divides_lr * L * R,
        mxu_flops=attr_flops + shade_flops + seen_flops,
        mxu_occupied=attr_occupied + shade_occupied + seen_occupied,
    )


def kernel_hbm_bytes(N, A, L, R, B, S=3, want_seen=False, W=128,
                     patch_rows=0):
    """Per-step HBM traffic of the kernel: operand reads + output writes.
    The table is read once per env block program (shared by A agents via the
    scratch only when patched/split in-kernel; pre-split tables are re-read
    per agent program unless the grid caches — count the conservative
    once-per-(env, agent) for inputs that are per-program block specs, and
    once per env for outputs written once)."""
    lines_in = N * A * L * 4 * 4              # (1,E,L,4) f32 per agent program
    attrs_in = N * A * 4 * L * 4
    table_in = N * (A if patch_rows == 0 else 1) * S * B * 8 * W * 2  # bf16
    patch_in = N * S * patch_rows * W * 2
    out = N * A * R * (4 + 4 + 3 * 4)         # idx + dist + rgb
    if want_seen:
        out += N * A * B * W * 2              # bf16 seen
    return lines_in + attrs_in + table_in + patch_in + out


def env_shapes(kind, n_envs):
    """Builds the bench env (floorplans) and returns its grouped shapes."""
    from megastep_tpu import floorplans
    from megastep_tpu.envs import Deathmatch, Explorer
    if kind == 'deathmatch':
        n_scenes = max(n_envs // 4, 1)
        geoms = floorplans.sample(min(n_scenes, 512))
        geoms = [geoms[i % len(geoms)] for i in range(n_scenes)]
        env = Deathmatch(n_envs, n_agents=4, geometries=geoms, fused=True)
    else:
        geoms = floorplans.sample(min(n_envs, 512))
        geoms = [geoms[i % len(geoms)] for i in range(n_envs)]
        env = Explorer(n_envs, geometries=geoms, fused=True)
    return env


def analytic(kind, env, step_ms, peaks):
    """Prints the per-step analytic table for one env kind."""
    c = env.core
    A, R = c.n_agents, c.res
    groups = env._groups or ((0, c.n_envs, env.core.scenery.lines.shape[1],
                              env.core.scenery.baked.shape[1] // 128),)
    want_seen = kind == 'explorer'
    skip_dyn = getattr(env, '_skip_dyn', 0) or 0
    nd = c.scenery.n_dynamic if kind == 'explorer' else 0
    tot = dict(vpu_lr_elems=0., div_elems=0., mxu_flops=0., mxu_occupied=0.,
               hbm=0.)
    P = 0
    if kind == 'deathmatch':
        from megastep_tpu.ops import fused as fused_ops
        P = len(fused_ops.dynamic_rows(c.scenery.n_dynamic_texels,
                                       c.scenery.baked.shape[1]))
    for (g0, g1, Lg, Bg) in groups:
        n = g1 - g0
        Leff = Lg - nd                         # Explorer skip-draw slices dyn
        k = kernel_counts(Leff, R, Bg, A, want_seen=want_seen)
        tot['vpu_lr_elems'] += n * A * k['vpu_lr_elems']
        tot['div_elems'] += n * A * k['div_elems']
        tot['mxu_flops'] += n * A * k['mxu_flops']
        tot['mxu_occupied'] += n * A * k['mxu_occupied']
        tot['hbm'] += kernel_hbm_bytes(n, A, Leff, R, Bg,
                                       want_seen=want_seen,
                                       patch_rows=P if kind == 'deathmatch' else 0)

    t = step_ms * 1e-3
    vpu_s = (tot['vpu_lr_elems']
             + tot['div_elems'] * peaks.get('div_cost', 8)) / peaks['vpu_ops']
    mxu_s = tot['mxu_occupied'] / peaks['mxu_flops']
    hbm_s = tot['hbm'] / peaks['hbm_bytes']
    floor = max(mxu_s, vpu_s, hbm_s)          # units run concurrently
    serial = mxu_s + vpu_s + hbm_s            # no-overlap upper bound
    binding = max((mxu_s, 'MXU'), (vpu_s, 'VPU'), (hbm_s, 'HBM'))[1]
    print(f'\n== {kind} @ {env.n_envs} envs (A={A}, res={R}, '
          f'{len(groups)} size buckets) ==')
    print(f'  per-step useful MXU flops    : {tot["mxu_flops"]/1e9:8.1f} G '
          f'(occupied w/ 8-sublane padding {tot["mxu_occupied"]/1e9:.1f} G)')
    print(f'  per-step VPU (L,R) elems     : {tot["vpu_lr_elems"]/1e9:8.1f} G '
          f'+ {tot["div_elems"]/1e9:.1f} G divides')
    print(f'  per-step kernel HBM bytes    : {tot["hbm"]/1e6:8.0f} MB')
    print(f'  per-unit times @ spec peaks  : MXU {mxu_s*1e3:.2f} ms | '
          f'VPU(+div) {vpu_s*1e3:.2f} ms | HBM {hbm_s*1e3:.2f} ms')
    print(f'  roofline floor (max, units overlap) {floor*1e3:.2f} ms; '
          f'no-overlap bound {serial*1e3:.2f} ms; binding unit: {binding}')
    if step_ms:
        print(f'  measured step {step_ms:.2f} ms -> {100*floor/t:.0f}% of '
              f'the overlap floor, {100*serial/t:.0f}% of the no-overlap '
              f'bound; kernel MFU {100*tot["mxu_flops"]/peaks["mxu_flops"]/t:.1f}%')
    return tot


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--measure', action='store_true',
                   help='run the on-chip peak microbenches (reported as '
                        'lower bounds on attainable; default: published '
                        'v5e spec peaks)')
    p.add_argument('--envs', type=int, default=16 * 1024)
    p.add_argument('--step-ms-explorer', type=float, default=None,
                   help='measured full-step ms at the Explorer config '
                        '(from bench.py) to express the floor as % of step')
    p.add_argument('--step-ms-deathmatch', type=float, default=None)
    args = p.parse_args()

    peaks = dict(mxu_flops=197e12, vpu_ops=4e12, hbm_bytes=819e9,
                 div_cost=8)
    print('== peaks used (PUBLISHED v5e spec; VPU derived from the '
          '(8,128)x4-ALU layout) ==')
    print(f'  bf16 MXU matmul : {peaks["mxu_flops"]/1e12:.1f} Tflop/s')
    print(f'  f32 VPU op rate : {peaks["vpu_ops"]/1e12:.2f} Tops/s '
          f'(1 elementwise op per element-pass)')
    print(f'  HBM stream      : {peaks["hbm_bytes"]/1e9:.0f} GB/s')
    if args.measure:
        print('== measured microbench rates (LOWER BOUNDS on attainable '
              'through the axon tunnel — see module docstring) ==')
        print(f'  bf16 MXU matmul chain : {measure_mxu()/1e12:.1f} Tflop/s')
        print(f'  f32 VPU Pallas chain  : {measure_vpu()/1e12:.2f} Tops/s')
        print(f'  HBM stream            : {measure_hbm()/1e9:.0f} GB/s')

    for kind, step_ms in (('explorer', args.step_ms_explorer),
                          ('deathmatch', args.step_ms_deathmatch)):
        env = env_shapes(kind, args.envs)
        analytic(kind, env, step_ms or 0., peaks)


if __name__ == '__main__':
    main()
