#!/bin/bash
# Staged on-chip validation + benchmark sweep (run on the real TPU, with the
# axon env vars left as-is). Logs one file per step into $OUT (default
# /tmp/tpuval). Decision rules and the current ledger live in
# perf/EXPERIMENTS.md; headline numbers go to PERF.md §Current numbers.
#
# Usage: bash perf/chip_sweep.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpuval}
mkdir -p "$OUT"

run() { name=$1; shift; echo "=== $name: $* ==="; timeout 1800 "$@" > "$OUT/$name.log" 2>&1; echo "exit=$? ($name)"; tail -4 "$OUT/$name.log"; }

# 1. Parity gates first: compiled Mosaic vs the jnp ground truth, all modes
#    (incl. draw-in-kernel, skip-dyn, patched-grouped). Must print ALL OK.
run parity    python perf/tpu_check.py

# 2. Headline benches (exact mode — the PERF.md table rows).
run explorer  python bench.py
run deathm    python bench.py --kind deathmatch
echo HEADLINE DONE

# 3. Fast-shade mode (documented ~1.5e-5 shade drift; still far tighter than
#    the reference's --use_fast_math).
run explorerF python bench.py --fast
run deathmF   python bench.py --kind deathmatch --fast
echo FAST DONE

# 4. Training sustained (actor + learner in one jit).
run flagship  python perf/train_flagship.py --chunks 40
run dmtrain   python perf/train_flagship.py --kind deathmatch --envs 4096 --batch 8192 --chunks 30
echo TRAIN DONE

# 5. Stage decomposition at the bench workload (optimization decision input).
run dmstages  python perf/deathmatch_stages.py --envs 16384 --stages full,observe,kernel,rebake,epilogue,physics,epi_obs,epi_shoot
echo STAGES DONE

# 6. Sharded train step on the real chip (1-device mesh; the multi-device
#    program itself is validated on the virtual CPU mesh).
run scaling   python -m megastep_tpu.parallel.scaling --envs 4096
echo SWEEP DONE
