#!/bin/bash
# Staged on-chip validation + benchmark sweep (run on the real TPU, with the
# axon env vars left as-is). Logs one file per step into $OUT (default
# /tmp/tpuval). Decision rules per step live in perf/EXPERIMENTS.md.
#
# Usage: bash perf/chip_sweep.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpuval}
mkdir -p "$OUT"

run() { name=$1; shift; echo "=== $name: $* ==="; timeout 1800 "$@" > "$OUT/$name.log" 2>&1; echo "exit=$? ($name)"; tail -4 "$OUT/$name.log"; }

# 1. Parity gates first: compiled Mosaic vs the jnp ground truth, all modes.
run parity    python perf/tpu_check.py

# 2. Headline re-bench (levers: bucketing, skip-draw, skip-dyn, vector trig).
run explorer  python bench.py
run deathm    python bench.py --kind deathmatch

# 3. A/Bs (see EXPERIMENTS.md §3 for the decision rules).
run fbE16     python perf/fused_bench.py --envs 4096 --agents 4 --res 512 --env-block 16 --no-seen --which fused
run fbE32     python perf/fused_bench.py --envs 4096 --agents 4 --res 512 --env-block 32 --no-seen --which fused
run fbFD      python perf/fused_bench.py --envs 4096 --agents 4 --res 512 --no-seen --which fused --fast-div
echo ALL DONE
run explorerF python bench.py --fast
run deathmF   python bench.py --kind deathmatch --fast
echo SWEEP DONE
run flagship  python perf/train_flagship.py --chunks 40
echo FLAGSHIP DONE
run deathmDF  python bench.py --kind deathmatch --draw-fused
run deathmDFF python bench.py --kind deathmatch --draw-fused --fast
echo DRAWFUSED DONE

# 4. Sharded train step on the real chip (1-device mesh; the multi-device
#    program itself is validated on the virtual CPU mesh).
run scaling   python -m megastep_tpu.parallel.scaling --envs 4096
echo SCALING DONE
