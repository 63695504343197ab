#!/bin/bash
# Pending real-chip measurements queued during the axon attach outage.
# Run on the real TPU (no JAX_PLATFORMS override). Appends to
# benchmarks/ab_s2d.log; each step is individually timed out so one
# wedged run doesn't eat the window.
cd "$(dirname "$0")/.." || exit 1
LOG=benchmarks/ab_s2d.log
run() {
  echo "=== $* [$(date -u +%H:%M:%S)]" | tee -a "$LOG"
  timeout "$1" "${@:2}" 2>&1 | tail -4 | tee -a "$LOG"
}
run 1200 python bench.py --no_s2d          # reproduce the 10.70 baseline
run 1200 python bench.py --s2d             # s2d_eval A/B
run 1200 python bench.py --roi 128 128 160 # forced multi-window tiled
run 1200 python bench.py --roi 128 128 160 --s2d # tiled + s2d A/B
run 1200 python benchmarks/train_bench.py --no_remat          # 246.6 ms/step baseline
run 1200 python benchmarks/train_bench.py --no_remat --s2d    # s2d_train A/B
echo "=== done [$(date -u +%H:%M:%S)]" | tee -a "$LOG"
