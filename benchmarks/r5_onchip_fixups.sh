#!/bin/bash
# Round-5 on-chip fixup pass: reruns the steps that failed in the first
# r5_onchip.sh sweep after three fixes landed (commit 1e53a4b):
#   - ps2d level-1 VMEM headroom (ps2d_l2* Mosaic stack OOM by 83 KB)
#   - settle parser metric prefix match (settle_ps2d found no base)
#   - margin-envelope exactness gate in bench.py --check_ps2d
# Then re-settles the ps2d default and re-verifies the driver-visible
# headline. Quality (phase B) is launched separately so the flagship
# 96^3 run gets the remaining chip budget.
cd /root/repo || exit 1
exec 9>/tmp/r5_fixups.lock
flock -n 9 || exit 0
mkdir -p benchmarks/r5_logs
L=benchmarks/r5_logs

DEADLINE=$(date -d '2026-08-20 08:00 UTC' +%s)
step() {
  local name=$1 t=$2; shift 2
  local now left
  now=$(date +%s); left=$((DEADLINE - now))
  if [ "$left" -lt 60 ]; then
    echo "=== $name SKIPPED (past deadline)" >> "$L/driver.log"
    return
  fi
  [ "$t" -gt "$left" ] && t=$left
  echo "=== $name start $(date -u +%H:%M:%S): $* (cap ${t}s)" >> "$L/driver.log"
  timeout "$t" "$@" > "$L/$name.out" 2> "$L/$name.err"
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)" >> "$L/driver.log"
}

# level-1 flat region, now with the VMEM headroom fix
step ps2d_l2 1800 python bench.py --ps2d --ps2d_levels 2 --verbose
step ps2d_l2_pool 1800 env SEG3D_POOL_FUSED=1 python bench.py --ps2d --ps2d_levels 2 --verbose
step ps2d_l2_full 1800 env SEG3D_POOL_FUSED=1 SEG3D_PS2D_RELAXED=1 python bench.py --ps2d --ps2d_levels 2 --verbose
# exactness with the margin-envelope contract (overwrites base_check.out,
# which also refreshes the base measurement the settle consumes)
step base_check 1800 python bench.py --check_ps2d --verbose
# settle the default from the full A/B, then show the driver's view
step settle_ps2d 300 python benchmarks/r5_settle_ps2d.py
step final_headline 900 python bench.py --verbose
git add -A benchmarks/r5_logs benchmarks/ps2d_decision.json \
  benchmarks/RESULTS.md 2>/dev/null
git commit -q -m "Bank r5 fixup sweep: level-1 ps2d on-chip, margin-envelope exactness, settled ps2d default" \
  2>/dev/null || true
touch /tmp/r5_fixups.done
