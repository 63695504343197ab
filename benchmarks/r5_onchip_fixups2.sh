#!/bin/bash
# Second r5 fixup sweep: SW-path exactness artifact (per-level), the
# gather-fixed fused-pool variants, then the settle + driver-view
# headline. See r5_onchip_fixups.sh header for the incident list.
cd /root/repo || exit 1
exec 9>/tmp/r5_fixups2.lock
flock -n 9 || exit 0
mkdir -p benchmarks/r5_logs
L=benchmarks/r5_logs
DEADLINE=$(date -d '2026-08-20 08:00 UTC' +%s)
step() {
  local name=$1 t=$2; shift 2
  local now left
  now=$(date +%s); left=$((DEADLINE - now))
  if [ "$left" -lt 60 ]; then
    echo "=== $name SKIPPED (past deadline)" >> "$L/driver.log"; return
  fi
  [ "$t" -gt "$left" ] && t=$left
  echo "=== $name start $(date -u +%H:%M:%S): $* (cap ${t}s)" >> "$L/driver.log"
  timeout "$t" "$@" > "$L/$name.out" 2> "$L/$name.err"
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)" >> "$L/driver.log"
}
step base_check 2400 python bench.py --check_ps2d --verbose
step ps2d_l2_pool 1800 env SEG3D_POOL_FUSED=1 python bench.py --ps2d --ps2d_levels 2 --verbose
step ps2d_l2_full 1800 env SEG3D_POOL_FUSED=1 SEG3D_PS2D_RELAXED=1 python bench.py --ps2d --ps2d_levels 2 --verbose
step settle_ps2d 300 python benchmarks/r5_settle_ps2d.py
step final_headline 900 python bench.py --verbose
touch /tmp/r5_fixups2.done
