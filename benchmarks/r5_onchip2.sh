#!/bin/bash
# Round-5 session-3 on-chip program, phase 2 (fires when the 96^3
# quality run frees the chip): settle the e2e wire-format A/B
# (VERDICT r4 item 6 — target >= 2 vol/s disk->label-map) and bank a
# confirming headline run.
#
# Usage: r5_onchip2.sh [pid-to-wait-for]
set -u
cd /root/repo
L=benchmarks/r5_logs
mkdir -p "$L"
exec 9>/tmp/r5_onchip2.lock
flock -n 9 || { echo "already running"; exit 0; }

if [ "${1:-}" ]; then
  tail --pid="$1" -f /dev/null 2>/dev/null
  sleep 10
fi

DEADLINE=$(date -d '2026-08-20 15:10 UTC' +%s)

step() {  # step <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  local now left
  now=$(date +%s); left=$((DEADLINE - now))
  if [ "$left" -le 60 ]; then
    echo "=== $name SKIPPED (past deadline)" >> "$L/driver.log"
    return 1
  fi
  [ "$t" -gt "$left" ] && t=$left
  echo "=== $name start $(date -u +%H:%M:%S): $* (cap ${t}s)" >> "$L/driver.log"
  timeout "$t" "$@" > "$L/$name.out" 2> "$L/$name.err"
  local rc=$?
  echo "=== $name rc=$rc end $(date -u +%H:%M:%S)" >> "$L/driver.log"
  return $rc
}

# --- e2e wire-format A/B (npy is the flagship cache format) ---
step e2e_npy_u8   2400 python bench.py --e2e 16 --e2e_only --e2e_fmt npy --e2e_ship u8 --verbose
step e2e_npy_bf16 2400 python bench.py --e2e 16 --e2e_only --e2e_fmt npy --e2e_ship bf16 --verbose
step e2e_nii_u8   2400 python bench.py --e2e 16 --e2e_only --e2e_fmt nii --e2e_ship u8 --verbose
step e2e_gz_u8    2400 python bench.py --e2e 16 --e2e_only --e2e_fmt nii.gz --e2e_ship u8 --verbose

# --- confirming headline (ps2d decision file governs the default) ---
step headline_s3  1200 python bench.py --verbose

echo "=== r5_onchip2 complete $(date -u +%H:%M:%S)" >> "$L/driver.log"
