#!/bin/bash
# Round-5 session-4 on-chip program, phase 3: once phase 2 (e2e A/B +
# confirming headline, r5_onchip2.sh) releases its flock, upgrade the
# grade-accuracy evidence from the banked CPU record (48^3, 95%
# last-5 mean) to the full 64^3 on-chip run VERDICT r4 item 2 asked
# for "if available".
set -u
cd /root/repo
L=benchmarks/r5_logs
mkdir -p "$L"
exec 8>/tmp/r5_onchip3.lock
flock -n 8 || { echo "already running"; exit 0; }

# block until phase 2 finishes (it holds this lock while running)
flock /tmp/r5_onchip2.lock true

DEADLINE=$(date -d '2026-08-20 14:50 UTC' +%s)
NOW=$(date +%s); LEFT=$((DEADLINE - NOW))
if [ "$LEFT" -le 600 ]; then
  echo "=== quality_joint_64 SKIPPED (past deadline)" >> "$L/driver.log"
  exit 0
fi
echo "=== quality_joint_64 start $(date -u +%H:%M:%S) (cap ${LEFT}s)" >> "$L/driver.log"
timeout "$LEFT" python -u benchmarks/quality_joint.py --samples 40 --epochs 120 \
  > "$L/quality_joint_64.out" 2> "$L/quality_joint_64.err"
RC=$?
echo "=== quality_joint_64 rc=$RC end $(date -u +%H:%M:%S)" >> "$L/driver.log"
exit "$RC"
