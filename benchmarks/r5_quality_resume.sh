#!/bin/bash
# Round-5 session-3 babysitter: the flagship 96^3 quality run
# (convergence_check --long, experiment r5_long_96) was launched in
# session 2 under a `timeout` capped at the OLD round deadline
# (08:00 UTC).  This session runs until ~15:30 UTC, so when that stale
# timeout kills the run we immediately resume it from its save-on-best
# checkpoint and let it finish its 200-epoch budget.
#
# Usage: r5_quality_resume.sh <pid-to-wait-for>
set -u
cd /root/repo
L=benchmarks/r5_logs
PID="${1:?pid}"

# wait for the session-2 run to exit (stale 08:00 timeout kills it)
tail --pid="$PID" -f /dev/null 2>/dev/null
sleep 5   # let the trainer flush its final checkpoint write

# resume budget: chip must be free for e2e A/B + final headline well
# before round end; 200-epoch cap lands ~11:20 anyway.
NOW=$(date +%s); HARD=$(date -d '2026-08-20 12:40 UTC' +%s)
LEFT=$((HARD - NOW)); [ "$LEFT" -lt 60 ] && exit 0

echo "=== resume r5_long_96 at $(date -u +%H:%M:%S), budget ${LEFT}s" >> "$L/driver.log"
timeout "$LEFT" python benchmarks/convergence_check.py --long \
    --data_dir /root/repo/.quality_data_r5 --epochs 200 \
    --experiment_name r5_long_96 \
    --resume results/models/best_r5_long_96 \
    > "$L/quality_long2.out" 2> "$L/quality_long2.err" &
echo $! > /tmp/r5_q2.pid
wait $!
RC=$?
echo "=== resume r5_long_96 rc=$RC end $(date -u +%H:%M:%S)" >> "$L/driver.log"
exit "$RC"
