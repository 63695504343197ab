#!/bin/bash
# Round-5 session-5 recovery watcher: the attach wedged mid-session
# (D2H crash -> remote executor stuck; enumeration answers, compute
# blocks). When compute health returns, run the grouped-e2e program:
#   1. hardened tunnel probe (RTT floor, crash-isolated D2H, grouped
#      dispatch amortization)
#   2. e2e npy u8 with --e2e_group 4 (default) — the A/B against the
#      banked group-1 number (0.4747 vol/s, device 2.078 s/vol)
#   3. e2e npy u8 --e2e_group 8 — amortization scaling point
#   4. confirming headline
set -u
cd /root/repo
L=benchmarks/r5_logs
mkdir -p "$L"
exec 9>/tmp/r5_onchip4.lock
flock -n 9 || { echo "already running"; exit 0; }

DEADLINE=$(( $(date +%s) + 6*3600 ))

# let the in-flight wedged e2e finish or time out first
if [ -f /tmp/e2e_g4.pid ]; then
  P=$(cat /tmp/e2e_g4.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 20; done
fi

probe_up() {
  timeout 90 python -c "
import jax, numpy as np
y = jax.jit(lambda x: x + 1)(jax.numpy.zeros((8, 128)))
assert float(np.asarray(y).sum()) == 1024.0
print('UP')" 2>/dev/null | grep -q UP
}

until probe_up; do
  [ "$(date +%s)" -ge "$DEADLINE" ] && {
    echo "=== r5_onchip4 deadline, attach never recovered" >> "$L/driver.log"
    exit 1; }
  sleep 120
done
echo "=== r5_onchip4 attach UP at $(date -u +%H:%M:%S)" >> "$L/driver.log"

run() {  # name cap cmd...
  local name=$1 cap=$2; shift 2
  local left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -le 60 ] && return 1
  [ "$cap" -gt "$left" ] && cap=$left
  echo "=== $name start $(date -u +%H:%M:%S): $* (cap ${cap}s)" >> "$L/driver.log"
  timeout "$cap" "$@" > "$L/$name.out" 2> "$L/$name.err"
  local rc=$?
  echo "=== $name rc=$rc end $(date -u +%H:%M:%S)" >> "$L/driver.log"
  return 0
}

run probe_tunnel3 1200 python -u benchmarks/probe_tunnel.py
run e2e_npy_u8_g4b 2400 python -u bench.py --e2e 16 --e2e_only \
  --e2e_fmt npy --e2e_ship u8 --verbose
run e2e_npy_u8_g8 2400 python -u bench.py --e2e 16 --e2e_only \
  --e2e_fmt npy --e2e_ship u8 --e2e_group 8 --verbose
run headline_s5 2400 python -u bench.py --verbose
