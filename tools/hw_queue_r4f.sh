#!/bin/bash
# Round-4 final hardware queue: wait for a healthy tunnel window, then
# run the end-to-end verify drive and the 3-run reproducible full bench
# (VERDICT r3 #4's deliverable).  bench.py --out writes incrementally,
# so a window that degrades mid-run still leaves completed rows (each
# flagged healthy/degraded by its own pre-row RTT probe).
#
#   setsid bash tools/hw_queue_r4f.sh < /dev/null \
#       > /tmp/hw_queue_r4f.out 2>&1 &
#
# Ledger: /tmp/hw_queue_r4f.log; step logs /tmp/q4f_<name>.log.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/tmp/hw_queue_r4f.log
: > "$LOG"

probe() {
  timeout 180 python - <<'EOF' 2>/dev/null
import sys, time
import jax, numpy as np
p = np.arange(8, dtype=np.float32)
np.asarray(jax.device_put(p))
t0 = time.perf_counter()
for _ in range(3):
    np.asarray(jax.device_put(p))
rtt = (time.perf_counter() - t0) / 3 * 1e3
print(f"rtt={rtt:.1f}ms")
sys.exit(0 if rtt <= 80 else 1)
EOF
}

echo "waiting for healthy tunnel $(date +%F_%T)" >> "$LOG"
until out=$(probe); do
  echo "$(date +%F_%T) degraded/timeout: $out" >> "$LOG"
  sleep 300
done
echo "$(date +%F_%T) healthy: $out" >> "$LOG"

step() {
  local name=$1; shift
  echo "=== $name start $(date +%F_%T)" >> "$LOG"
  timeout "${STEP_TIMEOUT:-10800}" "$@" > "/tmp/q4f_$name.log" 2>&1
  echo "=== $name exit=$? $(date +%F_%T)" >> "$LOG"
}

STEP_TIMEOUT=2400 step scatterer  python examples/point_scatterer.py
STEP_TIMEOUT=2400 step chaincheck python experiments/tpu_chain_check.py
step bench_full python bench.py --full --runs 3 --out docs/bench_full_r4.json
echo "QUEUE DONE $(date +%F_%T)" >> "$LOG"
