#!/bin/bash
# Consolidated round-4 queue tail (supersedes hw_queue_r4c.sh's bench
# step and hw_queue_r4d.sh, whose wrappers were killed): waits for the
# orphaned forces_big pretune (PID in $WAIT_PID), then runs the focused
# 3D follow-up sweep, the 3-run full bench, and finally the CPU-side
# work (chunk audit + full pytest — after all TPU timing, 1-core VM).
#
#   WAIT_PID=19738 setsid bash tools/hw_queue_r4e.sh < /dev/null \
#       > /tmp/hw_queue_r4e.out 2>&1 &
#
# Steps log to /tmp/q4_<name>.log; ledger in /tmp/hw_queue_r4e.log.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/tmp/hw_queue_r4e.log
: > "$LOG"

if [ -n "${WAIT_PID:-}" ]; then
  echo "waiting on pid $WAIT_PID $(date +%F_%T)" >> "$LOG"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "pid $WAIT_PID gone $(date +%F_%T)" >> "$LOG"
fi

step() {
  local name=$1; shift
  echo "=== $name start $(date +%F_%T)" >> "$LOG"
  timeout "${STEP_TIMEOUT:-10800}" "$@" > "/tmp/q4_$name.log" 2>&1
  echo "=== $name exit=$? $(date +%F_%T)" >> "$LOG"
}

STEP_TIMEOUT=5400 step sweep_3d    python experiments/sweep_3d_r4.py
step bench_full bash -c 'python bench.py --full --runs 3 > docs/bench_full_r4.json'
STEP_TIMEOUT=1800 step chunk_stats python experiments/chain_chunk_stats.py
STEP_TIMEOUT=7200 step pytest      python -m pytest tests/ -q
echo "QUEUE DONE $(date +%F_%T)" >> "$LOG"
