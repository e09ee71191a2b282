#!/bin/bash
# Reordered round-4 hardware queue (supersedes hw_queue_r4.sh tail +
# hw_queue_r4b.sh): waits for the in-flight hercules pretune (PID in
# $WAIT_PID), then runs the short VERDICT-#2 demod-chain experiments
# FIRST (device split, demod slope, chain floor split), then the
# remaining pretunes, then the 3-run full bench.  Launch detached:
#
#   WAIT_PID=984 setsid bash tools/hw_queue_r4c.sh < /dev/null \
#       > /tmp/hw_queue_r4c.out 2>&1 &
#
# Steps log to /tmp/q4_<name>.log; ledger in /tmp/hw_queue_r4c.log.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/tmp/hw_queue_r4c.log
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

STEP_TIMEOUT=3600 step demod_device_split python experiments/demod_device_split.py
STEP_TIMEOUT=3600 step demod_slope        python experiments/demod_slope.py
STEP_TIMEOUT=5400 step chain_floor        python experiments/chain_floor_split.py
step pretune_ufor python tools/pretune.py --only uforces
step pretune_big  python tools/pretune.py --only forces_big
step bench_full   bash -c 'python bench.py --full --runs 3 > docs/bench_full_r4.json'
echo "QUEUE DONE $(date +%F_%T)" >> "$LOG"
