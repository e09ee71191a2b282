#!/bin/bash
# Round-4 follow-up queue: waits for hw_queue_r4c.sh to finish (its
# ledger prints QUEUE DONE), then runs the CPU-side work that must not
# contend with the TPU timing steps on this 1-core VM:
#   1. chain_chunk_stats  — executed-gather audit (CPU, no TPU)
#   2. pytest full suite  — green gate after the demod-default flip
#
# Launch detached:
#   setsid bash tools/hw_queue_r4d.sh < /dev/null \
#       > /tmp/hw_queue_r4d.out 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/tmp/hw_queue_r4d.log
: > "$LOG"

echo "waiting for r4c QUEUE DONE $(date +%F_%T)" >> "$LOG"
while ! grep -q "QUEUE DONE" /tmp/hw_queue_r4c.log 2>/dev/null; do
  # r4c dead without finishing? bail to the steps anyway after it exits.
  if ! pgrep -x bash > /dev/null 2>&1; then :; fi
  if ! ps aux | grep -v grep | grep -q hw_queue_r4c.sh; then
    echo "r4c process gone without DONE $(date +%F_%T)" >> "$LOG"
    break
  fi
  sleep 60
done
echo "r4c finished $(date +%F_%T)" >> "$LOG"

step() {
  local name=$1; shift
  echo "=== $name start $(date +%F_%T)" >> "$LOG"
  timeout "${STEP_TIMEOUT:-7200}" "$@" > "/tmp/q4_$name.log" 2>&1
  echo "=== $name exit=$? $(date +%F_%T)" >> "$LOG"
}

STEP_TIMEOUT=1800 step chunk_stats python experiments/chain_chunk_stats.py
STEP_TIMEOUT=7200 step pytest python -m pytest tests/ -q
echo "QUEUE DONE $(date +%F_%T)" >> "$LOG"
