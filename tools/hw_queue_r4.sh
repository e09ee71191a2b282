#!/bin/bash
# Round-4 hardware queue.  Launch DETACHED so it survives driver-session
# restarts:
#
#   setsid bash tools/hw_queue_r4.sh < /dev/null > /tmp/hw_queue_r4.out 2>&1 &
#
# Steps log to /tmp/q4_<name>.log; progress ledger in /tmp/hw_queue_r4.log.
# Each step is individually time-bounded; the pretunes gate themselves on
# tunnel health (tools/pretune.py refuses RTT > 80 ms) and save the tuned
# table incrementally, so a degraded window skips a step instead of
# pinning bad knobs.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/tmp/hw_queue_r4.log
: > "$LOG"

step() {
  local name=$1; shift
  echo "=== $name start $(date +%F_%T)" >> "$LOG"
  timeout 10800 "$@" > "/tmp/q4_$name.log" 2>&1
  echo "=== $name exit=$? $(date +%F_%T)" >> "$LOG"
}

step demod_ab      python experiments/demod_pallas_ab.py
step demod_split   python experiments/demod_split.py
step profiler      python experiments/profiler_probe.py
step pretune_demod python tools/pretune.py --only forces_demod_chain,decode_chain
step pretune_herc  python tools/pretune.py --only hercules
step pretune_ufor  python tools/pretune.py --only uforces
step pretune_big   python tools/pretune.py --only forces_big
step bench_full    bash -c 'python bench.py --full --runs 3 > docs/bench_full_r4.json'
echo "QUEUE DONE $(date +%F_%T)" >> "$LOG"
