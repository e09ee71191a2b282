#!/bin/bash
# Follow-up hardware queue: waits for hw_queue_r4.sh to finish, then runs
# additional measurements.  Launch detached like the main queue:
#   setsid bash tools/hw_queue_r4b.sh < /dev/null > /tmp/hw_queue_r4b.out 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/tmp/hw_queue_r4b.log
: > "$LOG"

while ! grep -q "QUEUE DONE" /tmp/hw_queue_r4.log 2>/dev/null; do
  sleep 60
done

step() {
  local name=$1; shift
  echo "=== $name start $(date +%F_%T)" >> "$LOG"
  timeout 10800 "$@" > "/tmp/q4_$name.log" 2>&1
  echo "=== $name exit=$? $(date +%F_%T)" >> "$LOG"
}

step demod_device_split python experiments/demod_device_split.py
step demod_slope python experiments/demod_slope.py
echo "QUEUE2 DONE $(date +%F_%T)" >> "$LOG"
