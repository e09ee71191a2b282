#!/bin/bash
# TPU tunnel health watchdog: every ~6 min, attempt one tiny
# device_put+readback with a hard timeout and log the result.  Stops
# (and leaves a marker) after the first healthy reading so timing runs
# never contend with it.  Launch detached:
#   setsid bash tools/probe_loop.sh < /dev/null > /tmp/probe_loop.out 2>&1 &
set -u
cd /root/repo
LOG=/tmp/tpu_probe.log
MARKER=/tmp/tpu_healthy
rm -f "$MARKER"
while true; do
  ts=$(date +%F_%T)
  out=$(timeout 180 python - <<'EOF' 2>/dev/null
import time
import jax, numpy as np
probe = np.arange(8, dtype=np.float32)
t0 = time.perf_counter()
np.asarray(jax.device_put(probe))
first = time.perf_counter() - t0
t0 = time.perf_counter()
for _ in range(3):
    np.asarray(jax.device_put(probe))
rtt = (time.perf_counter() - t0) / 3 * 1e3
print(f"first={first:.1f}s rtt={rtt:.1f}ms")
EOF
)
  rc=$?
  echo "$ts rc=$rc $out" >> "$LOG"
  rtt=$(echo "$out" | sed -n 's/.*rtt=\([0-9.]*\)ms.*/\1/p')
  if [ "$rc" = 0 ] && [ -n "$rtt" ] && \
     python -c "import sys; sys.exit(0 if float('$rtt') <= 80 else 1)"; then
    echo "$ts HEALTHY rtt=${rtt}ms" >> "$LOG"
    touch "$MARKER"
    exit 0
  fi
  sleep 360
done
