#!/bin/sh
# Tunnel-health probe loop: append one line per attempt to /tmp/tunnel_health.log
# (epoch, status, rtt_ms).  Used to find healthy measurement windows —
# the tunneled attach degrades or dies for hours at a time (CLAUDE.md).
while true; do
  out=$(timeout 120 python -c "
import time, jax, numpy as np
t0 = time.time(); jax.devices()
x = np.arange(8, dtype=np.float32)
np.asarray(jax.device_put(x))          # warm
t1 = time.time()
for _ in range(3):
    np.asarray(jax.device_put(x))
print('OK %.1f' % ((time.time() - t1) / 3 * 1e3))
" 2>/dev/null)
  if [ -n "$out" ]; then
    echo "$(date +%s) $out" >> /tmp/tunnel_health.log
  else
    echo "$(date +%s) DOWN" >> /tmp/tunnel_health.log
  fi
  sleep 180
done
