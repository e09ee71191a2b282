"""Round-5 self-driving hardware queue.

The tunneled attach degrades for hours at a time (CLAUDE.md); this
driver polls link health and runs the round-5 measurement agenda only
inside healthy windows, pausing between blocks when the tunnel turns:

  1. tile_grp A/B + tune (hercules S=2048 bench key, uforces, forces_big,
     headline) — experiments/tile_grp_ab.py (persists winners after an
     on-device numerics gate)
  2. fb_mxu cine A/B — experiments/mxu_cine_ab.py (VERDICT r4 #3:
     hardware numbers, win or lose)
  3. bench.py default path twice (cold-ish then warm) — VERDICT r4 #1
  4. bench.py --full --runs 3 --out docs/bench_full_r5.json — the
     round-5 snapshot + tuned-claim reconciliation (VERDICT r4 #6)

Each block's stdout/stderr goes to /tmp/r5q_<block>.log.  Run:

  PYTHONPATH=/root/repo:$PYTHONPATH nohup python experiments/r5_queue.py \
      > /tmp/r5_queue.log 2>&1 &
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEALTHY_MS = 80.0
PROBE_EVERY_S = 600
PROBE_TIMEOUT_S = 420

PROBE_SRC = (
    "import time,numpy as np,jax\n"
    "np.asarray(jax.device_put(np.zeros(8,np.float32)))\n"
    "t0=time.perf_counter()\n"
    "for _ in range(3): np.asarray(jax.device_put(np.zeros(8,np.float32)))\n"
    "print('RTT_MS', (time.perf_counter()-t0)/3*1e3)\n"
)


def log(msg):
    print(f"[r5q {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe():
    """Attach + readback RTT in a fresh process; None if dead/degraded."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE_SRC], capture_output=True,
            text=True, timeout=PROBE_TIMEOUT_S, cwd=REPO)
    except subprocess.TimeoutExpired:
        return None
    for line in out.stdout.splitlines():
        if line.startswith("RTT_MS"):
            return float(line.split()[1])
    return None


def wait_healthy():
    while True:
        rtt = probe()
        if rtt is not None and rtt <= HEALTHY_MS:
            log(f"tunnel healthy (rtt {rtt:.1f} ms)")
            return rtt
        log(f"tunnel degraded (rtt {rtt and round(rtt, 1)} ms) — "
            f"sleeping {PROBE_EVERY_S}s")
        time.sleep(PROBE_EVERY_S)


def run_block(name, args, timeout_s, env=None):
    wait_healthy()
    log(f"=== {name}: {' '.join(args)}")
    logf = f"/tmp/r5q_{name}.log"
    t0 = time.time()
    run_env = dict(os.environ, **(env or {}))
    with open(logf, "w") as f:
        try:
            rc = subprocess.run(args, stdout=f, stderr=subprocess.STDOUT,
                                timeout=timeout_s, cwd=REPO,
                                env=run_env).returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
    log(f"=== {name} done rc={rc} in {time.time() - t0:.0f}s -> {logf}")
    return rc


def main():
    py = sys.executable
    results = {}
    # tile_grp per family: each candidate is a fresh Mosaic kernel (cold
    # compiles can run minutes each through the remote server), and the
    # A/B script persists each case's winner as it finishes — separate
    # blocks keep partial progress across a mid-queue degradation.
    for fam, budget in (("hercules", 10800), ("uforces", 10800),
                        ("forces_big", 7200), ("headline", 7200)):
        results[f"tg_{fam}"] = run_block(
            f"tg_{fam}", [py, "experiments/tile_grp_ab.py",
                          "--families", fam], budget)
    results["mxu_cine_ab"] = run_block(
        "mxu_cine_ab", [py, "experiments/mxu_cine_ab.py"], 9000)
    results["bench_cold"] = run_block(
        "bench_cold", [py, "bench.py"], 650)
    results["bench_warm"] = run_block(
        "bench_warm", [py, "bench.py"], 650)
    # the full snapshot needs the watchdog far above its natural runtime
    results["bench_full"] = run_block(
        "bench_full", [py, "bench.py", "--full", "--runs", "3",
                       "--out", "docs/bench_full_r5.json"], 16000,
        env={"BENCH_WATCHDOG_S": "15000"})
    log("queue complete: " + json.dumps(results))


if __name__ == "__main__":
    main()
