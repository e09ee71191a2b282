"""Gather floor, slope methodology (VERDICT r3 #1, supersedes gather_micro2).

gather_micro.py / gather_micro2.py time 20 enqueues against ONE readback
sync: on the tunneled attach the ~30 ms readback adds ~1.5 ms/call of bias
to kernels whose pure gather work is 70-700 us — every number they print
is dominated by link RTT plus per-grid-step fixed overhead.  This harness
measures each variant at REPS in {32, 96, 224} (same STEPS, same grid,
same prologue) and reports the fitted **slope** in cycles per gathered
(8,128) vreg: constant terms (readback RTT, grid-step cost, index/source
prologue) cancel exactly.

Variants (same bundles as gather_micro2):
  fma           8-chain FMA control — validates method + 940 MHz clock
                (expect ~0.5 cyc/vreg: 2 VPU issue slots/cycle... >=0.5)
  f32_direct    raw take_along_axis, pre-built index
  idx_fresh     full per-tap index pipeline (add, uint-compare, and, where)
  unpack        packed-int32 gather + hi/lo unpack + 2 FMA
  hermite_pair  the headline's exact per-tap bundle: 2 gathers
                (value+slope planes) sharing one rc, full unpack, 4 FMA

Run on hardware in a HEALTHY window (probe first):
PYTHONPATH=/root/repo:$PYTHONPATH python experiments/gather_micro3.py
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ogl_beamforming_tpu.utils.transfer import sync

    # STEPS must be large enough that per-call device time >> the ~0.65 ms
    # tunneled dispatch overhead (measured: at STEPS=512 every variant
    # times ~0.65-0.75 ms/call flat across a 7x REPS change — the enqueue
    # rate, not the kernel).  At STEPS=16384 the swept term is 1-25 ms.
    ROWS, LANE, STEPS = 16, 128, 16384
    NCHAINS = 8
    REPS_SWEEP = (32, 96, 224)
    ITERS = 20

    def make(variant, reps):
        int_src = variant in ("unpack", "hermite_pair")

        def kernel(src_ref, src2_ref, idx_ref, w_ref, out_ref):
            idx = idx_ref[:]
            w = w_ref[:]
            accs = [jnp.zeros((ROWS, LANE), jnp.float32)
                    for _ in range(NCHAINS)]
            src = src_ref[:]
            src2 = src2_ref[:]
            for r in range(reps):
                a = r % NCHAINS
                if variant == "fma":
                    accs[a] = accs[a] + w * (w + np.float32(r))
                elif variant == "f32_direct":
                    # index must be unique per rep or Mosaic CSEs the
                    # gathers (r&3 variants measured BELOW the fma control)
                    rc = (idx + r) & (LANE - 1)
                    accs[a] = accs[a] + jnp.take_along_axis(
                        src, rc, axis=-1).astype(jnp.float32)
                elif variant == "idx_fresh":
                    rr = idx + (r - 1)
                    sel = rr.astype(jnp.uint32) < LANE
                    rc = rr & (LANE - 1)
                    wsel = jnp.where(sel, w, 0.0)
                    v = jnp.take_along_axis(src, rc, axis=-1)
                    accs[a] = accs[a] + wsel * v.astype(jnp.float32)
                elif variant == "unpack":
                    rr = idx + (r - 1)
                    sel = rr.astype(jnp.uint32) < LANE
                    rc = rr & (LANE - 1)
                    wsel = jnp.where(sel, w, 0.0)
                    v = jnp.take_along_axis(src, rc, axis=-1)
                    accs[a] = (accs[a]
                               + wsel * (v >> 16).astype(jnp.float32)
                               + wsel * ((v << 16) >> 16).astype(jnp.float32))
                elif variant == "hermite_pair":
                    # 2 gathers per position -> r counts gathers
                    if r % 2:
                        continue
                    rr = idx + (r // 2 - 1)
                    sel = rr.astype(jnp.uint32) < LANE
                    rc = rr & (LANE - 1)
                    wp = jnp.where(sel, w, 0.0)
                    wm = jnp.where(sel, w * 0.5, 0.0)
                    vp = jnp.take_along_axis(src, rc, axis=-1)
                    vm = jnp.take_along_axis(src2, rc, axis=-1)
                    accs[a] = (accs[a]
                               + wp * (vp >> 16).astype(jnp.float32)
                               + wm * (vm >> 16).astype(jnp.float32)
                               + wp * ((vp << 16) >> 16).astype(jnp.float32)
                               + wm * ((vm << 16) >> 16).astype(jnp.float32))
            acc = accs[0]
            for x in accs[1:]:
                acc = acc + x
            out_ref[:] = acc

        dtype = jnp.int32 if int_src else jnp.float32
        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec((ROWS, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec((ROWS, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32),
        ), dtype

    rng = np.random.default_rng(5)
    idx = jnp.asarray(rng.integers(1, LANE - 4, (ROWS, LANE), np.int32))
    w = jnp.asarray(rng.standard_normal((ROWS, LANE)).astype(np.float32))
    src_f = jnp.asarray(rng.standard_normal((ROWS, LANE)).astype(np.float32))
    src_i = jnp.asarray(
        rng.integers(-2 ** 30, 2 ** 30, (ROWS, LANE)).astype(np.int32))
    src_i2 = jnp.asarray(
        rng.integers(-2 ** 30, 2 ** 30, (ROWS, LANE)).astype(np.int32))

    results = {}
    for variant in ("fma", "f32_direct", "idx_fresh", "unpack",
                    "hermite_pair"):
        times = []
        try:
            for reps in REPS_SWEEP:
                fn_builder, dtype = make(variant, reps)
                s1 = src_i if dtype == jnp.int32 else src_f
                s2 = src_i2 if dtype == jnp.int32 else src_f
                fn = jax.jit(fn_builder)
                sync(fn(s1, s2, idx, w))
                best = float("inf")
                for _ in range(3):        # best-of-3 against link jitter
                    t0 = time.perf_counter()
                    for _ in range(ITERS):
                        out = fn(s1, s2, idx, w)
                    sync(out)
                    best = min(best,
                               (time.perf_counter() - t0) / ITERS)
                times.append(best)
            # least-squares slope of t vs reps (ops = reps*STEPS bundles)
            xs = np.asarray(REPS_SWEEP, np.float64)
            ys = np.asarray(times, np.float64)
            slope = float(np.polyfit(xs, ys, 1)[0])     # s per rep
            # one rep = STEPS bundle instances of (ROWS/8) vregs each
            per_vreg_s = slope / (STEPS * (ROWS // 8))
            cyc = per_vreg_s * 940e6
            row = {"us": [round(t * 1e6, 1) for t in times],
                   "slope_cyc_per_vreg": round(cyc, 3)}
            results[variant] = row
            print(json.dumps({"variant": variant, **row}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": variant, "err": str(e)[:200]}),
                  flush=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
