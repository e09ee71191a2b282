"""Formulation-change A/B (VERDICT r3 #1), slope methodology — can MXU
one-hot-matmul interpolation beat the VPU lane-gather path?

Supersedes onehot_micro.py, which had the two harness bugs gather_micro3
exposed: (a) `u & 3` index arithmetic lets Mosaic CSE 16 units down to 4,
(b) per-call device time ~dispatch overhead (~0.65 ms on the tunneled
attach).  Here each unit's indices depend on the full unit counter, and
each path is measured at UNITS in {4, 12, 28} with the per-unit cost
taken from the fitted slope (constants — dispatch, sync RTT, prologue —
cancel).

A) gather_hermite: the headline kernel's bundle — per unit, a (16,128)
   voxel tile x 2 positions x (index ops + 2 packed-int32 gathers +
   unpack + 4 FMA).  Covers 16 voxel rows x 1 frame per unit.
B) onehot_mxu(B): per unit, a 4-tap banded weight build on (128,128)
   iota compares + one (B,128)@(128,128) bf16 MXU matmul.  Covers 1
   voxel row x B frames per unit.  (M must be the frame batch: sample
   indices k are per-(voxel, channel, transmit), so only frames share W —
   reference decode.glsl:76-117 is the cooperative-matrix analogue.)

Reports ns per (128-voxel row x frame): the unit of DAS sampling work.

Run on hardware in a HEALTHY window:
PYTHONPATH=/root/repo:$PYTHONPATH python experiments/onehot_micro2.py
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

    ROWS, LANE, STEPS = 16, 128, 2048
    UNITS_SWEEP = (4, 12, 28)
    ITERS = 20

    def make_gather(units):
        def kernel(src_ref, src2_ref, idx_ref, w_ref, out_ref):
            idx = idx_ref[:]
            w = w_ref[:]
            accs = [jnp.zeros((ROWS, LANE), jnp.float32)] * 4
            src = src_ref[:]
            src2 = src2_ref[:]
            for u in range(units):
                for pos in range(2):
                    # 2*u+pos is globally unique: pos+u would collide with
                    # the next unit's pos-1 and Mosaic CSEs the gathers
                    rr = idx + (pos + 2 * u)
                    sel = rr.astype(jnp.uint32) < LANE
                    rc = rr & (LANE - 1)
                    wp = jnp.where(sel, w, 0.0)
                    wm = jnp.where(sel, w * 0.5, 0.0)
                    vp = jnp.take_along_axis(src, rc, axis=-1)
                    vm = jnp.take_along_axis(src2, rc, axis=-1)
                    a = (u * 2 + pos) & 3
                    accs[a] = (accs[a]
                               + wp * (vp >> 16).astype(jnp.float32)
                               + wm * (vm >> 16).astype(jnp.float32)
                               + wp * ((vp << 16) >> 16).astype(jnp.float32)
                               + wm * ((vm << 16) >> 16).astype(jnp.float32))
            out_ref[:] = accs[0] + accs[1] + accs[2] + accs[3]

        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec((ROWS, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec((ROWS, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32),
        )

    def make_onehot(B, units):
        def kernel(rf_ref, k_ref, w_ref, out_ref):
            k = k_ref[0:1, :]
            iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
            acc = jnp.zeros((B, LANE), jnp.float32)
            rf = rf_ref[:].astype(jnp.bfloat16)
            for u in range(units):
                wmat = jnp.zeros((LANE, LANE), jnp.float32)
                for t in range(4):
                    wt = w_ref[t:t + 1, :]
                    kk = k + (t + 4 * u)          # globally unique: no CSE
                    wmat = wmat + jnp.where(iota == kk, wt, 0.0)
                acc = acc + jax.lax.dot_general(
                    rf, wmat.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[:] = acc

        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec((B, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((8, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((8, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, LANE), jnp.float32),
        )

    rng = np.random.default_rng(7)
    idx = jnp.asarray(rng.integers(1, LANE - 8, (ROWS, LANE), np.int32))
    w = jnp.asarray(rng.standard_normal((ROWS, LANE)).astype(np.float32))
    src = jnp.asarray(
        rng.integers(-2 ** 30, 2 ** 30, (ROWS, LANE)).astype(np.int32))
    src2 = jnp.asarray(
        rng.integers(-2 ** 30, 2 ** 30, (ROWS, LANE)).astype(np.int32))
    kvox = jnp.asarray(rng.integers(1, LANE - 8, (8, LANE), np.int32))
    wt4 = jnp.asarray(rng.standard_normal((8, LANE)).astype(np.float32))

    def sweep(builder, args, label, rows_per_unit, frames_per_unit):
        times = []
        for units in UNITS_SWEEP:
            fn = jax.jit(builder(units))
            sync(fn(*args))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(ITERS):
                    out = fn(*args)
                sync(out)
                best = min(best, (time.perf_counter() - t0) / ITERS)
            times.append(best)
        xs = np.asarray(UNITS_SWEEP, np.float64)
        ys = np.asarray(times, np.float64)
        slope = float(np.polyfit(xs, ys, 1)[0])        # s per unit per step
        per_unit_ns = slope / STEPS * 1e9
        per_rowframe_ns = per_unit_ns / (rows_per_unit * frames_per_unit)
        row = {"us": [round(t * 1e6, 1) for t in times],
               "unit_ns": round(per_unit_ns, 2),
               "ns_per_voxelrow_frame": round(per_rowframe_ns, 3)}
        print(json.dumps({"variant": label, **row}), flush=True)
        return row

    results = {}
    try:
        results["gather_hermite"] = sweep(
            make_gather, (src, src2, idx, w), "gather_hermite",
            rows_per_unit=ROWS, frames_per_unit=1)
    except Exception as e:
        print(json.dumps({"variant": "gather_hermite", "err": str(e)[:200]}),
              flush=True)
    for B in (8, 32, 128):
        rf = jnp.asarray(rng.standard_normal((B, LANE)).astype(np.float32))
        try:
            results[f"onehot_mxu_B{B}"] = sweep(
                lambda units, B=B: make_onehot(B, units), (rf, kvox, wt4),
                f"onehot_mxu_B{B}", rows_per_unit=1, frames_per_unit=B)
        except Exception as e:
            print(json.dumps({"variant": f"onehot_mxu_B{B}",
                              "err": str(e)[:200]}), flush=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
