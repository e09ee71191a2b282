"""Settle the gather-floor discrepancy (VERDICT r3 #1).

The headline kernel's no_gather ablation implies ~3.2 cycles per (8,128)
vreg of take_along_axis, while gather_micro.py's standalone loop measured
~1 cyc/vreg.  This harness replicates the kernel's *actual* inner-loop
structure piece by piece to find where the extra ~2 cyc/vreg lives:

  f32_direct    (16,128) f32 source, pre-built index, raw gather
  i32_direct    same with an int32 source (the kernel gathers packed int32)
  bcast_hoist   source built once per step by broadcast_to((1,128)->(16,128))
  bcast_chunk   source re-broadcast per chunk group (the kernel does this)
  idx_fresh     full per-tap index pipeline: r = k + off - base,
                sel = uint(r) < 128, rc = r & 127, where(sel, w, 0)
  unpack        gather + hi/lo int16 unpack (2 shifts + 2 converts) + 2 FMA
  hermite_pair  two int32 gathers (value+slope planes) sharing one rc,
                full unpack + 4 FMA — the headline's exact per-tap bundle

Run on hardware: PYTHONPATH=/root/repo:$PYTHONPATH python
experiments/gather_micro2.py | tee /tmp/gather_micro2.log
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

    ROWS, LANE, REPS, STEPS = 16, 128, 64, 512
    NCHAINS = 8

    def make(variant):
        int_src = variant in ("i32_direct", "bcast_hoist", "bcast_chunk",
                              "idx_fresh", "unpack", "hermite_pair",
                              "hermite_same_src")
        bcast = variant in ("bcast_hoist", "bcast_chunk", "idx_fresh",
                            "unpack", "hermite_pair", "hermite_same_src")

        def kernel(src_ref, src2_ref, idx_ref, w_ref, out_ref):
            idx = idx_ref[:]
            w = w_ref[:]
            accs = [jnp.zeros((ROWS, LANE), jnp.float32)
                    for _ in range(NCHAINS)]
            if bcast and variant == "bcast_hoist":
                src = jnp.broadcast_to(src_ref[0:1, :], (ROWS, LANE))
            elif not bcast:
                src = src_ref[:]
            for r in range(REPS):
                a = r % NCHAINS
                if variant == "bcast_chunk":
                    # the kernel rebuilds the broadcast per chunk; model a
                    # 4-tap chunk: rebuild every 4 gathers
                    if r % 4 == 0:
                        src = jnp.broadcast_to(src_ref[0:1, :], (ROWS, LANE))
                    rc = idx
                    accs[a] = accs[a] + jnp.take_along_axis(
                        src, rc, axis=-1).astype(jnp.float32)
                elif variant in ("f32_direct", "i32_direct", "bcast_hoist"):
                    rc = (idx + (r & 3)) & (LANE - 1)
                    accs[a] = accs[a] + jnp.take_along_axis(
                        src, rc, axis=-1).astype(jnp.float32)
                elif variant == "idx_fresh":
                    if r % 4 == 0:
                        src = jnp.broadcast_to(src_ref[0:1, :], (ROWS, LANE))
                    rr = idx + ((r & 3) - 1)
                    sel = rr.astype(jnp.uint32) < LANE
                    rc = rr & (LANE - 1)
                    wsel = jnp.where(sel, w, 0.0)
                    v = jnp.take_along_axis(src, rc, axis=-1)
                    accs[a] = accs[a] + wsel * v.astype(jnp.float32)
                elif variant == "unpack":
                    if r % 4 == 0:
                        src = jnp.broadcast_to(src_ref[0:1, :], (ROWS, LANE))
                    rr = idx + ((r & 3) - 1)
                    sel = rr.astype(jnp.uint32) < LANE
                    rc = rr & (LANE - 1)
                    wsel = jnp.where(sel, w, 0.0)
                    v = jnp.take_along_axis(src, rc, axis=-1)
                    accs[a] = (accs[a]
                               + wsel * (v >> 16).astype(jnp.float32)
                               + wsel * ((v << 16) >> 16).astype(jnp.float32))
                elif variant == "hermite_same_src":
                    # control for hermite_pair: identical bundle but BOTH
                    # gathers read the same source vreg — isolates a
                    # per-source-switch gather cost (the old microbench
                    # gathered one unchanging source at ~1 cyc/vreg).
                    if r % 2:
                        continue
                    if r % 4 == 0:
                        src = jnp.broadcast_to(src_ref[0:1, :], (ROWS, LANE))
                    rr = idx + ((r & 3) - 1)
                    sel = rr.astype(jnp.uint32) < LANE
                    rc = rr & (LANE - 1)
                    wp = jnp.where(sel, w, 0.0)
                    wm = jnp.where(sel, w * 0.5, 0.0)
                    vp = jnp.take_along_axis(src, rc, axis=-1)
                    vm = jnp.take_along_axis(src, rc + 1, axis=-1)
                    accs[a] = (accs[a]
                               + wp * (vp >> 16).astype(jnp.float32)
                               + wm * (vm >> 16).astype(jnp.float32)
                               + wp * ((vp << 16) >> 16).astype(jnp.float32)
                               + wm * ((vm << 16) >> 16).astype(jnp.float32))
                elif variant == "hermite_pair":
                    # 2 gathers per position; REPS counts gathers, so use
                    # REPS//2 positions -> skip odd r
                    if r % 2:
                        continue
                    if r % 4 == 0:
                        src = jnp.broadcast_to(src_ref[0:1, :], (ROWS, LANE))
                        src2 = jnp.broadcast_to(src2_ref[0:1, :],
                                                (ROWS, LANE))
                    rr = idx + ((r & 3) - 1)
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

    results = {}
    for variant in ("f32_direct", "i32_direct", "bcast_hoist", "bcast_chunk",
                    "idx_fresh", "unpack", "hermite_pair",
                    "hermite_same_src"):
        fn_builder, dtype = make(variant)
        if dtype == jnp.int32:
            src = jnp.asarray(
                rng.integers(-2 ** 30, 2 ** 30, (ROWS, LANE)).astype(np.int32))
            src2 = jnp.asarray(
                rng.integers(-2 ** 30, 2 ** 30, (ROWS, LANE)).astype(np.int32))
        else:
            src = jnp.asarray(
                rng.standard_normal((ROWS, LANE)).astype(np.float32))
            src2 = src
        fn = jax.jit(fn_builder)
        try:
            sync(fn(src, src2, idx, w))
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(src, src2, idx, w)
            sync(out)
            dt = (time.perf_counter() - t0) / 20
            n_gathers = REPS * STEPS
            if variant in ("hermite_pair", "hermite_same_src"):
                n_gathers = REPS // 2 * 2 * STEPS   # 2 per position
            total_vregs = n_gathers * (ROWS // 8)
            cyc = dt * 940e6 / total_vregs
            row = {"us": round(dt * 1e6, 1),
                   "cyc_per_gather_vreg": round(cyc, 2)}
            results[variant] = row
            print(json.dumps({"variant": variant, **row}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": variant, "err": str(e)[:200]}),
                  flush=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
