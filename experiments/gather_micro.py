"""Microbenchmark: what does a Mosaic lane-gather actually cost?

The headline kernel's gather ablation shows ~3.3 cycles per (8,128) vreg
for take_along_axis — 3x the 1 vreg/cycle issue rate assumed by the
roofline.  Measures: index dtype, clip presence, source height, and the
gather:fma mix to find the real floor.
"""
import functools
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

    def make(variant):
        def kernel(src_ref, idx_ref, out_ref):
            # 8 independent accumulator chains: throughput, not latency
            src = src_ref[:]
            idx = idx_ref[:]
            accs = [jnp.zeros((ROWS, LANE), jnp.float32) for _ in range(8)]
            for r in range(REPS):
                ix = idx + (r & 3)
                if variant == "clip":
                    ix = jnp.clip(ix, 0, LANE - 1)
                elif variant == "mod":
                    ix = ix & (LANE - 1)
                accs[r & 7] = accs[r & 7] + jnp.take_along_axis(src, ix,
                                                               axis=-1)
            acc = accs[0]
            for a in accs[1:]:
                acc = acc + a
            out_ref[:] = acc

        def kernel_fma(src_ref, idx_ref, out_ref):
            src = src_ref[:]
            idx = idx_ref[:].astype(jnp.float32)
            accs = [jnp.zeros((ROWS, LANE), jnp.float32) for _ in range(8)]
            for r in range(REPS):
                accs[r & 7] = accs[r & 7] + src * (idx + r)
            acc = accs[0]
            for a in accs[1:]:
                acc = acc + a
            out_ref[:] = acc

        k = kernel_fma if variant == "fma" else kernel
        return pl.pallas_call(
            k,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec((ROWS, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((ROWS, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32),
        )

    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.standard_normal((ROWS, LANE)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, LANE - 4, (ROWS, LANE), np.int32))

    for variant in ("clip", "mod", "raw", "fma"):
        fn = jax.jit(make(variant))
        try:
            sync(fn(src, idx))
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(src, idx)
            sync(out)
            dt = (time.perf_counter() - t0) / 20
            total_vregs = REPS * STEPS * (ROWS // 8)
            cyc = dt * 940e6 / total_vregs
            print(json.dumps({"variant": variant, "us": round(dt * 1e6, 1),
                              "cycles_per_vreg": round(cyc, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": variant, "err": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
