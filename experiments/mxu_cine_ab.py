"""Hardware A/B: the one-hot MXU batch kernel (fb_mxu) vs the lax.map
default on the headline config — the round-4 "formulation that sidesteps
the gather floor", productized.

The microbench (experiments/onehot_micro2.py) put the crossover at B>=32
(8.9x/unit at B=128) for a SINGLE matmul per W; the product kernel needs
2-3 matmuls per component (bf16 hi/lo RF split, mxu_exact W cross term)
plus per-chunk rotation, so the expected win is ~1.3-2x per frame at
cine batch sizes, not 8.9x.  This script measures it honestly either way.

Each variant is a fresh Mosaic kernel: expect ~5 s warm / minutes cold
per compile on the tunneled attach.  Run in a HEALTHY window:

PYTHONPATH=/root/repo:$PYTHONPATH python experiments/mxu_cine_ab.py [--quick]
"""
import json
import sys
import time


def main(quick=False):
    import dataclasses

    import numpy as np
    import jax

    from ogl_beamforming_tpu.models.presets import plane_wave_2d
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync, to_host

    # link-health probe first (CLAUDE.md: only trust healthy windows)
    t0 = time.perf_counter()
    np.asarray(jax.device_put(np.zeros(8, np.float32)))
    rtt = (time.perf_counter() - t0) * 1e3
    print(json.dumps({"link_rtt_ms": round(rtt, 1)}), flush=True)

    c, s = 256, 4096
    p, pipe = plane_wave_2d(channel_count=c, sample_count=s,
                            output_points=(512, 1024))
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st1 = dataclasses.replace(sd.das, iq=True)
    dyn = dict(plan.dyn["das"])
    dyn.pop("das_tables", None)     # tables are keyed per variant below
    rng = np.random.default_rng(3)

    re = rng.standard_normal((c, 1, s)).astype(np.float32)
    im = rng.standard_normal((c, 1, s)).astype(np.float32)
    rf1 = jax.jit(lambda a, b: jax.lax.complex(a, b))(re, im)

    def measure(name, st, rf, frames, iters, knobs=None):
        das_pallas.ABLATE.clear()
        if knobs:
            das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()
        try:
            dyn_c = dict(dyn)
            dyn_c["das_tables"] = das_pallas.das_activity_tables(
                dyn_c, das_pallas.das_table_static(st))
            tc0 = time.perf_counter()
            sync(das_jit(rf, dyn_c, st))
            compile_s = time.perf_counter() - tc0
            for _ in range(2):
                sync(das_jit(rf, dyn_c, st))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = das_jit(rf, dyn_c, st)
                sync(out)
                best = min(best,
                           (time.perf_counter() - t0) / iters / frames)
            print(json.dumps({name: round(best * 1e3, 3),
                              "unit": "ms/frame",
                              "compile_s": round(compile_s, 1)}),
                  flush=True)
            return out
        except Exception as e:
            print(json.dumps({name: str(e)[:300]}), flush=True)
            return None
        finally:
            das_pallas.ABLATE.clear()

    def batched(B):
        return jax.jit(lambda x, n=B: jax.numpy.broadcast_to(
            x, (n,) + x.shape))(rf1)

    # 1) the shipped default: lax.map of the single-frame kernel
    ref_out = measure("mapped_B32", dataclasses.replace(st1, frame_batch=32),
                      batched(32), 32, iters=8)
    ref = to_host(ref_out)[0] if ref_out is not None else None

    # 2) fb_mxu at B=32 (exact weights)
    st32 = dataclasses.replace(st1, frame_batch=32)
    out = measure("mxu_B32", st32, batched(32), 32, iters=8,
                  knobs={"fb_mxu": 1})
    if out is not None and ref is not None:
        o = to_host(out)[0]
        err = float(np.linalg.norm(o - ref) / np.linalg.norm(ref))
        print(json.dumps({"mxu_B32_vs_mapped_nrmse": err}), flush=True)

    # 3) inexact weights: 1/3 fewer matmuls
    measure("mxu_B32_inexact", st32, batched(32), 32, iters=8,
            knobs={"fb_mxu": 1, "mxu_exact": 0})

    if not quick:
        # 4) deeper batch: W build amortizes further
        st128 = dataclasses.replace(st1, frame_batch=128)
        measure("mxu_B128", st128, batched(128), 128, iters=4,
                knobs={"fb_mxu": 1})
        measure("mxu_B128_inexact", st128, batched(128), 128, iters=4,
                knobs={"fb_mxu": 1, "mxu_exact": 0})
        # 5) RF-block budget variants at B=32
        measure("mxu_B32_rf8", st32, batched(32), 32, iters=8,
                knobs={"fb_mxu": 1, "mxu_rf_mb": 8})
        measure("mxu_B32_ts8", st32, batched(32), 32, iters=8,
                knobs={"fb_mxu": 1, "tile_sub": 8})

    das_pallas._das_call.cache_clear()


if __name__ == "__main__":
    main(quick="--quick" in sys.argv[1:])
