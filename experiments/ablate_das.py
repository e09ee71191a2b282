"""Where do the headline-config DAS milliseconds go?  (round-2 analysis)

Times the plane-wave headline (BASELINE config 2: C=256 S=4096 -> 512x1024,
cubic IQ) under kernel-structure ablations (ops/das_pallas.ABLATE) to
attribute cost between gathers, phase rotation, chunk predication and tap
count.  Results feed PERFORMANCE.md and the v2 kernel design.

Run on the TPU:  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/ablate_das.py
"""

import dataclasses
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ogl_beamforming_tpu.models.presets import plane_wave_2d
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    c, s, nx, nz = 256, 4096, 512, 1024
    p, pipe = plane_wave_2d(channel_count=c, sample_count=s,
                            output_points=(nx, nz))
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st_iq = dataclasses.replace(sd.das, iq=True)
    dyn = plan.dyn["das"]

    re = np.random.randn(c, 1, s).astype(np.float32)
    im = np.random.randn(c, 1, s).astype(np.float32)
    make_iq = jax.jit(lambda a, b: jax.lax.complex(a, b))
    rf_iq = make_iq(jnp.asarray(re), jnp.asarray(im))
    rf_f32 = jnp.asarray(re)

    def timeit(fn, warmup=2, iters=8):
        for _ in range(warmup):
            sync(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / iters * 1e3  # ms

    from ogl_beamforming_tpu.params.enums import InterpolationMode

    variants = [
        ("base", {}, st_iq, rf_iq),
        ("no_rotation", {"no_rotation": True}, st_iq, rf_iq),
        ("no_gather", {"no_gather": True}, st_iq, rf_iq),
        ("no_pred", {"no_pred": True}, st_iq, rf_iq),
        ("group4", {"group": 4}, st_iq, rf_iq),
        ("group2", {"group": 2}, st_iq, rf_iq),
        ("linear", {}, dataclasses.replace(
            st_iq, interpolation_mode=InterpolationMode.Linear), rf_iq),
        ("nearest", {}, dataclasses.replace(
            st_iq, interpolation_mode=InterpolationMode.Nearest), rf_iq),
        ("f32_nonIQ", {}, dataclasses.replace(sd.das, iq=False), rf_f32),
        ("norot_nogather", {"no_rotation": True, "no_gather": True},
         st_iq, rf_iq),
    ]

    results = {}
    for name, knobs, st, rf in variants:
        das_pallas.ABLATE.clear()
        das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()    # jax.jit keyed on st, not on ABLATE
        t0 = time.perf_counter()
        try:
            ms = timeit(lambda: das_jit(rf, dyn, st))
        except Exception as e:  # keep going; partial data is still useful
            results[name] = {"error": str(e)[:200]}
            print(json.dumps({name: results[name]}), flush=True)
            continue
        compile_s = time.perf_counter() - t0
        results[name] = {"ms": round(ms, 2),
                         "compile_s": round(compile_s, 1)}
        print(json.dumps({name: results[name]}), flush=True)

    das_pallas.ABLATE.clear()
    das_pallas._das_call.cache_clear()
    print(json.dumps({"all": results}), flush=True)


if __name__ == "__main__":
    main()
