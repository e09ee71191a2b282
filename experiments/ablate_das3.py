"""Round-3 DAS ablations: v3 micro-opts, TILE_SUB=32, rotation share.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/ablate_das3.py
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
    from ogl_beamforming_tpu.utils.transfer import sync, to_host

    c, s, nx, nz = 256, 4096, 512, 1024
    p, pipe = plane_wave_2d(channel_count=c, sample_count=s,
                            output_points=(nx, nz))
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st = dataclasses.replace(sd.das, iq=True)
    dyn = plan.dyn["das"]

    re = np.random.randn(c, 1, s).astype(np.float32)
    im = np.random.randn(c, 1, s).astype(np.float32)
    make_iq = jax.jit(lambda a, b: jax.lax.complex(a, b))
    rf = make_iq(jnp.asarray(re), jnp.asarray(im))

    def timeit(fn, warmup=2, iters=8):
        for _ in range(warmup):
            sync(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / iters * 1e3

    variants = [
        ("v3_base", {}, 16),
        ("v3_ts32", {}, 32),
        ("v3_ts32_cb8", {"ch_block": 8}, 32),
        ("v3_norot", {"no_rotation": True}, 16),
        ("v3_nogather", {"no_gather": True}, 16),
        ("v3_g8_ts32", {"group": 8}, 32),
    ]

    results = {}
    ref_out = None
    for name, knobs, ts in variants:
        das_pallas.ABLATE.clear()
        das_pallas.ABLATE.update(knobs)
        das_pallas.TILE_SUB = ts
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()
        t0 = time.perf_counter()
        try:
            ms = timeit(lambda: das_jit(rf, dyn, st))
            out = np.abs(to_host(das_jit(rf, dyn, st)))
            if ref_out is None:
                ref_out = out
                err = 0.0
            else:
                err = float(np.linalg.norm(out - ref_out)
                            / max(np.linalg.norm(ref_out), 1e-9))
        except Exception as e:
            results[name] = {"error": str(e)[:300]}
            print(json.dumps({name: results[name]}), flush=True)
            continue
        compile_s = time.perf_counter() - t0
        results[name] = {"ms": round(ms, 2), "compile_s": round(compile_s, 1),
                         "nrmse_vs_first": round(err, 8)}
        print(json.dumps({name: results[name]}), flush=True)

    das_pallas.ABLATE.clear()
    das_pallas.TILE_SUB = 16
    das_pallas._das_call.cache_clear()
    print(json.dumps({"all": results}), flush=True)


if __name__ == "__main__":
    main()
