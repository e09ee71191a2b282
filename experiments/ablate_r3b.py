"""Round-3 sweep 2: knob re-sweep on top of fast_apod.

The acc-scratch RMW at chunk-group boundaries is ~16 vreg-ops per
(pair, group): larger groups amortize it at the cost of extra executed
chunks (span 3.7 of nq=32).  Also re-tests tile rows / share / ch_block
under the cheaper apodization.
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
    st = dataclasses.replace(sd.das, iq=True)
    dyn = plan.dyn["das"]
    re = np.random.randn(c, 1, s).astype(np.float32)
    im = np.random.randn(c, 1, s).astype(np.float32)
    rf = jax.jit(lambda a, b: jax.lax.complex(a, b))(jnp.asarray(re),
                                                     jnp.asarray(im))

    def timeit(fn, warmup=2, iters=32):
        for _ in range(warmup):
            sync(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / iters * 1e3

    base = {"fast_apod": 1}
    variants = [
        ("fa", {}),
        ("fa_g2", {"group": 2}),
        ("fa_g4", {"group": 4}),
        ("fa_ts8", {"tile_sub": 8}),
        ("fa_ts8_g2", {"tile_sub": 8, "group": 2}),
        ("fa_share8", {"pred_share": 8}),
        ("fa_share4", {"pred_share": 4}),
        ("fa_cb32", {"ch_block": 32}),
        ("fa_cb32_share32", {"ch_block": 32, "pred_share": 32}),
        ("fa_m4", {"margin": 4.0}),
        ("fa_m0", {"margin": 0.0}),
    ]
    for name, knobs in variants:
        das_pallas.ABLATE.clear()
        das_pallas.ABLATE.update(base)
        das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()
        try:
            ms = timeit(lambda: das_jit(rf, dyn, st))
            print(json.dumps({name: round(ms, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:200]}), flush=True)
    das_pallas.ABLATE.clear()
    das_pallas._das_call.cache_clear()


if __name__ == "__main__":
    main()
