"""Round-3 sweep 3: budget decomposition of the u-form + fast-rot kernel.

Headline variants: new default, exact_rot / exact_apod (regressions),
no_rotation / no_gather (component costs), linear / nearest interpolation
(tap-count share).  Numerics check vs the exact path.
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
    from ogl_beamforming_tpu.params.enums import InterpolationMode
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

    ref = None
    variants = [
        ("exact", {"exact_rot": 1, "exact_apod": 1}, st),
        ("default", {}, st),
        ("no_rotation", {"no_rotation": 1}, st),
        ("no_gather", {"no_gather": 1}, st),
        ("linear", {}, dataclasses.replace(
            st, interpolation_mode=InterpolationMode.Linear)),
        ("nearest", {}, dataclasses.replace(
            st, interpolation_mode=InterpolationMode.Nearest)),
    ]
    for name, knobs, stv in variants:
        das_pallas.ABLATE.clear()
        das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()
        try:
            ms = timeit(lambda: das_jit(rf, dyn, stv))
            row = {name: round(ms, 2)}
            out = np.asarray(jax.jit(jnp.abs)(das_jit(rf, dyn, stv)))
            if name == "exact":
                ref = out
            elif name == "default":
                row["nrmse_vs_exact"] = float(
                    np.linalg.norm(out - ref) / np.linalg.norm(ref))
            print(json.dumps(row), flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:300]}), flush=True)
    das_pallas.ABLATE.clear()
    das_pallas._das_call.cache_clear()


if __name__ == "__main__":
    main()
