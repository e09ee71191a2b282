"""Decompose the headline's non-gather floor.

Measures the BASELINE plane-wave headline under nested ablations:
  full            -> total
  no_gather       -> total - gathers
  no_chunk_loop   -> per-pair prep (delay/interp/rotation) + fixed
  no_unit         -> grid + world + output fixed cost
giving the split: gathers / chunk-loop-non-gather / per-pair prep / fixed.
"""
import json
import time

import numpy as np


def main():
    import dataclasses

    import jax

    from ogl_beamforming_tpu.models.presets import plane_wave_2d
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    c, s = 256, 4096
    p, pipe = plane_wave_2d(channel_count=c, sample_count=s,
                            output_points=(512, 1024))
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st = dataclasses.replace(sd.das, iq=True)
    dyn = plan.dyn["das"]
    re = np.random.randn(c, 1, s).astype(np.float32)
    im = np.random.randn(c, 1, s).astype(np.float32)
    rf = jax.jit(lambda a, b: jax.lax.complex(a, b))(re, im)

    def measure(name, knobs, iters=32):
        das_pallas.ABLATE.clear()
        das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()
        try:
            for _ in range(4):
                sync(das_jit(rf, dyn, st))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = das_jit(rf, dyn, st)
            sync(out)
            ms = (time.perf_counter() - t0) / iters * 1e3
            print(json.dumps({name: round(ms, 2)}), flush=True)
            return ms
        except Exception as e:
            print(json.dumps({name: str(e)[:200]}), flush=True)
            return None

    full = measure("full", {})
    ng = measure("no_gather", {"no_gather": 1})
    ncl = measure("no_chunk_loop", {"no_chunk_loop": 1})
    nu = measure("no_unit", {"no_unit": 1})
    das_pallas.ABLATE.clear()
    das_pallas._das_call.cache_clear()
    if None not in (full, ng, ncl, nu):
        print(json.dumps({
            "gathers": round(full - ng, 2),
            "chunk_nongather": round(ng - ncl, 2),
            "pair_prep": round(ncl - nu, 2),
            "fixed": round(nu, 2)}), flush=True)


if __name__ == "__main__":
    main()
