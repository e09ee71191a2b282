"""Row-halves A/B on TPU: headline, HERCULES 3D, FORCES-big."""
import json
import time

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ogl_beamforming_tpu.models.presets import (forces_compounding,
                                                    hercules_3d,
                                                    plane_wave_2d)
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    def measure(name, knobs, st, dyn, rf, iters=16):
        das_pallas.ABLATE.clear()
        das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()
        try:
            for _ in range(3):
                sync(das_jit(rf, dyn, st))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = das_jit(rf, dyn, st)
            sync(out)
            ms = (time.perf_counter() - t0) / iters * 1e3
            print(json.dumps({name: round(ms, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:300]}), flush=True)

    def stage(p, pipe, iq=None):
        plan = build_plan(p, pipe, {})
        sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
        st = sd.das if iq is None else dataclasses.replace(sd.das, iq=iq)
        return st, plan.dyn["das"]

    c, s = 256, 4096
    p, pipe = plane_wave_2d(channel_count=c, sample_count=s,
                            output_points=(512, 1024))
    st, dyn = stage(p, pipe, iq=True)
    re = np.random.randn(c, 1, s).astype(np.float32)
    im = np.random.randn(c, 1, s).astype(np.float32)
    rf = jax.jit(lambda a, b: jax.lax.complex(a, b))(re, im)
    measure("headline_rh2", {}, st, dyn, rf, iters=32)
    measure("headline_rh1", {"row_halves": 1}, st, dyn, rf, iters=32)

    fp, fpipe = forces_compounding(channel_count=256, transmit_count=16,
                                   sample_count=2048,
                                   output_points=(512, 1024),
                                   demodulate=False)
    fst, fdyn = stage(fp, fpipe)
    frf = jnp.asarray(np.random.randn(256, 16, 2048).astype(np.float32))
    measure("forces_big_rh2", {"tx_block": 8}, fst, fdyn, frf)
    measure("forces_big_rh1", {"tx_block": 8, "row_halves": 1},
            fst, fdyn, frf)

    hp, hpipe = hercules_3d()
    hst, hdyn = stage(hp, hpipe)
    hrf = jnp.asarray(np.random.randn(
        hst.channel_count, hst.acquisition_count,
        hst.sample_count).astype(np.float32))
    measure("herc_rh2", {}, hst, hdyn, hrf, iters=4)
    measure("herc_rh1", {"row_halves": 1}, hst, hdyn, hrf, iters=4)
    das_pallas.ABLATE.clear()
    das_pallas._das_call.cache_clear()


if __name__ == "__main__":
    main()
