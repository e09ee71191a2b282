"""Headline knob re-sweep under packed-IQ gathers (register pressure
halved per gather word — ch_block/tile knobs that lost in round 2 may
now win)."""
import json
import time


def main():
    import dataclasses

    import numpy as np
    import jax

    from ogl_beamforming_tpu.models.presets import plane_wave_2d
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    def measure(name, knobs, st, dyn, rf, iters=32):
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

    c, s = 256, 4096
    p, pipe = plane_wave_2d(channel_count=c, sample_count=s,
                            output_points=(512, 1024))
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st = dataclasses.replace(sd.das, iq=True)
    dyn = plan.dyn["das"]
    rng = np.random.default_rng(3)
    re = rng.standard_normal((c, 1, s)).astype(np.float32)
    im = rng.standard_normal((c, 1, s)).astype(np.float32)
    rf = jax.jit(lambda a, b: jax.lax.complex(a, b))(re, im)

    measure("default", {}, st, dyn, rf)
    measure("cb32", {"ch_block": 32}, st, dyn, rf)
    measure("cb32_ps32", {"ch_block": 32, "pred_share": 32}, st, dyn, rf)
    measure("ts32", {"tile_sub": 32}, st, dyn, rf)
    measure("cb32_ts32", {"ch_block": 32, "tile_sub": 32}, st, dyn, rf)
    measure("ts8", {"tile_sub": 8}, st, dyn, rf)
    measure("group2", {"group": 2}, st, dyn, rf)
    das_pallas.ABLATE.clear()
    das_pallas._das_call.cache_clear()


if __name__ == "__main__":
    main()
