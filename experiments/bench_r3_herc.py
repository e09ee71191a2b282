"""HERCULES 3D (preset config, round-2 comparable) after the u-form
refactor, plus knob re-sweep and uFORCES volumetric."""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ogl_beamforming_tpu.models.presets import (hercules_3d,
                                                    uforces_volumetric)
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    def measure(knobs, p, pipe, iters=4, **bp):
        plan = build_plan(p, pipe, {}, **bp)
        sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
        st = sd.das
        dyn = plan.dyn["das"]
        c, a, s = st.channel_count, st.acquisition_count, st.sample_count
        rf = jnp.asarray(np.random.randn(c, a, s).astype(np.float32))
        das_pallas.ABLATE.clear()
        das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()
        for _ in range(2):
            sync(das_jit(rf, dyn, st))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = das_jit(rf, dyn, st)
        sync(out)
        return (time.perf_counter() - t0) / iters * 1e3

    p, pipe = hercules_3d()
    for name, knobs in [("herc_uform", {}),
                        ("herc_exact_apod", {"exact_apod": 1}),
                        ("herc_ts16", {"tile_sub": 16}),
                        ("herc_g2", {"group": 2}),
                        ("herc_cb16", {"ch_block": 16})]:
        try:
            print(json.dumps({name: round(measure(knobs, p, pipe), 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:200]}), flush=True)

    p, pipe, sparse = uforces_volumetric()
    try:
        print(json.dumps({"uforces_3d": round(
            measure({}, p, pipe, sparse_elements=sparse), 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"uforces_3d": str(e)[:200]}), flush=True)
    das_pallas.ABLATE.clear()
    das_pallas._das_call.cache_clear()


if __name__ == "__main__":
    main()
