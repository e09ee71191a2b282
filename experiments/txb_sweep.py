"""tx_block defaults confirmation: HERCULES new default + FORCES configs."""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ogl_beamforming_tpu.models.presets import (forces_compounding,
                                                    hercules_3d)
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    def measure(name, knobs, p, pipe, iters=8):
        plan = build_plan(p, pipe, {})
        sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
        st = sd.das
        dyn = plan.dyn["das"]
        c, a, s = st.channel_count, st.acquisition_count, st.sample_count
        rf = jnp.asarray(np.random.randn(c, a, s).astype(np.float32))
        das_pallas.ABLATE.clear()
        das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()
        try:
            for _ in range(2):
                sync(das_jit(rf, dyn, st))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = das_jit(rf, dyn, st)
            sync(out)
            ms = (time.perf_counter() - t0) / iters * 1e3
            print(json.dumps({name: round(ms, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:200]}), flush=True)

    hp, hpipe = hercules_3d()
    measure("herc_newdefault", {}, hp, hpipe, iters=4)
    measure("herc_txb16", {"tx_block": 16, "pred_share": 128}, hp, hpipe,
            iters=4)

    # FORCES big (C=256 A=16 S=2048 512x1024 linear) — r2: 27.6 ms
    fp, fpipe = forces_compounding(channel_count=256, transmit_count=16,
                                   sample_count=2048,
                                   output_points=(512, 1024),
                                   demodulate=False)
    fp.interpolation_mode = 1  # linear, as the r2 table
    measure("forces_big", {}, fp, fpipe)
    measure("forces_big_txb8", {"tx_block": 8}, fp, fpipe)
    measure("forces_big_txb8_s64", {"tx_block": 8, "pred_share": 64},
            fp, fpipe)
    das_pallas.ABLATE.clear()
    das_pallas._das_call.cache_clear()


if __name__ == "__main__":
    main()
