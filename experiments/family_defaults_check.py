"""Validate the r3 tx_block family defaults on the remaining configs:
decode->DAS chain (C=128 A=16) and uFORCES 3D (63 sparse tx).
Compares the new default against tx_block=4 (the r2 default)."""
import json
import time

import numpy as np


def main():
    import jax.numpy as jnp

    from ogl_beamforming_tpu.models.presets import (forces_compounding,
                                                    uforces_volumetric)
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

    # chain DAS config (C=128 A=16 S=2048, 256x512) — r2 table: 11.5 ms
    # full-chain; DAS-only portion.
    cp, cpipe = forces_compounding(channel_count=128, transmit_count=16,
                                   sample_count=2048,
                                   output_points=(256, 512),
                                   demodulate=False)
    measure("chain_das_new", {}, cp, cpipe)
    measure("chain_das_txb4", {"tx_block": 4}, cp, cpipe)

    up, upipe, _se = uforces_volumetric()
    measure("uforces3d_txb8", {"tx_block": 8}, up, upipe, iters=2)
    measure("uforces3d_txb4", {"tx_block": 4}, up, upipe, iters=2)
    das_pallas.ABLATE.clear()
    das_pallas._das_call.cache_clear()


if __name__ == "__main__":
    main()
