"""HERCULES tile/tx-block sweep under the u-form kernel."""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ogl_beamforming_tpu.models.presets import hercules_3d
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    p, pipe = hercules_3d()
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st = sd.das
    dyn = plan.dyn["das"]
    c, a, s = st.channel_count, st.acquisition_count, st.sample_count
    rf = jnp.asarray(np.random.randn(c, a, s).astype(np.float32))

    for name, knobs in [("ts32", {"tile_sub": 32}),
                        ("ts8", {"tile_sub": 8}),
                        ("txb8", {"tx_block": 8}),
                        ("txb8_share", {"tx_block": 8, "pred_share": 64}),
                        ("txb2", {"tx_block": 2}),
                        ("cb4", {"ch_block": 4})]:
        das_pallas.ABLATE.clear()
        das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()
        try:
            for _ in range(2):
                sync(das_jit(rf, dyn, st))
            t0 = time.perf_counter()
            for _ in range(4):
                out = das_jit(rf, dyn, st)
            sync(out)
            ms = (time.perf_counter() - t0) / 4 * 1e3
            print(json.dumps({name: round(ms, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:200]}), flush=True)
    das_pallas.ABLATE.clear()
    das_pallas._das_call.cache_clear()


if __name__ == "__main__":
    main()
