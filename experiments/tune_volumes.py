"""Knob sweep for the 3D presets (uFORCES / HERCULES) on TPU."""
import json, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from ogl_beamforming_tpu.models.presets import uforces_volumetric, hercules_3d
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    def setup(p, pipe, **kw):
        plan = build_plan(p, pipe, {}, **kw)
        sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
        st, dyn = sd.das, plan.dyn["das"]
        rf = jnp.asarray(np.random.randn(
            st.channel_count, st.acquisition_count, st.sample_count
        ).astype(np.float32))
        return st, dyn, rf

    def measure(st, dyn, rf, knobs, iters=3):
        das_pallas.ABLATE.clear(); das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear(); das_jit.clear_cache()
        sync(das_jit(rf, dyn, st))
        t0 = time.perf_counter()
        for _ in range(iters): out = das_jit(rf, dyn, st)
        sync(out)
        return (time.perf_counter() - t0) / iters * 1e3

    p, pipe, sparse = uforces_volumetric()
    st, dyn, rf = setup(p, pipe, sparse_elements=sparse)
    for name, knobs in [("uf_default", {}),
                        ("uf_ts32", {"tile_sub": 32}),
                        ("uf_g2", {"group": 2}),
                        ("uf_cb4", {"ch_block": 4}),
                        ("uf_g1", {"group": 1})]:
        try:
            print(json.dumps({name: round(measure(st, dyn, rf, knobs), 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:200]}), flush=True)

    p, pipe = hercules_3d()
    st, dyn, rf = setup(p, pipe)
    for name, knobs in [("hc_default", {}),
                        ("hc_ts16", {"tile_sub": 16}),
                        ("hc_g2", {"group": 2}),
                        ("hc_cb4", {"ch_block": 4}),
                        ("hc_g1", {"group": 1})]:
        try:
            print(json.dumps({name: round(measure(st, dyn, rf, knobs), 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:200]}), flush=True)
    das_pallas.ABLATE.clear(); das_pallas._das_call.cache_clear()

if __name__ == "__main__":
    main()
