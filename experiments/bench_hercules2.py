"""HERCULES knob sweep."""
import json, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from ogl_beamforming_tpu.models.presets import hercules_3d
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    p, pipe = hercules_3d()
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st, dyn = sd.das, plan.dyn["das"]
    c, a, s = st.channel_count, st.acquisition_count, st.sample_count
    rf = jnp.asarray(np.random.randn(c, a, s).astype(np.float32))

    def measure(knobs):
        das_pallas.ABLATE.clear(); das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear(); das_jit.clear_cache()
        for _ in range(1): sync(das_jit(rf, dyn, st))
        t0 = time.perf_counter()
        for _ in range(3): out = das_jit(rf, dyn, st)
        sync(out)
        return (time.perf_counter() - t0) / 3 * 1e3

    for name, knobs in [("g2", {"group": 2}),
                        ("g4", {"group": 4}),
                        ("ts32", {"tile_sub": 32}),
                        ("ts8", {"tile_sub": 8}),
                        ("m16", {"margin": 16.0})]:
        try:
            print(json.dumps({name: round(measure(knobs), 1)}), flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:200]}), flush=True)
    das_pallas.ABLATE.clear(); das_pallas._das_call.cache_clear()

if __name__ == "__main__":
    main()
