"""HERCULES 3D preset: per-tile prefetched bounds vs round-1 reductions."""
import dataclasses, json, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from ogl_beamforming_tpu.models.presets import hercules_3d, uforces_volumetric
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    def measure(knobs, p, pipe, **bp):
        plan = build_plan(p, pipe, {}, **bp)
        sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
        st = sd.das
        dyn = plan.dyn["das"]
        c, a, s = st.channel_count, st.acquisition_count, st.sample_count
        rf = jnp.asarray(np.random.randn(c, a, s).astype(np.float32))
        das_pallas.ABLATE.clear(); das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear(); das_jit.clear_cache()
        for _ in range(2): sync(das_jit(rf, dyn, st))
        t0 = time.perf_counter()
        for _ in range(4): out = das_jit(rf, dyn, st)
        sync(out)
        return (time.perf_counter() - t0) / 4 * 1e3

    p, pipe = hercules_3d()
    for name, knobs in [("hercules_bounds", {}),
                        ("hercules_round1", {"no_bounds": True})]:
        print(json.dumps({name: round(measure(knobs, p, pipe), 2)}),
              flush=True)
    p, pipe, sparse = uforces_volumetric()
    for name, knobs in [("uforces_now", {})]:
        plan_kw = dict(sparse_elements=sparse)
        print(json.dumps({name: round(measure(knobs, p, pipe, **plan_kw), 2)}),
              flush=True)
    das_pallas.ABLATE.clear(); das_pallas._das_call.cache_clear()

if __name__ == "__main__":
    main()
