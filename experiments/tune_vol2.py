import json, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from ogl_beamforming_tpu.models.presets import hercules_3d, uforces_volumetric
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync
    import bench

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

    p, pipe = hercules_3d()
    st, dyn, rf = setup(p, pipe)
    for name, knobs in [("hc_g1_ts16", {"group": 1, "tile_sub": 16}),
                        ("hc_g2_ts16", {"group": 2, "tile_sub": 16})]:
        print(json.dumps({name: round(measure(st, dyn, rf, knobs), 1)}), flush=True)

    # 2D forces chain sensitivity to group
    for g in (2, 4):
        das_pallas.ABLATE.clear(); das_pallas.ABLATE.update({"group": g})
        das_pallas._das_call.cache_clear(); das_jit.clear_cache()
        r = bench.bench_das_chain(iters=6)
        print(json.dumps({f"chain_g{g}": round(r["ms_per_frame"], 1)}), flush=True)
    das_pallas.ABLATE.clear(); das_pallas._das_call.cache_clear()

if __name__ == "__main__":
    main()
