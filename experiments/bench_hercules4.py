"""HERCULES knob probes on top of block bounds: bigger tiles, groups."""
import json, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from ogl_beamforming_tpu.models.presets import hercules_3d
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync, to_host

    p, pipe = hercules_3d()
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st, dyn = sd.das, plan.dyn["das"]
    rf = jnp.asarray(np.random.randn(128, 128, 2048).astype(np.float32))

    def measure(knobs, iters=3):
        das_pallas.ABLATE.clear(); das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear(); das_jit.clear_cache()
        sync(das_jit(rf, dyn, st))
        t0 = time.perf_counter()
        for _ in range(iters): out = das_jit(rf, dyn, st)
        sync(out)
        return (time.perf_counter() - t0) / iters * 1e3

    ref = None
    for name, knobs in [("default", {}), ("ts64", {"tile_sub": 64}),
                        ("ts16", {"tile_sub": 16}),
                        ("g8", {"group": 8}),
                        ("share4", {"pred_share": 4}),
                        ("cb16", {"ch_block": 16})]:
        try:
            ms = measure(knobs)
            out = np.abs(to_host(das_jit(rf, dyn, st)))
            if ref is None: ref, err = out, 0.0
            else:
                err = float(np.linalg.norm(out - ref)
                            / max(np.linalg.norm(ref), 1e-9))
            print(json.dumps({name: {"ms": round(ms, 1),
                                     "nrmse": round(err, 9)}}), flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:200]}), flush=True)
    das_pallas.ABLATE.clear(); das_pallas._das_call.cache_clear()

if __name__ == "__main__":
    main()
