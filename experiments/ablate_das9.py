"""Headline ablations round 9: post-lateral-layout knob/diagnostic batch."""
import dataclasses, json, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from ogl_beamforming_tpu.models.presets import plane_wave_2d
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync, to_host

    c, s, nx, nz = 256, 4096, 512, 1024
    p, pipe = plane_wave_2d(channel_count=c, sample_count=s,
                            output_points=(nx, nz))
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st = dataclasses.replace(sd.das, iq=True)
    dyn = plan.dyn["das"]
    re = np.random.randn(c, 1, s).astype(np.float32)
    im = np.random.randn(c, 1, s).astype(np.float32)
    rf = jax.jit(lambda a, b: jax.lax.complex(a, b))(jnp.asarray(re),
                                                     jnp.asarray(im))

    def timeit(fn, warmup=2, iters=32):
        for _ in range(warmup): sync(fn())
        t0 = time.perf_counter()
        for _ in range(iters): out = fn()
        sync(out)
        return (time.perf_counter() - t0) / iters * 1e3

    variants = [
        ("default", {}),
        ("cb16_share16", {"ch_block": 16, "pred_share": 16}),
        ("ts8_cb16", {"tile_sub": 8, "ch_block": 16, "pred_share": 16}),
        ("margin0", {"margin": 0.0}),
        ("norot_diag", {"no_rotation": True}),
        ("nogather_diag", {"no_gather": True}),
    ]
    ref = None
    for name, knobs in variants:
        das_pallas.ABLATE.clear(); das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear(); das_jit.clear_cache()
        t0 = time.perf_counter()
        try:
            ms = timeit(lambda: das_jit(rf, dyn, st))
            out = np.abs(to_host(das_jit(rf, dyn, st)))
            if ref is None: ref, err = out, 0.0
            else:
                err = float(np.linalg.norm(out - ref)
                            / max(np.linalg.norm(ref), 1e-9))
            print(json.dumps({name: {"ms": round(ms, 2),
                                     "compile_s": round(time.perf_counter()-t0, 1),
                                     "nrmse": round(err, 8)}}), flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:250]}), flush=True)
    das_pallas.ABLATE.clear(); das_pallas._das_call.cache_clear()

if __name__ == "__main__":
    main()
