"""Final headline knob sweep under 32-frame sustained timing."""
import dataclasses, json, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from ogl_beamforming_tpu.models.presets import plane_wave_2d
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    c, s, nx, nz = 256, 4096, 512, 1024
    p, pipe = plane_wave_2d(channel_count=c, sample_count=s,
                            output_points=(nx, nz))
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st = dataclasses.replace(sd.das, iq=True)
    dyn = plan.dyn["das"]
    re = np.random.randn(c, 1, s).astype(np.float32)
    im = np.random.randn(c, 1, s).astype(np.float32)
    rf = jax.jit(lambda a, b: jax.lax.complex(a, b))(jnp.asarray(re), jnp.asarray(im))

    def timeit(fn, warmup=2, iters=32):
        for _ in range(warmup): sync(fn())
        t0 = time.perf_counter()
        for _ in range(iters): out = fn()
        sync(out)
        return (time.perf_counter() - t0) / iters * 1e3

    variants = [
        ("default", {}),
        ("g2", {"group": 2}),
        ("cb4", {"ch_block": 4}),
        ("share4", {"pred_share": 4}),
        ("ts32", {"tile_sub": 32}),
        ("m4", {"margin": 4.0}),
        ("ts8", {"tile_sub": 8}),
    ]
    for name, knobs in variants:
        das_pallas.ABLATE.clear(); das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear(); das_jit.clear_cache()
        try:
            ms = timeit(lambda: das_jit(rf, dyn, st))
            print(json.dumps({name: round(ms, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:200]}), flush=True)
    das_pallas.ABLATE.clear(); das_pallas._das_call.cache_clear()

if __name__ == "__main__":
    main()
