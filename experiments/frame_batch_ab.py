"""Hardware A/B: frame-batched DAS (frame_batch=B) vs B single-frame
launches on the headline config.

The per-pair delay/index math, apodization, chunk predication, and grid
overhead are geometry-only; batching shares them and only the RF gathers
scale with B.  Floor decomposition at 5.8 ms put gathers at ~2.3 ms and
everything else ~3.5 ms -> predicted per-frame ~2.3 + 3.5/B ms.
"""
import json
import time


def main():
    import dataclasses

    import numpy as np
    import jax

    from ogl_beamforming_tpu.models.presets import plane_wave_2d
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync, to_host

    c, s = 256, 4096
    p, pipe = plane_wave_2d(channel_count=c, sample_count=s,
                            output_points=(512, 1024))
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st1 = dataclasses.replace(sd.das, iq=True)
    dyn = plan.dyn["das"]
    rng = np.random.default_rng(3)

    def dev_iq(shape):
        re = rng.standard_normal(shape).astype(np.float32)
        im = rng.standard_normal(shape).astype(np.float32)
        return jax.jit(lambda a, b: jax.lax.complex(a, b))(re, im)

    def measure(name, st, rf, frames, iters=32, knobs=None):
        das_pallas.ABLATE.clear()
        if knobs:
            das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()
        try:
            for _ in range(3):
                sync(das_jit(rf, dyn, st))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = das_jit(rf, dyn, st)
            sync(out)
            ms = (time.perf_counter() - t0) / iters / frames * 1e3
            print(json.dumps({name: round(ms, 2), "unit": "ms/frame"}),
                  flush=True)
            return out
        except Exception as e:
            print(json.dumps({name: str(e)[:300]}), flush=True)
            return None

    rf1 = dev_iq((c, 1, s))
    measure("single", st1, rf1, 1)
    ref = to_host(das_jit(rf1, dyn, st1))

    for B in (2, 4, 8):
        stb = dataclasses.replace(st1, frame_batch=B)
        rfb = jax.jit(lambda x, n=B: jax.numpy.broadcast_to(
            x, (n,) + x.shape))(rf1)
        out = measure(f"batch{B}", stb, rfb, B)
        if out is not None and B == 4:
            o = to_host(out)
            err = float(np.linalg.norm(o[0] - ref) / np.linalg.norm(ref))
            print(json.dumps({"batch4_vs_single_nrmse": err}), flush=True)
    # batch with smaller channel blocks (VMEM/register pressure relief)
    st4 = dataclasses.replace(st1, frame_batch=4)
    rf4 = jax.jit(lambda x: jax.numpy.broadcast_to(x, (4,) + x.shape))(rf1)
    measure("batch4_cb16", st4, rf4, 4, knobs={"ch_block": 16})
    das_pallas.ABLATE.clear()
    das_pallas._das_call.cache_clear()


if __name__ == "__main__":
    main()
