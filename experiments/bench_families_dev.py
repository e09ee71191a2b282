"""Family benchmarks with ON-DEVICE RF generation.

The tunneled attach's H2D bandwidth degrades ~100x for hours at a time
while compute and small readbacks stay healthy; uploading the HERCULES
input (256 MB) in such a window takes hours.  Timing is RF-data-
independent, so inputs are jax.random-generated on the chip.

Usage:  PYTHONPATH=/root/.axon_site:. python experiments/bench_families_dev.py [names...]
        names filter by substring (default: all).
"""
import dataclasses
import json
import sys
import time


def _timeit(fn, sync, warmup=2, iters=8):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from ogl_beamforming_tpu.models import presets
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    only = sys.argv[1:]

    def wanted(name):
        return not only or any(s in name for s in only)

    def dev_normal(shape, key=0):
        return jax.jit(lambda _: jax.random.normal(
            jax.random.key(key), shape, jnp.float32))(0)

    def dev_complex(shape, key=0):
        return jax.jit(lambda _: jax.lax.complex(
            jax.random.normal(jax.random.key(key), shape, jnp.float32),
            jax.random.normal(jax.random.key(key + 1), shape,
                              jnp.float32)))(0)

    def das_stage(p, pipe, iq):
        plan = build_plan(p, pipe, {})
        sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
        st = dataclasses.replace(sd.das, iq=iq)
        dyn = dict(plan.dyn["das"])
        dyn["das_tables"] = das_pallas.das_activity_tables(dyn, st)
        return st, dyn

    cases = []

    p, pipe = presets.plane_wave_2d(channel_count=256, sample_count=4096,
                                    output_points=(512, 1024))
    cases.append(("headline", p, pipe, True, (256, 1, 4096), 32))

    p, pipe = presets.forces_compounding(channel_count=128, transmit_count=16,
                                         sample_count=2048,
                                         output_points=(256, 512),
                                         demodulate=False)
    cases.append(("forces_chain_das", p, pipe, False, (128, 16, 2048), 16))

    p, pipe = presets.forces_compounding(channel_count=256, transmit_count=16,
                                         sample_count=2048,
                                         output_points=(512, 1024),
                                         demodulate=False)
    cases.append(("forces_big", p, pipe, False, (256, 16, 2048), 8))

    p, pipe = presets.hercules_3d(channel_count=128, acquisition_count=128,
                                  sample_count=4096,
                                  output_points=(96, 96, 96))
    cases.append(("hercules_3d", p, pipe, False, (128, 128, 4096), 3))

    p, pipe, _sparse = presets.uforces_volumetric()
    sd = None
    cases.append(("uforces_3d", p, pipe, False, None, 2))

    for name, p, pipe, iq, shape, iters in cases:
        if not wanted(name):
            continue
        st, dyn = das_stage(p, pipe, iq)
        if shape is None:
            shape = (st.channel_count, st.acquisition_count, st.sample_count)
        rf = dev_complex(shape) if iq else dev_normal(shape)
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()
        try:
            ms = _timeit(lambda: das_jit(rf, dyn, st), sync,
                         warmup=2, iters=iters)
            print(json.dumps({name: round(ms, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
