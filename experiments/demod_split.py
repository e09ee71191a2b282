"""Per-stage device split of the Demodulate -> Decode -> DAS chain
(VERDICT r3 #2: the demod chain costs ~13 ms where decode->DAS is ~6 —
find the missing ~7 ms).

Times each individually-jitted stage with readback-forced sync
(pipeline.plan.compiled_stage_fns — the profile=True machinery), on the
bench_demod_chain configuration, plus the raw ops in isolation:

  * demodulate (pairing + rotation + FIR decimation) alone
  * decode on complex baseband alone
  * DAS alone

Run on hardware: PYTHONPATH=/root/repo:$PYTHONPATH python
experiments/demod_split.py | tee /tmp/demod_split.log
"""
import json
import time

import numpy as np


def timeit(fn, sync, warmup=2, iters=16):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax.numpy as jnp
    from ogl_beamforming_tpu.models.presets import forces_compounding
    from ogl_beamforming_tpu.params.enums import FilterKind
    from ogl_beamforming_tpu.params.types import (FilterParameters,
                                                  KaiserFilterParameters)
    from ogl_beamforming_tpu.pipeline.plan import (build_plan,
                                                   compiled_stage_fns)
    from ogl_beamforming_tpu.utils.filters import make_filter
    from ogl_beamforming_tpu.utils.transfer import sync

    c, a, s, nx, nz = 128, 16, 2048, 256, 512
    p, pipe = forces_compounding(channel_count=c, transmit_count=a,
                                 sample_count=s, sampling_frequency=20e6,
                                 demodulation_frequency=5e6,
                                 output_points=(nx, nz), demodulate=True)
    fp = FilterParameters(kind=FilterKind.Kaiser, sampling_frequency=20e6,
                          kaiser=KaiserFilterParameters(2e6, 4.0, 16))
    plan = build_plan(p, pipe, {0: make_filter(fp)})
    rf = jnp.asarray(np.random.randint(-2048, 2048, (c, a, s))
                     .astype(np.int16))

    # fused end-to-end
    dt_full = timeit(lambda: plan(rf), sync)
    print(json.dumps({"stage": "fused_chain", "ms": round(dt_full * 1e3, 3)}),
          flush=True)

    # per-stage: separately-jitted fns, each timed with readback
    fns = compiled_stage_fns(plan.descriptor)
    names = [sd.kind.name for sd in plan.descriptor.stages]
    x = rf
    for name, fn in zip(names, fns):
        xx = x
        dt = timeit(lambda: fn(xx, plan.dyn), sync)
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3)}),
              flush=True)
        x = fn(x, plan.dyn)

    # demodulate op in isolation at chain shapes, and its pieces
    from ogl_beamforming_tpu.ops.filtering import demodulate, fir_filter
    taps = plan.dyn["taps0"]
    dt = timeit(lambda: demodulate(rf, taps, 5e6, 20e6, 1, False), sync)
    print(json.dumps({"stage": "op:demodulate", "ms": round(dt * 1e3, 3)}),
          flush=True)

    iq = demodulate(rf, taps, 5e6, 20e6, 1, False)
    import jax
    fir = jax.jit(lambda y: fir_filter(y, taps, 1))
    dt = timeit(lambda: fir(iq), sync)
    print(json.dumps({"stage": "op:fir_complex_s1024",
                      "ms": round(dt * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
