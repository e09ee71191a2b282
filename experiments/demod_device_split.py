"""TRUE device-side per-stage split of the Demodulate -> Decode -> DAS
chain, via jax.profiler traces (utils/profiling.py) — supersedes
demod_split.py's wall-clock stage numbers, which bottom out at the
tunnel's ~0.65 ms dispatch floor + ~30 ms readback RTT and so cannot see
sub-millisecond stages.

Also A/Bs the Pallas vs XLA demodulate/FIR backends by device time —
demod_pallas_ab.py's wall numbers were dispatch-bound for both arms.

Run on hardware:
  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/demod_device_split.py
"""
import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ogl_beamforming_tpu.models.presets import forces_compounding
    from ogl_beamforming_tpu.ops import filtering
    from ogl_beamforming_tpu.params.enums import FilterKind
    from ogl_beamforming_tpu.params.types import (FilterParameters,
                                                  KaiserFilterParameters)
    from ogl_beamforming_tpu.pipeline.executor import Beamformer
    from ogl_beamforming_tpu.utils.profiling import device_time

    rng = np.random.default_rng(3)
    c, a, s, nx, nz = 128, 16, 2048, 256, 512
    bf = Beamformer()
    p, pipe = forces_compounding(channel_count=c, transmit_count=a,
                                 sample_count=s, sampling_frequency=20e6,
                                 demodulation_frequency=5e6,
                                 output_points=(nx, nz), demodulate=True)
    bf.push_parameters(p)
    bf.push_pipeline([st.kind for st in pipe.stages], pipe.data_kind,
                     [st.parameter for st in pipe.stages])
    fp = FilterParameters(kind=FilterKind.Kaiser, sampling_frequency=20e6,
                          kaiser=KaiserFilterParameters(2e6, 4.0, 16))
    bf.create_filter(fp, 0)
    rf = rng.integers(-2048, 2048, (c, a, s)).astype(np.int16)

    # per-stage device times through the executor front door
    times = bf.profile_device_stages(rf)
    for kind, t in times:
        print(json.dumps({"stage": kind.name, "device_ms":
                          round(t * 1e3, 4)}), flush=True)

    # whole fused chain device time
    plan = bf._blocks[0]._plan
    prof = device_time(plan.fn, jnp.asarray(rf), plan.dyn)
    print(json.dumps({"stage": "fused_chain",
                      "device_ms": round(prof.module_seconds * 1e3, 4),
                      "top_ops": [(n[:60], round(v * 1e3, 4))
                                  for n, v in prof.top_ops[:6]]}),
          flush=True)

    # demodulate op A/B by device time
    taps = np.kaiser(16, 4.0).astype(np.float32)
    taps /= taps.sum()
    x = jnp.asarray(rf)
    for arm in ("xla", "pallas"):
        filtering.DEMOD_PALLAS = arm == "pallas"
        filtering.demodulate.clear_cache()
        fn = jax.jit(lambda y: filtering.demodulate(y, jnp.asarray(taps),
                                                    5e6, 20e6, 1, False))
        prof = device_time(fn, x)
        print(json.dumps({"stage": "op:demodulate", "arm": arm,
                          "device_ms": round(prof.module_seconds * 1e3, 4),
                          "top_ops": [(n[:60], round(v * 1e3, 4))
                                      for n, v in prof.top_ops[:4]]}),
              flush=True)
    filtering.DEMOD_PALLAS = None

    # complex FIR A/B at post-demod shapes (the Filter-stage case)
    iq_f32 = jnp.asarray(rng.standard_normal((c, a, s)).astype(np.float32))
    for arm in ("xla", "pallas"):
        filtering.DEMOD_PALLAS = arm == "pallas"
        fir = jax.jit(lambda y: filtering.fir_filter(
            jax.lax.complex(y[..., 0::2], y[..., 1::2]),
            jnp.asarray(taps), 1))
        prof = device_time(fir, iq_f32)
        print(json.dumps({"stage": "op:fir_complex", "arm": arm,
                          "device_ms": round(prof.module_seconds * 1e3, 4)}),
              flush=True)
    filtering.DEMOD_PALLAS = None


if __name__ == "__main__":
    main()
