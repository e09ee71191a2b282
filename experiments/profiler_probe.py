"""Probe whether jax.profiler works on the axon TPU runtime (ROADMAP #7:
per-dispatch device stage times; the reference brackets every dispatch
with GPU timestamps, vulkan.c:2616-2637).

Writes a trace of one demod-chain frame to /tmp/jaxprof and reports
whether device-side events were captured.
"""
import glob
import json
import os


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ogl_beamforming_tpu.models.presets import forces_compounding
    from ogl_beamforming_tpu.params.enums import FilterKind
    from ogl_beamforming_tpu.params.types import (FilterParameters,
                                                  KaiserFilterParameters)
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.filters import make_filter
    from ogl_beamforming_tpu.utils.transfer import sync

    p, pipe = forces_compounding(channel_count=32, transmit_count=8,
                                 sample_count=1024, sampling_frequency=20e6,
                                 demodulation_frequency=5e6,
                                 output_points=(64, 128), demodulate=True)
    fp = FilterParameters(kind=FilterKind.Kaiser, sampling_frequency=20e6,
                          kaiser=KaiserFilterParameters(2e6, 4.0, 16))
    plan = build_plan(p, pipe, {0: make_filter(fp)})
    rf = np.random.default_rng(0).integers(
        -1024, 1024, (32, 8, 1024)).astype(np.int16)
    sync(plan(rf))                      # compile outside the trace

    logdir = "/tmp/jaxprof"
    os.makedirs(logdir, exist_ok=True)
    try:
        with jax.profiler.trace(logdir):
            sync(plan(rf))
        files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
        traces = [f for f in files if f.endswith((".pb", ".pb.gz",
                                                  ".trace.json.gz",
                                                  ".xplane.pb"))]
        print(json.dumps({"profiler": "ok", "files": len(files),
                          "trace_files": [os.path.basename(t)
                                          for t in traces][:8]}))
    except Exception as e:
        print(json.dumps({"profiler": "failed",
                          "error": f"{type(e).__name__}: {e}"[:300]}))


if __name__ == "__main__":
    main()
