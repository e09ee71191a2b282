"""Round-4 focused 3D follow-up sweep (after the full pretunes).

The full uFORCES pretune found a monotone tx_block response
(8/16/32 -> 563/535/524 ms) with combos past 32 untried; HERCULES
clustered at 391 ms for {tile_sub:16} ~ {row_halves:1} ~ {} with the
big-block candidates failing VMEM.  This sweep measures only the new
round-4 candidates against each family's current best so the tuned
table updates iff something actually wins (autotune_das installs the
winner and save_tuned persists it).

Run on hardware:
  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/sweep_3d_r4.py
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from ogl_beamforming_tpu.models import presets
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.pipeline.plan import build_plan

    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "ogl_beamforming_tpu", "data", "tuned_v5e.json")

    probe = np.arange(8, dtype=np.float32)
    np.asarray(jax.device_put(probe))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(jax.device_put(probe))
    rtt = (time.perf_counter() - t0) / 3 * 1e3
    print(json.dumps({"rtt_ms": round(rtt, 1)}), flush=True)
    if rtt > 80:
        sys.exit(f"tunnel degraded (RTT {rtt:.0f} ms) — refusing to tune")

    def dev_normal(shape, key=0):
        return jax.jit(lambda _: jax.random.normal(
            jax.random.key(key), shape, jnp.float32))(0)

    def case(name, rf, dyn, st, candidates, iters):
        print(f"== {name}", flush=True)
        best, results = das_pallas.autotune_das(rf, dyn, st,
                                                candidates=candidates,
                                                iters=iters, warmup=1)
        print(f"   best={best}", flush=True)
        for k, v in results.items():
            print(f"   {k}: "
                  f"{'fail' if v is None else round(v * 1e3, 2)}", flush=True)
        das_pallas.save_tuned(out_path)

    # uFORCES: current best + the past-32 tx_block probes
    p, pipe, _sparse = presets.uforces_volumetric()
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st = dataclasses.replace(sd.das, iq=False)
    rf = dev_normal((st.channel_count, st.acquisition_count,
                     st.sample_count))
    case("uforces_3d_followup", rf, plan.dyn["das"], st,
         [{"tx_block": 32},                    # incumbent
          {"tx_block": 64},
          {"ch_block": 16, "tx_block": 32},
          {"tx_block": 32, "pred_share": 64},
          {"tx_block": 32, "tile_sub": 32}],
         iters=2)

    # HERCULES: incumbent + bookkeeping combos (fixed-cost-bound family)
    p, pipe = presets.hercules_3d(channel_count=128, acquisition_count=128,
                                  sample_count=4096,
                                  output_points=(96, 96, 96))
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st = dataclasses.replace(sd.das, iq=False)
    rf = dev_normal((128, 128, 4096))
    case("hercules_3d_followup", rf, plan.dyn["das"], st,
         [{"tile_sub": 16},                    # incumbent
          {"tile_sub": 16, "tx_block": 8},
          {"tile_sub": 16, "ch_sub": 4},
          {"tile_sub": 8}],
         iters=3)


if __name__ == "__main__":
    main()
