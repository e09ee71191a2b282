"""Round-5 tile_grp A/B: TG row-tiles per grid step vs the round-4 bests.

The round-4 floor decomposition (PERFORMANCE.md) showed both 3D volume
families spend ~1/3 of their time in fixed per-grid-step cost, and the
dominant term decomposes as per-step RF re-fetch HBM traffic (the
channel x transmit block sweep streams the ENTIRE RF array once per
voxel tile): HERCULES 96^3 576 tiles x 128 MB = 74 GB ~= 90 ms at
819 GB/s vs the measured 116.7 ms fixed component; uFORCES 128^3
1024 x 132 MB ~= 165 of 198.5 ms.  ``tile_grp`` (ops/das_pallas.py)
makes TG consecutive row-tiles share one sweep, dividing that traffic
by TG while keeping 16-row bound/predicate granularity.

Numerics gate: each family's winning knob set is compared on-device
against the default-knob kernel output (NRMSE <= 1e-5 expected — same
math, different step grouping) before the tuned entry is persisted.

Run on hardware:
  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/tile_grp_ab.py \
      [--families hercules,uforces,forces_big,headline] 2>&1 | tee /tmp/tg_ab.log
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="hercules,uforces,forces_big,"
                    "headline")
    ap.add_argument("--iters", type=int, default=0,
                    help="override per-case iters (0 = per-case default)")
    ap.add_argument("--passes", type=int, default=1)
    args = ap.parse_args()
    fams = set(args.families.split(","))

    import jax
    import jax.numpy as jnp

    from ogl_beamforming_tpu.models import presets
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import to_host

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

    def dev_normal(shape, key=0, cplx=False):
        def make(_):
            x = jax.random.normal(jax.random.key(key), shape, jnp.float32)
            if cplx:
                y = jax.random.normal(jax.random.key(key + 1), shape,
                                      jnp.float32)
                return jax.lax.complex(x, y)
            return x
        return jax.jit(make)(0)

    def numerics_gate(name, rf, dyn, st, knobs):
        """Winner-vs-default on-device NRMSE (coherency: both planes)."""
        key = das_pallas._tune_key(st)
        saved = das_pallas.TUNED.get(key)
        try:
            das_pallas.TUNED.pop(key, None)
            das_pallas._das_call.cache_clear()
            das_jit.clear_cache()
            base = das_jit(rf, dyn, st)
            base = [to_host(b) for b in (base if isinstance(base, tuple)
                                         else (base,))]
            das_pallas.TUNED[key] = dict(knobs)
            das_pallas._das_call.cache_clear()
            das_jit.clear_cache()
            out = das_jit(rf, dyn, st)
            out = [to_host(o) for o in (out if isinstance(out, tuple)
                                        else (out,))]
            errs = [float(np.linalg.norm(o - b) / max(np.linalg.norm(b),
                                                      1e-30))
                    for o, b in zip(out, base)]
            print(f"   numerics {name}: nrmse {errs}", flush=True)
            return max(errs)
        finally:
            if saved is None:
                das_pallas.TUNED.pop(key, None)
            else:
                das_pallas.TUNED[key] = saved
            das_pallas._das_call.cache_clear()
            das_jit.clear_cache()

    def case(name, rf, dyn, st, candidates, iters):
        print(f"== {name}", flush=True)
        if args.iters:
            iters = args.iters
        best, results = das_pallas.autotune_das(
            rf, dyn, st, candidates=candidates, iters=iters, warmup=1,
            passes=args.passes, verbose=True)
        for k, v in sorted(results.items(),
                           key=lambda kv: kv[1] or float("inf")):
            print(f"   {k}: "
                  f"{'fail' if v is None else round(v * 1e3, 2)}", flush=True)
        if best and best.get("tile_grp", 1) > 1:
            err = numerics_gate(name, rf, dyn, st, best)
            if err > 1e-3:
                print(f"   !! numerics gate FAILED ({err:.2e}) — "
                      "reverting to incumbent", flush=True)
                das_pallas.TUNED.pop(das_pallas._tune_key(st), None)
                das_pallas._das_call.cache_clear()
                das_jit.clear_cache()
                return
        print(f"   best={best}", flush=True)
        das_pallas.save_tuned(out_path)

    if "hercules" in fams:
        # THE BENCH KEY (S=2048; the round-4 sweep tuned S=4096 by
        # mistake, so the bench has been running family defaults)
        p, pipe = presets.hercules_3d()
        plan = build_plan(p, pipe, {})
        sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
        st = dataclasses.replace(sd.das, iq=False)
        rf = dev_normal((st.channel_count, st.acquisition_count,
                         st.sample_count))
        case("hercules_3d S=2048", rf, plan.dyn["das"], st,
             [{},                                 # incumbent (defaults)
              {"tile_grp": 8}, {"tile_grp": 16},
              {"tile_grp": 16, "ch_block": 16}],
             iters=3)

    if "uforces" in fams:
        p, pipe, sparse = presets.uforces_volumetric()
        plan = build_plan(p, pipe, {}, sparse_elements=sparse)
        sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
        st = dataclasses.replace(sd.das, iq=False)
        rf = dev_normal((st.channel_count, st.acquisition_count,
                         st.sample_count))
        case("uforces_3d", rf, plan.dyn["das"], st,
             [{"tx_block": 32},                   # incumbent
              {"tile_grp": 8, "tx_block": 32},
              {"tile_grp": 16, "tx_block": 32}],
             iters=2)

    if "forces_big" in fams:
        from ogl_beamforming_tpu.params.enums import (AcquisitionKind,
                                                      DataKind,
                                                      InterpolationMode,
                                                      ShaderKind)
        from ogl_beamforming_tpu.params.types import Parameters
        from ogl_beamforming_tpu.pipeline.spec import PipelineSpec
        from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz
        pitch = 0.3e-3
        c, a, s, nx, nz = 256, 16, 2048, 512, 1024
        p = Parameters(
            sample_count=s, channel_count=c, acquisition_count=a,
            sampling_frequency=20e6, demodulation_frequency=5e6,
            speed_of_sound=1500.0, f_number=0.5,
            acquisition_kind=AcquisitionKind.FORCES,
            interpolation_mode=InterpolationMode.Linear,
            das_voxel_transform=das_transform_2d_xz([-0.06, 0.01],
                                                    [0.06, 0.165]),
            xdc_element_pitch=np.array([pitch, pitch], np.float32),
            output_points=np.array([nx, nz, 1, 0], np.int32))
        plan = build_plan(p, PipelineSpec.from_shaders(
            [ShaderKind.Decode, ShaderKind.DAS], DataKind.Int16), {})
        sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
        st = dataclasses.replace(sd.das, iq=False)
        rf = dev_normal((c, a, s))
        case("forces_big", rf, plan.dyn["das"], st,
             [{"tx_block": 8},                    # incumbent
              {"tile_grp": 8, "tx_block": 8},
              {"tile_grp": 16, "tx_block": 8}],
             iters=6)

    if "headline" in fams:
        from ogl_beamforming_tpu.params.enums import DataKind
        p, pipe = presets.plane_wave_2d(channel_count=256, sample_count=4096,
                                        output_points=(512, 1024),
                                        data_kind=DataKind.Float32Complex)
        plan = build_plan(p, pipe, {})
        sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
        st = sd.das
        rf = dev_normal((st.channel_count, st.acquisition_count,
                         st.sample_count), cplx=True)
        case("headline plane-wave IQ", rf, plan.dyn["das"], st,
             [{},                                 # incumbent
              {"tile_grp": 8}],
             iters=16)


if __name__ == "__main__":
    main()
