"""Floor decomposition of the two bench chains' DAS stage (round 4:
the demod chain's cost is its IQ DAS at ~12-13 ms where the real-RF
decode chain's DAS is ~4-5 ms — find where the IQ DAS spends it).

Same nested-ablation methodology as floor_split.py / floor_split_3d.py
(full / no_gather / no_chunk_loop / no_unit + rf_pin variants), applied
to the FULL chain plans (bench.py's exact configs, tuned knobs active).
The ablation knobs only affect the DAS kernel, so the deltas isolate
DAS components; the "fixed" row additionally carries the chain's
demod/decode stages, whose device times demod_device_split.py reports
separately.

Run on hardware: PYTHONPATH=/root/repo:$PYTHONPATH python
experiments/chain_floor_split.py | tee /tmp/chain_floor.log
"""
import json
import time

import numpy as np


def split(name, plan_builder, rf, iters=16):
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import clear_plan_cache
    from ogl_beamforming_tpu.utils.transfer import sync

    def measure(tag, knobs):
        das_pallas.ABLATE.clear()
        das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()
        clear_plan_cache()
        p = plan_builder()
        try:
            for _ in range(2):
                sync(p(rf))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = p(rf)
            sync(out)
            ms = (time.perf_counter() - t0) / iters * 1e3
            print(json.dumps({f"{name}.{tag}": round(ms, 2)}), flush=True)
            return ms
        except Exception as e:
            print(json.dumps({f"{name}.{tag}": str(e)[:200]}), flush=True)
            return None

    full = measure("full", {})
    ng = measure("no_gather", {"no_gather": 1})
    ncl = measure("no_chunk_loop", {"no_chunk_loop": 1})
    nu = measure("no_unit", {"no_unit": 1})
    measure("no_unit_rf_pin", {"no_unit": 1, "rf_pin": 1})
    measure("full_rf_pin", {"rf_pin": 1})
    das_pallas.ABLATE.clear()
    das_pallas._das_call.cache_clear()
    das_jit.clear_cache()
    clear_plan_cache()
    if None not in (full, ng, ncl, nu):
        print(json.dumps({name: {
            "full": round(full, 2),
            "gathers": round(full - ng, 2),
            "chunk_nongather": round(ng - ncl, 2),
            "pair_prep": round(ncl - nu, 2),
            "fixed_plus_prestages": round(nu, 2)}}), flush=True)


def demod_chain_plan():
    from ogl_beamforming_tpu.models.presets import forces_compounding
    from ogl_beamforming_tpu.params.enums import FilterKind
    from ogl_beamforming_tpu.params.types import (FilterParameters,
                                                  KaiserFilterParameters)
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.filters import make_filter

    p, pipe = forces_compounding(channel_count=128, transmit_count=16,
                                 sample_count=2048,
                                 sampling_frequency=20e6,
                                 demodulation_frequency=5e6,
                                 output_points=(256, 512), demodulate=True)
    fp = FilterParameters(kind=FilterKind.Kaiser, sampling_frequency=20e6,
                          kaiser=KaiserFilterParameters(2e6, 4.0, 16))
    return build_plan(p, pipe, {0: make_filter(fp)})


def decode_chain_plan():
    """bench.bench_das_chain's exact plan (decode -> DAS, real RF)."""
    from ogl_beamforming_tpu.params.enums import (AcquisitionKind, DataKind,
                                                  InterpolationMode,
                                                  ShaderKind)
    from ogl_beamforming_tpu.params.types import Parameters
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.pipeline.spec import PipelineSpec
    from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz

    pitch = 0.3e-3
    p = Parameters(
        sample_count=2048, channel_count=128, acquisition_count=16,
        sampling_frequency=20e6, demodulation_frequency=5e6,
        speed_of_sound=1500.0, f_number=0.5,
        acquisition_kind=AcquisitionKind.FORCES,
        interpolation_mode=InterpolationMode.Cubic,
        das_voxel_transform=das_transform_2d_xz([-0.06, 0.01],
                                                [0.06, 0.165]),
        xdc_element_pitch=np.array([pitch, pitch], np.float32),
        output_points=np.array([256, 512, 1, 0], np.int32))
    return build_plan(
        p, PipelineSpec.from_shaders([ShaderKind.Decode, ShaderKind.DAS],
                                     DataKind.Int16),
        {}, voxel_block=32768)


def main():
    import jax.numpy as jnp
    import bench

    print(json.dumps({"rtt_ms": round(bench.link_rtt_ms(), 1)}), flush=True)
    rf = jnp.asarray(
        np.random.randint(-2048, 2048, (128, 16, 2048)).astype(np.int16))
    split("decode_chain", decode_chain_plan, rf)
    split("demod_chain", demod_chain_plan, rf)


if __name__ == "__main__":
    main()
