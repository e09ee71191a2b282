"""Benchmark driver: decode + DAS throughput on the current device.

Reproduces the reference's measurement methodology (BASELINE.md):
  * decode sweep (tests/decode.c): ms/frame + GB/s per transmit count
  * end-to-end decode->DAS chain (tests/throughput.c): frames/s and the
    north-star voxels*channels/s

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is the achieved fraction of BASELINE.md's target: 80% of the
device roofline for the bench config (the reference publishes no absolute
numbers — BASELINE.json.published is empty — so the roofline target is the
comparison point).

NOTE on timing: on tunneled TPU runtimes ``block_until_ready`` can return at
enqueue; every measurement forces a device readback (utils/transfer.sync).
"""

import argparse
import json
import time

import numpy as np


def _timeit(fn, sync, warmup=2, iters=8):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def bench_decode(c=256, s=4096, transmits=(16, 64, 96, 256), iters=100):
    """tests/decode.c sweep: 4096 samples x 256 channels Int16."""
    import jax.numpy as jnp
    from ogl_beamforming_tpu.ops.decode import decode_hadamard, hadamard_matrix
    from ogl_beamforming_tpu.utils.transfer import sync

    results = {}
    for t in transmits:
        rf = jnp.asarray(
            np.random.randint(-2048, 2048, (c, t, s)).astype(np.int16))
        h = hadamard_matrix(t)
        dt = _timeit(lambda: decode_hadamard(rf, h), sync, warmup=4,
                     iters=iters)
        results[t] = {"ms": dt * 1e3, "GB/s": s * t * c * 2 / dt / 1e9}
    return results


def bench_das_chain(c=128, a=16, s=2048, nx=256, nz=512, iters=4,
                    voxel_block=32768):
    """Decode -> DAS end-to-end frame rate (throughput.c methodology)."""
    import jax.numpy as jnp
    from ogl_beamforming_tpu.params.enums import (AcquisitionKind, DataKind,
                                                  InterpolationMode,
                                                  ShaderKind)
    from ogl_beamforming_tpu.params.types import Parameters
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.pipeline.spec import PipelineSpec
    from ogl_beamforming_tpu.utils.transfer import sync
    from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz

    pitch = 0.3e-3
    p = Parameters(
        sample_count=s, channel_count=c, acquisition_count=a,
        sampling_frequency=20e6, demodulation_frequency=5e6,
        speed_of_sound=1500.0, f_number=0.5,
        acquisition_kind=AcquisitionKind.FORCES,
        interpolation_mode=InterpolationMode.Cubic,
        das_voxel_transform=das_transform_2d_xz([-0.06, 0.01], [0.06, 0.165]),
        xdc_element_pitch=np.array([pitch, pitch], np.float32),
        output_points=np.array([nx, nz, 1, 0], np.int32))
    plan = build_plan(
        p, PipelineSpec.from_shaders([ShaderKind.Decode, ShaderKind.DAS],
                                     DataKind.Int16),
        {}, voxel_block=voxel_block)
    rf = jnp.asarray(np.random.randint(-2048, 2048, (c, a, s)).astype(np.int16))
    dt = _timeit(lambda: plan(rf), sync, warmup=2, iters=iters)
    voxels = nx * nz
    return {
        "ms_per_frame": dt * 1e3,
        "fps": 1.0 / dt,
        "voxch_per_s": voxels * c / dt,
        "raw_GBps": c * a * s * 2 / dt / 1e9,
        "config": f"C={c} A={a} S={s} out={nx}x{nz} cubic int16",
    }


def roofline_voxch(c, a, s, nx, nz, flops_per_sample=40.0,
                   peak_f32_flops=100e12):
    """Compute-roofline voxels*channels/s for the DAS chain on one chip.

    Per (voxel, channel, transmit): delay math + cubic interp ~= 40 f32
    flops with ideal memory reuse; v5e f32 ~= 100 TFLOP/s (bf16 394).
    """
    total_flops = nx * nz * c * a * flops_per_sample
    t = total_flops / peak_f32_flops
    return nx * nz * c / t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also run the decode sweep")
    args = ap.parse_args()

    das = bench_das_chain()
    target = 0.8 * roofline_voxch(128, 16, 2048, 256, 512)
    result = {
        "metric": "DAS voxels*channels/s (decode->DAS, " + das["config"] + ")",
        "value": round(das["voxch_per_s"], 1),
        "unit": "voxel*channel/s",
        "vs_baseline": round(das["voxch_per_s"] / target, 6),
    }
    if args.full:
        result["decode_sweep"] = bench_decode()
        result["das_detail"] = das
    print(json.dumps(result))


if __name__ == "__main__":
    main()
