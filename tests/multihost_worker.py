"""Worker for the true 2-process multihost test (SURVEY §2.3).

Run as: python multihost_worker.py <process_id> <num_processes> <port> <out>

Each process gets 4 virtual CPU devices; the pair forms an 8-device global
mesh via ``jax.distributed``.  Every process feeds ONLY its
``local_channel_slice`` rows through ``feed_rf``; process 0 saves the
gathered output volume for the parent test to compare against the
single-process pipeline.
"""

import os
import sys


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from ogl_beamforming_tpu.parallel import multihost, sharding

    assert multihost.init_multihost(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 4
    assert len(jax.devices()) == 4 * nproc

    plan, rf = make_case()

    mesh = multihost.make_host_mesh()
    local = rf[multihost.local_channel_slice(rf.shape[0])]
    fed = multihost.feed_rf(local, mesh)
    assert fed.shape == rf.shape

    sp = sharding.shard_plan(plan, mesh)
    out = sp.fn(fed, plan.dyn)
    res = multihost.gathered_frame(out)
    if pid == 0:
        np.save(out_path, np.asarray(res))
    jax.distributed.shutdown()


def make_case():
    """Deterministic 16-channel FORCES case (same as test_multihost.plan8)."""
    import numpy as np

    from ogl_beamforming_tpu.params.enums import (AcquisitionKind, DataKind,
                                                  InterpolationMode,
                                                  ShaderKind)
    from ogl_beamforming_tpu.params.types import Parameters
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.pipeline.spec import PipelineSpec
    from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz

    c, a, s = 16, 4, 256
    pitch = 0.3e-3
    p = Parameters(
        sample_count=s, channel_count=c, acquisition_count=a,
        sampling_frequency=20e6, demodulation_frequency=5e6,
        speed_of_sound=1500.0, f_number=0.8,
        acquisition_kind=AcquisitionKind.FORCES,
        interpolation_mode=InterpolationMode.Linear,
        das_voxel_transform=das_transform_2d_xz([0, 1e-3],
                                                [15 * pitch, 10e-3]),
        xdc_element_pitch=np.array([pitch, pitch], np.float32),
        output_points=np.array([16, 32, 1, 0], np.int32))
    plan = build_plan(p, PipelineSpec.from_shaders(
        [ShaderKind.Decode, ShaderKind.DAS], DataKind.Int16), {},
        voxel_block=512)
    rf = np.random.default_rng(0x0621).integers(
        -512, 512, (c, a, s)).astype(np.int16)
    return plan, rf


if __name__ == "__main__":
    main()
