"""C-ABI streaming throughput vs the Python StreamingSession (round-2
VERDICT #5 done-criterion: within 10%).

Drives the pipelined shared-memory server exactly as an external C client
would (beamformer_push_data_with_compute in a loop), then the same config
through StreamingSession directly.  Run on the TPU:

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/throughput_cabi.py
"""

import ctypes as ct
import json
import os
import time

import numpy as np

C, A, S, NX, NZ = 64, 16, 2048, 256, 512
FRAMES = 30


def params():
    from ogl_beamforming_tpu.params.enums import (AcquisitionKind,
                                                  InterpolationMode)
    from ogl_beamforming_tpu.params.types import Parameters
    from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz
    pitch = 0.3e-3
    return Parameters(
        sample_count=S, channel_count=C, acquisition_count=A,
        sampling_frequency=20e6, demodulation_frequency=5e6,
        speed_of_sound=1500.0, f_number=0.8,
        acquisition_kind=AcquisitionKind.FORCES,
        interpolation_mode=InterpolationMode.Cubic,
        das_voxel_transform=das_transform_2d_xz([0, 1e-3],
                                                [(C - 1) * pitch, 48e-3]),
        xdc_element_pitch=np.array([pitch, pitch], np.float32),
        output_points=np.array([NX, NZ, 1, 0], np.int32))


def main():
    from ogl_beamforming_tpu.params.enums import DataKind, ShaderKind
    from ogl_beamforming_tpu.pipeline.executor import Beamformer
    from ogl_beamforming_tpu.runtime import abi
    from ogl_beamforming_tpu.runtime.server import BeamformerServer
    from ogl_beamforming_tpu.runtime.streaming import StreamingSession

    rng = np.random.default_rng(0)
    raw = rng.integers(-2048, 2048, (C, A * S)).astype(np.int16)
    p = params()

    # --- Python StreamingSession path --------------------------------
    bf = Beamformer()
    bf.push_parameters(p)
    bf.push_pipeline([ShaderKind.Decode, ShaderKind.DAS], DataKind.Int16)
    with StreamingSession(bf) as stream:
        stream.submit(raw).result(timeout=600)     # compile + calibration
        stream.submit(raw).result(timeout=600)
        stream.drain()
        t0 = time.perf_counter()
        h = None
        for _ in range(FRAMES):
            h = stream.submit(raw)
        h.result(timeout=300)
        stream.drain()
        py_ms = (time.perf_counter() - t0) / FRAMES * 1e3
    print(json.dumps({"python_streaming_ms": round(py_ms, 2)}), flush=True)

    # --- C-ABI path over the shm server -------------------------------
    os.environ["OGL_BEAMFORMER_SHM_NAME"] = f"/bf_tpu_bench_{os.getpid()}"
    srv = BeamformerServer(shm_size=256 << 20)
    srv.start()
    try:
        lib = srv.lib
        sp = abi.CSimpleParameters()
        cp = sp.parameters
        vt = np.asarray(p.das_voxel_transform, np.float32)
        cp.das_voxel_transform.E[:] = list(vt.T.ravel())
        cp.xdc_transform.E[:] = list(np.eye(4, dtype=np.float32).T.ravel())
        cp.xdc_element_pitch.E[:] = list(p.xdc_element_pitch)
        cp.raw_data_dimensions.E[:] = [A * S, C]
        cp.focal_vector.E[:] = [0.0, 0.0]
        cp.sample_count, cp.channel_count, cp.acquisition_count = S, C, A
        cp.acquisition_kind = int(p.acquisition_kind)
        cp.decode_mode = 1
        cp.single_focus = cp.single_orientation = 1
        cp.output_points.E[:] = [NX, NZ, 1, 0]
        cp.sampling_frequency = p.sampling_frequency
        cp.demodulation_frequency = p.demodulation_frequency
        cp.speed_of_sound = p.speed_of_sound
        cp.f_number = p.f_number
        cp.interpolation_mode = int(p.interpolation_mode)
        cp.decimation_rate = 1
        for i in range(C):
            sp.channel_mapping[i] = i
        sp.compute_stages[0] = int(ShaderKind.Decode)
        sp.compute_stages[1] = int(ShaderKind.DAS)
        sp.compute_stages_count = 2
        sp.data_kind = int(DataKind.Int16)
        assert lib.beamformer_push_simple_parameters(ct.byref(sp)) == 1

        lib.beamformer_set_global_timeout(300000)
        ptr = raw.ctypes.data_as(ct.c_void_p)

        def push():
            ok = lib.beamformer_push_data_with_compute(ptr, raw.nbytes, 0, 0)
            assert ok == 1, lib.beamformer_get_last_error_string()

        push()                                   # compile + calibration
        push()
        out = np.zeros(NX * NZ, np.complex64)
        assert lib.beamformer_get_last_frames(
            out.ctypes.data_as(ct.c_void_p), out.nbytes, 1) == 1

        t0 = time.perf_counter()
        for _ in range(FRAMES):
            push()
        # completion fence: export forces the last frame to finish
        assert lib.beamformer_get_last_frames(
            out.ctypes.data_as(ct.c_void_p), out.nbytes, 1) == 1
        c_ms = (time.perf_counter() - t0) / FRAMES * 1e3
    finally:
        srv.stop()
    print(json.dumps({"c_abi_ms": round(c_ms, 2),
                      "ratio": round(c_ms / py_ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
