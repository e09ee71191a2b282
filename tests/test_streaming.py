"""Streaming session: overlapped submits, ordering, and back-pressure."""

import numpy as np

from ogl_beamforming_tpu.params.enums import (AcquisitionKind, DataKind,
                                              InterpolationMode, ShaderKind)
from ogl_beamforming_tpu.params.types import Parameters
from ogl_beamforming_tpu.pipeline.executor import Beamformer
from ogl_beamforming_tpu.runtime.streaming import StreamingSession
from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz


def _setup():
    pitch = 0.3e-3
    p = Parameters(
        sample_count=256, channel_count=8, acquisition_count=4,
        sampling_frequency=20e6, demodulation_frequency=5e6,
        speed_of_sound=1500.0, f_number=0.8,
        acquisition_kind=AcquisitionKind.FORCES,
        interpolation_mode=InterpolationMode.Linear,
        das_voxel_transform=das_transform_2d_xz([0, 1e-3],
                                                [7 * pitch, 8e-3]),
        xdc_element_pitch=np.array([pitch, pitch], np.float32),
        output_points=np.array([12, 16, 1, 0], np.int32))
    bf = Beamformer(voxel_block=128)
    bf.push_parameters(p)
    bf.push_pipeline([ShaderKind.Decode, ShaderKind.DAS], DataKind.Int16)
    return bf


def test_streaming_frames_ordered(rng):
    bf = _setup()
    raws = [rng.integers(-512, 512, (8, 4 * 256)).astype(np.int16)
            for _ in range(6)]
    with StreamingSession(bf) as stream:
        handles = [stream.submit(r) for r in raws]
        frames = [h.result(timeout=30) for h in handles]
    ids = [f.id for f in frames]
    assert ids == sorted(ids)
    assert len(bf.get_last_frames(6)) == 6
    # same data as the synchronous path
    direct = bf.push_data_with_compute(raws[0])
    np.testing.assert_allclose(frames[0].to_numpy(), direct.to_numpy(),
                               rtol=1e-5, atol=1e-6)


def test_streaming_error_propagates(rng):
    bf = _setup()
    with StreamingSession(bf) as stream:
        h = stream.submit(np.zeros((2, 4), np.int16))   # wrong shape
        try:
            h.result(timeout=30)
            raised = False
        except Exception:
            raised = True
    assert raised


def test_streaming_close_idempotent():
    bf = _setup()
    s = StreamingSession(bf)
    s.close()
    s.close()


def test_streaming_stop_imaging(rng):
    """Live StopImaging control halts the session's compute loop
    (reference: tests/throughput.c:558-560 + live dirty-flag plumbing)."""
    from ogl_beamforming_tpu.params.enums import LiveImagingDirtyFlags
    from ogl_beamforming_tpu.params.types import LiveImagingParameters

    bf = _setup()
    raw = rng.integers(-512, 512, (8, 4 * 256)).astype(np.int16)
    with StreamingSession(bf) as stream:
        h = stream.submit(raw)
        assert h.result(timeout=30) is not None

        live = LiveImagingParameters(active=0)
        bf.set_live_parameters(
            live, dirty_flags=int(LiveImagingDirtyFlags.StopImaging))
        h2 = stream.submit(raw)
        assert h2.result(timeout=30) is None      # dropped
        assert stream.stop_requested
        h3 = stream.submit(raw)                   # latched: still dropped
        assert h3.result(timeout=30) is None
