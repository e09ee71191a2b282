"""zbp loader round-trip and model presets."""

import numpy as np
import pytest

from ogl_beamforming_tpu.models import presets
from ogl_beamforming_tpu.params.enums import (AcquisitionKind, DataKind,
                                              DecodeMode, InterpolationMode,
                                              ShaderKind)
from ogl_beamforming_tpu.pipeline.executor import Beamformer
from ogl_beamforming_tpu.pipeline.spec import validate_pipeline
from ogl_beamforming_tpu.utils.zbp import ZbpFile, load_zbp, save_zbp_v1


def test_zbp_v1_roundtrip(tmp_path, rng):
    c, a, s = 8, 4, 64
    data = rng.integers(-1000, 1000, c * a * s).astype(np.int16)
    z = ZbpFile(
        version=(1, 0), raw_data_dimension=(a * s, c, 1, 1),
        data_kind=DataKind.Int16, decode_mode=DecodeMode.Hadamard,
        sampling_mode=0, sampling_frequency=20e6,
        demodulation_frequency=5e6, speed_of_sound=1480.0,
        sample_count=s, channel_count=c, receive_event_count=a,
        xdc_transform=np.eye(4, dtype=np.float32),
        xdc_element_pitch=np.array([3e-4, 3e-4], np.float32),
        time_offset=1e-6, acquisition_kind=AcquisitionKind.FORCES,
        channel_mapping=np.arange(c, dtype=np.int16),
        steering_angles=np.zeros(a, np.float32),
        focal_depths=np.full(a, np.inf, np.float32),
        sparse_elements=np.zeros(a, np.int16),
        data=data)
    path = tmp_path / "test.zbp"
    save_zbp_v1(path, z)
    back = load_zbp(path)
    assert back.sample_count == s and back.channel_count == c
    assert back.receive_event_count == a
    assert back.speed_of_sound == np.float32(1480.0)
    assert back.acquisition_kind == AcquisitionKind.FORCES
    assert back.decode_mode == DecodeMode.Hadamard
    np.testing.assert_array_equal(back.data[:data.size], data)
    np.testing.assert_allclose(back.xdc_transform, z.xdc_transform)


def test_presets_validate():
    for p, pipe in [presets.decode_benchmark(),
                    presets.plane_wave_2d(),
                    presets.forces_compounding(demodulate=False),
                    presets.hercules_3d()]:
        validate_pipeline(pipe.shaders, pipe.data_kind)
        assert p.sample_count > 0

    p, pipe, sparse = presets.uforces_volumetric()
    validate_pipeline(pipe.shaders, pipe.data_kind)
    assert len(sparse) == p.acquisition_count - 1


def test_preset_runs_end_to_end(rng):
    p, pipe = presets.forces_compounding(
        channel_count=8, transmit_count=4, sample_count=256,
        output_points=(16, 32), demodulate=False)
    bf = Beamformer(voxel_block=128)
    bf.push_parameters(p)
    bf.push_pipeline(pipe.shaders, pipe.data_kind)
    raw = rng.integers(-512, 512, (8, 4 * 256)).astype(np.int16)
    frame = bf.push_data_with_compute(raw)
    assert frame.output_points == (16, 32, 1)


def test_from_zbp_config(tmp_path, rng):
    z = ZbpFile(
        version=(1, 0), raw_data_dimension=(4 * 64, 8, 1, 1),
        data_kind=DataKind.Int16, decode_mode=DecodeMode.Hadamard,
        sampling_mode=0, sampling_frequency=20e6,
        demodulation_frequency=0.0, speed_of_sound=1540.0,
        sample_count=64, channel_count=8, receive_event_count=4,
        xdc_transform=np.eye(4, dtype=np.float32),
        xdc_element_pitch=np.array([3e-4, 3e-4], np.float32),
        time_offset=0.0, acquisition_kind=AcquisitionKind.FORCES)
    p, pipe = presets.from_zbp(z, output_points=(16, 32))
    validate_pipeline(pipe.shaders, pipe.data_kind)
    assert pipe.shaders == [ShaderKind.Decode, ShaderKind.DAS]
    assert p.channel_count == 8


def test_zbp_v2_roundtrip(tmp_path, rng):
    from ogl_beamforming_tpu.utils.zbp import RCATransmitFocus, save_zbp_v2
    c, a, s = 8, 4, 64
    data = rng.integers(-1000, 1000, c * a * s).astype(np.int16)
    z = ZbpFile(
        version=(2, 0), raw_data_dimension=(a * s, c, 1, 1),
        data_kind=DataKind.Int16, decode_mode=DecodeMode.Hadamard,
        sampling_mode=0, sampling_frequency=20e6,
        demodulation_frequency=5e6, speed_of_sound=1480.0,
        sample_count=s, channel_count=c, receive_event_count=a,
        xdc_transform=np.eye(4, dtype=np.float32),
        xdc_element_pitch=np.array([3e-4, 3e-4], np.float32),
        time_offset=1e-6, acquisition_kind=AcquisitionKind.UFORCES,
        channel_mapping=np.arange(c, dtype=np.int16),
        sparse_elements=np.array([1, 3, 5, 7], np.int16),
        data=data)
    z.transmit_focus = RCATransmitFocus(0.02, 5.0, 0.0, 0x21)
    z.emissions = [{"kind": 1, "duration": 2e-6, "min_frequency": 2e6,
                    "max_frequency": 8e6}]
    path = tmp_path / "v2.zbp"
    save_zbp_v2(path, z, compress=True)
    back = load_zbp(path)
    assert back.version[0] == 2
    assert back.acquisition_kind == AcquisitionKind.UFORCES
    assert back.sample_count == s and back.channel_count == c
    np.testing.assert_array_equal(back.channel_mapping,
                                  np.arange(c, dtype=np.int16))
    np.testing.assert_array_equal(back.sparse_elements,
                                  np.array([1, 3, 5, 7], np.int16))
    assert back.transmit_focus.steering_angle == np.float32(5.0)
    assert back.transmit_focus.transmit_receive_orientation == 0x21
    assert back.emissions[0]["kind"] == 1
    assert back.emissions[0]["max_frequency"] == np.float32(8e6)
    np.testing.assert_array_equal(back.data[:data.size], data)


def test_zbp_walsh_mode_roundtrip(tmp_path, rng):
    # ZBP_DecodeMode_Walsh (external/zemp_bp.h:36) is supported natively:
    # the loader maps 2 -> DecodeMode.Walsh instead of clamping.
    from ogl_beamforming_tpu.utils.zbp import save_zbp_v2
    z = ZbpFile(
        version=(2, 0), raw_data_dimension=(4 * 64, 8, 1, 1),
        data_kind=DataKind.Int16, decode_mode=DecodeMode.Walsh,
        sampling_mode=0, sampling_frequency=20e6,
        demodulation_frequency=0.0, speed_of_sound=1540.0,
        sample_count=64, channel_count=8, receive_event_count=4,
        xdc_transform=np.eye(4, dtype=np.float32),
        xdc_element_pitch=np.array([3e-4, 3e-4], np.float32),
        time_offset=0.0, acquisition_kind=AcquisitionKind.FORCES)
    path = tmp_path / "walsh.zbp"
    save_zbp_v2(path, z, compress=False)
    back = load_zbp(path)
    assert back.decode_mode == DecodeMode.Walsh
    p, pipe = presets.from_zbp(back, output_points=(16, 32))
    assert p.decode_mode == DecodeMode.Walsh
    assert ShaderKind.Decode in pipe.shaders


def test_zbp_unknown_decode_mode_rejected(tmp_path):
    # unknown future decode modes must fail loudly, not clamp to Hadamard
    import struct
    from ogl_beamforming_tpu.utils.zbp import save_zbp_v2
    z = ZbpFile(
        version=(2, 0), raw_data_dimension=(4 * 64, 8, 1, 1),
        data_kind=DataKind.Int16, decode_mode=DecodeMode.Hadamard,
        sampling_mode=0, sampling_frequency=20e6,
        demodulation_frequency=0.0, speed_of_sound=1540.0,
        sample_count=64, channel_count=8, receive_event_count=4,
        xdc_transform=np.eye(4, dtype=np.float32),
        xdc_element_pitch=np.array([3e-4, 3e-4], np.float32),
        time_offset=0.0, acquisition_kind=AcquisitionKind.FORCES)
    path = tmp_path / "bad.zbp"
    save_zbp_v2(path, z, compress=False)
    buf = bytearray(path.read_bytes())
    # decode_mode is the 11th field of the packed V2 header
    head_fmt = "<QII4Iiii"
    off = struct.calcsize(head_fmt)
    struct.pack_into("<i", buf, off, 7)
    path.write_bytes(bytes(buf))
    with pytest.raises(ValueError, match="decode mode"):
        load_zbp(path)


def test_walsh_pipeline_decodes_walsh_encoding(rng):
    # a full pipeline with decode_mode=Walsh recovers Walsh-encoded
    # transmits: DAS(decode(W @ x)) == DAS(decode(H @ x)) with matching
    # modes, both equal to DAS on the uncoded transmits
    from ogl_beamforming_tpu.params.types import Parameters
    from ogl_beamforming_tpu.pipeline.spec import PipelineSpec
    from ogl_beamforming_tpu.utils.hadamard import hadamard, walsh
    from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz
    c, a, s = 8, 4, 256
    pitch = 0.3e-3
    x = rng.integers(-200, 200, (c, a, s)).astype(np.float32)

    def run(decode_mode, mat):
        # geometry small enough that the 256-sample RF covers the grid
        p = Parameters(
            sample_count=s, channel_count=c, acquisition_count=a,
            sampling_frequency=20e6, demodulation_frequency=5e6,
            speed_of_sound=1500.0, f_number=0.8,
            acquisition_kind=AcquisitionKind.FORCES,
            decode_mode=decode_mode,
            interpolation_mode=InterpolationMode.Linear,
            das_voxel_transform=das_transform_2d_xz(
                [0, 1e-3], [(c - 1) * pitch, 8e-3]),
            xdc_element_pitch=np.array([pitch, pitch], np.float32),
            output_points=np.array([16, 32, 1, 0], np.int32))
        pipe = PipelineSpec.from_shaders(
            [ShaderKind.Decode, ShaderKind.DAS], DataKind.Int16)
        enc = np.einsum("ta,cas->cts", mat, x)  # encode acquisitions
        bf = Beamformer(voxel_block=128)
        bf.push_parameters(p)
        bf.push_pipeline(pipe.shaders, pipe.data_kind)
        raw = enc.reshape(c, a * s).astype(np.int16)
        return np.asarray(bf.push_data_with_compute(raw).data)

    out_w = run(DecodeMode.Walsh, walsh(a))
    out_h = run(DecodeMode.Hadamard, hadamard(a))
    assert np.abs(out_h).max() > 0
    np.testing.assert_allclose(out_w, out_h, rtol=1e-4, atol=1e-5)
