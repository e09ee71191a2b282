"""Hardware numerics check: full chains vs the golden oracle on the TPU.

The CPU test suite runs the same comparisons in interpret mode; this script
repeats them on the real chip, where backend defaults differ (it caught TPU
convs silently running at bf16 precision: 1.9e-3 chain NRMSE vs the 1e-3
contract until ops/filtering.py pinned Precision.HIGHEST).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/tpu_chain_check.py
"""

import numpy as np


def main():
    from ogl_beamforming_tpu.ops import golden
    from ogl_beamforming_tpu.params.enums import (AcquisitionKind, DataKind,
                                                  FilterKind,
                                                  InterpolationMode,
                                                  ShaderKind)
    from ogl_beamforming_tpu.params.types import (FilterParameters,
                                                  KaiserFilterParameters,
                                                  Parameters)
    from ogl_beamforming_tpu.pipeline.executor import Beamformer
    from ogl_beamforming_tpu.utils.filters import make_filter
    from ogl_beamforming_tpu.utils.hadamard import hadamard
    from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz

    rng = np.random.default_rng(0)
    c, a, s = 32, 16, 1024
    pitch = 0.3e-3
    p = Parameters(
        sample_count=s, channel_count=c, acquisition_count=a,
        sampling_frequency=20e6, demodulation_frequency=5e6,
        speed_of_sound=1500.0, f_number=0.8,
        acquisition_kind=AcquisitionKind.FORCES,
        interpolation_mode=InterpolationMode.Cubic,
        das_voxel_transform=das_transform_2d_xz([0, 1e-3],
                                                [(c - 1) * pitch, 12e-3]),
        xdc_element_pitch=np.array([pitch, pitch], np.float32),
        output_points=np.array([64, 128, 1, 0], np.int32))
    raw = rng.integers(-1024, 1024, (c, a * s)).astype(np.int16)
    rf = raw.reshape(c, a, s)

    # Demodulate -> Decode -> DAS
    bf = Beamformer()
    fp = FilterParameters(kind=FilterKind.Kaiser, sampling_frequency=10e6,
                          kaiser=KaiserFilterParameters(2e6, 4.0, 16))
    bf.create_filter(fp, filter_slot=0)
    bf.push_parameters(p)
    bf.push_pipeline([ShaderKind.Demodulate, ShaderKind.Decode,
                      ShaderKind.DAS], DataKind.Int16, [0, 0, 0])
    frame = bf.push_data_with_compute(raw)
    f = make_filter(fp)
    iq = golden.demodulate(rf, f.taps, 5e6, 20e6, 1, False)
    dec = golden.decode_hadamard(iq, hadamard(a))
    dp = golden.DasParams(
        acquisition_kind=AcquisitionKind.FORCES, acquisition_count=a,
        channel_count=c, sample_count=s // 2, sampling_frequency=10e6,
        demodulation_frequency=5e6, speed_of_sound=1500.0,
        time_offset=f.time_delay,
        interpolation_mode=InterpolationMode.Cubic, f_number=0.8,
        voxel_transform=np.asarray(p.das_voxel_transform),
        xdc_element_pitch=np.asarray(p.xdc_element_pitch),
        output_points=(64, 128, 1))
    ref = golden.das(dec.astype(np.complex64), dp)
    err = np.linalg.norm(frame.to_numpy() - ref) / np.linalg.norm(ref)
    print("demod chain NRMSE vs golden:", err)
    assert err < 1e-3

    # Decode -> Hilbert -> DAS
    bf2 = Beamformer()
    p2 = p.copy()
    p2.decode_mode = 0
    bf2.push_parameters(p2)
    bf2.push_pipeline([ShaderKind.Decode, ShaderKind.Hilbert, ShaderKind.DAS],
                      DataKind.Int16)
    frame2 = bf2.push_data_with_compute(raw)
    hil = golden.hilbert(rf.astype(np.float32))
    dp2 = golden.DasParams(
        acquisition_kind=AcquisitionKind.FORCES, acquisition_count=a,
        channel_count=c, sample_count=s, sampling_frequency=20e6,
        demodulation_frequency=5e6, speed_of_sound=1500.0,
        interpolation_mode=InterpolationMode.Cubic, f_number=0.8,
        voxel_transform=np.asarray(p.das_voxel_transform),
        xdc_element_pitch=np.asarray(p.xdc_element_pitch),
        output_points=(64, 128, 1))
    ref2 = golden.das(hil, dp2)
    err2 = np.linalg.norm(frame2.to_numpy() - ref2) / np.linalg.norm(ref2)
    print("hilbert chain NRMSE vs golden:", err2)
    assert err2 < 1e-3
    print("TPU chain numerics OK")


if __name__ == "__main__":
    main()
