"""Image-domain end-to-end regression: synthetic phantom -> .zbp -> full
pipeline -> localized point targets.

The closest thing the reference ecosystem has to a golden dataset test
(SURVEY.md §4 notes it has none in-repo); here the phantom is generated
deterministically so no binary fixture is committed.
"""

import numpy as np
import pytest

from helpers import point_scatter_rf

from ogl_beamforming_tpu.models import presets
from ogl_beamforming_tpu.ops import golden
from ogl_beamforming_tpu.params.enums import (AcquisitionKind, DataKind,
                                              DecodeMode, InterpolationMode,
                                              ShaderKind)
from ogl_beamforming_tpu.pipeline.executor import Beamformer
from ogl_beamforming_tpu.utils.hadamard import hadamard
from ogl_beamforming_tpu.utils.zbp import ZbpFile, load_zbp, save_zbp_v1
from ogl_beamforming_tpu.viewer import bmode_image

C, A, S = 16, 8, 1024
FS, SOS, PITCH, F0 = 10e6, 1500.0, 0.3e-3, 2.5e6
TARGETS = [np.array([(C // 2) * PITCH, 0.0, 3e-3]),
           np.array([(C // 4) * PITCH, 0.0, 5.5e-3])]
X_SPAN = (C - 1) * PITCH
Z_RANGE = (1e-3, 8e-3)


def _phantom_zbp(tmp_path):
    rx_x = np.arange(C) * PITCH
    tx_x = np.arange(A) * PITCH
    ty = -PITCH * C / 2
    echo = np.zeros((C, A, S), np.float32)
    for target in TARGETS:
        rx_d = np.sqrt((target[0] - rx_x) ** 2 + target[2] ** 2)
        tx_d = np.sqrt(ty ** 2 + target[2] ** 2 + (target[0] - tx_x) ** 2)
        dist = rx_d[:, None] + tx_d[None, :]
        echo += point_scatter_rf(dist.reshape(-1), FS, SOS, S, F0
                                 ).reshape(C, A, S)
    encoded = np.einsum("tj,cts->cjs", hadamard(A), echo)
    data = np.clip(encoded * 2000, -32768, 32767).astype(np.int16)

    z = ZbpFile(
        version=(1, 0), raw_data_dimension=(A * S, C, 1, 1),
        data_kind=DataKind.Int16, decode_mode=DecodeMode.Hadamard,
        sampling_mode=0, sampling_frequency=FS,
        demodulation_frequency=0.0, speed_of_sound=SOS,
        sample_count=S, channel_count=C, receive_event_count=A,
        xdc_transform=np.eye(4, dtype=np.float32),
        xdc_element_pitch=np.array([PITCH, PITCH], np.float32),
        time_offset=0.0, acquisition_kind=AcquisitionKind.FORCES,
        channel_mapping=np.arange(C, dtype=np.int16), data=data)
    path = tmp_path / "phantom.zbp"
    save_zbp_v1(path, z)
    return path


def test_phantom_through_full_stack(tmp_path):
    z = load_zbp(_phantom_zbp(tmp_path))
    params, pipe = presets.from_zbp(
        z, output_points=(96, 192),
        lateral_mm=(0.0, X_SPAN * 1e3),
        axial_mm=(Z_RANGE[0] * 1e3, Z_RANGE[1] * 1e3),
        f_number=1.0, interpolation=InterpolationMode.Cubic)
    assert pipe.shaders == [ShaderKind.Decode, ShaderKind.DAS]

    bf = Beamformer(voxel_block=4096)
    bf.push_parameters(params)
    bf.push_pipeline(pipe.shaders, pipe.data_kind)
    bf.push_channel_mapping(z.channel_mapping)
    raw = z.data[: C * A * S].reshape(C, A * S)
    frame = bf.push_data_with_compute(raw)

    img = bmode_image(frame, db_cutoff=-40)      # (axial, lateral)
    nzv, nxv = img.shape

    found = []
    work = img.copy()
    for _ in TARGETS:
        iz, ix = np.unravel_index(work.argmax(), work.shape)
        found.append((ix, iz))
        z0, z1 = max(iz - 12, 0), iz + 12
        x0, x1 = max(ix - 12, 0), ix + 12
        work[z0:z1, x0:x1] = 0                   # suppress this target

    expected = []
    for t in TARGETS:
        ex = t[0] / X_SPAN * (nxv - 1)
        ez = (t[2] - Z_RANGE[0]) / (Z_RANGE[1] - Z_RANGE[0]) * (nzv - 1)
        expected.append((ex, ez))

    # match each found peak to its nearest expected target
    for ex, ez in expected:
        dists = [np.hypot(fx - ex, fz - ez) for fx, fz in found]
        assert min(dists) < 6.0, (found, expected)


def test_phantom_golden_cross_check(tmp_path):
    """The executor's frame equals the golden-oracle composition on the
    phantom (whole-stack numerical regression)."""
    from helpers import nrmse

    z = load_zbp(_phantom_zbp(tmp_path))
    params, pipe = presets.from_zbp(
        z, output_points=(48, 96), lateral_mm=(0.0, X_SPAN * 1e3),
        axial_mm=(1.0, 8.0), f_number=1.0,
        interpolation=InterpolationMode.Linear)
    bf = Beamformer(voxel_block=1024)
    bf.push_parameters(params)
    bf.push_pipeline(pipe.shaders, pipe.data_kind)
    raw = z.data[: C * A * S].reshape(C, A * S)
    frame = bf.push_data_with_compute(raw)

    rf = raw.reshape(C, A, S)
    dec = golden.decode_hadamard(rf, hadamard(A))
    dp = golden.DasParams(
        acquisition_kind=AcquisitionKind.FORCES, acquisition_count=A,
        channel_count=C, sample_count=S, sampling_frequency=FS,
        demodulation_frequency=0.0, speed_of_sound=SOS,
        interpolation_mode=InterpolationMode.Linear, f_number=1.0,
        voxel_transform=np.asarray(params.das_voxel_transform),
        xdc_element_pitch=np.array([PITCH, PITCH], np.float32),
        output_points=(48, 96, 1))
    ref = golden.das(dec, dp)
    assert nrmse(ref, frame.to_numpy()) < 1e-3
