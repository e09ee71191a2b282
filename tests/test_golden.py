"""Physical/mathematical sanity of the NumPy golden oracle itself."""

import numpy as np
import pytest

from helpers import nrmse, point_scatter_rf

from ogl_beamforming_tpu.ops import golden
from ogl_beamforming_tpu.params.enums import (AcquisitionKind,
                                              InterpolationMode,
                                              RCAOrientation,
                                              pack_tx_rx_orientation)
from ogl_beamforming_tpu.utils.hadamard import hadamard
from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz


def test_decode_inverts_encode(rng):
    """decode(H^T-encoded data) recovers the per-transmit signal."""
    c, a, s = 3, 16, 32
    x = rng.standard_normal((c, a, s)).astype(np.float32)
    h = hadamard(a)
    encoded = np.einsum("tj,cts->cjs", h, x)  # acquisition j sums H[t,j]*x_t
    decoded = golden.decode_hadamard(encoded, h)
    assert nrmse(x, decoded) < 1e-6


def test_fir_matches_numpy_convolve(rng):
    x = rng.standard_normal(64).astype(np.float32)
    h = rng.standard_normal(9).astype(np.float32)
    y = golden.fir_filter(x, h)
    # y[n] = sum_j x[n - 8 + j] h[j] = full correlation sampled at n
    full = np.convolve(x, h[::-1], mode="full")
    np.testing.assert_allclose(y, full[:64], rtol=1e-5, atol=1e-5)


def test_fir_decimation(rng):
    x = rng.standard_normal(64).astype(np.float32)
    h = rng.standard_normal(5).astype(np.float32)
    y1 = golden.fir_filter(x, h, 1)
    y2 = golden.fir_filter(x, h, 2)
    np.testing.assert_allclose(y2, y1[::2], rtol=1e-6)


def test_demodulate_tone_is_dc():
    """A pure tone at f_demod demodulates to (nearly) constant magnitude."""
    fs = 40e6
    fd = fs / 4  # 4 samples/wavelength => I/Q pairing assumption exact
    n = np.arange(4096)
    rf = np.sin(2 * np.pi * fd / fs * n).astype(np.float32)
    taps = np.ones(16, np.float32) / 16
    iq = golden.demodulate(rf, taps, fd, fs)
    mag = np.abs(iq[64:-64])
    assert mag.std() / mag.mean() < 0.02
    # fs/4 tone pairs to (0, ±1): |IQ| = sqrt(2) * 1 after the sqrt(2) scale
    assert mag.mean() == pytest.approx(np.sqrt(2.0), rel=0.05)


def test_hilbert_analytic():
    n = np.arange(256)
    x = np.cos(2 * np.pi * 0.1 * n).astype(np.float32)
    z = golden.hilbert(x)
    np.testing.assert_allclose(z.real, x, atol=1e-4)
    np.testing.assert_allclose(np.abs(z)[16:-16], 1.0, atol=0.05)


def _forces_params(nx=32, nz=48, c=16, a=8, s=256, **kw):
    fs = 10e6
    sos = 1500.0
    pitch = 0.3e-3
    vt = das_transform_2d_xz([0, 1e-3], [(c - 1) * pitch, 8e-3])
    defaults = dict(
        acquisition_kind=AcquisitionKind.FORCES,
        acquisition_count=a, channel_count=c, sample_count=s,
        sampling_frequency=fs, speed_of_sound=sos,
        interpolation_mode=InterpolationMode.Linear,
        f_number=0.8, voxel_transform=vt,
        xdc_element_pitch=np.array([pitch, pitch], np.float32),
        output_points=(nx, nz, 1))
    defaults.update(kw)
    return golden.DasParams(**defaults)


def test_das_forces_point_scatterer():
    """A point target produces its image peak at the correct voxel."""
    p = _forces_params()
    c, a, s = p.channel_count, p.acquisition_count, p.sample_count
    pitch = float(p.xdc_element_pitch[0])
    target = np.array([(c // 2) * pitch, 0.0, 4e-3])
    f0 = 2.5e6

    # Synthesize per (channel, transmit) echoes with FORCES geometry:
    # tx distance from element row (x = pitch*t, y = pitch*C/2 offset), rx from column
    rx_x = np.arange(c) * pitch
    tx_x = np.arange(a) * pitch
    ty = target[1] - pitch * c / 2
    rx_d = np.sqrt((target[0] - rx_x) ** 2 + target[2] ** 2)
    tx_d = np.sqrt(ty ** 2 + target[2] ** 2 + (target[0] - tx_x) ** 2)
    dist = rx_d[:, None] + tx_d[None, :]  # (C, A)
    rf = point_scatter_rf(dist.reshape(-1), p.sampling_frequency,
                          p.speed_of_sound, s, f0).reshape(c, a, s)

    img = golden.das(rf, p)
    assert img.shape == (32, 48, 1)
    env = np.abs(golden.hilbert(img[:, :, 0]))
    ix, iz = np.unravel_index(np.argmax(env), env.shape)
    wx = ix / 31 * (c - 1) * pitch
    wz = 1e-3 + iz / 47 * 7e-3
    assert abs(wx - target[0]) < 0.4e-3
    assert abs(wz - target[2]) < 0.4e-3


def test_das_rca_plane_wave_point():
    """Flash (plane wave, RCA) localizes a point target."""
    c, a, s = 16, 1, 256
    fs, sos, pitch = 10e6, 1500.0, 0.3e-3
    vt = das_transform_2d_xz([0, 1e-3], [(c - 1) * pitch, 8e-3])
    p = golden.DasParams(
        acquisition_kind=AcquisitionKind.Flash,
        acquisition_count=a, channel_count=c, sample_count=s,
        sampling_frequency=fs, speed_of_sound=sos,
        interpolation_mode=InterpolationMode.Cubic,
        f_number=0.7, voxel_transform=vt,
        xdc_element_pitch=np.array([pitch, pitch], np.float32),
        output_points=(32, 48, 1),
        transmit_receive_orientation=pack_tx_rx_orientation(
            RCAOrientation.Columns, RCAOrientation.Columns),
        transmit_angle=0.0, focus_depth=np.inf)
    target = np.array([(c // 2) * pitch, 0.0, 4e-3])
    f0 = 2.5e6
    rx_x = np.arange(c) * pitch
    # plane wave at angle 0 along columns: tx distance = z
    dist = target[2] + np.sqrt((target[0] - rx_x) ** 2 + target[2] ** 2)
    rf = point_scatter_rf(dist, fs, sos, s, f0).reshape(c, a, s)
    img = golden.das(rf, p)
    env = np.abs(golden.hilbert(img[:, :, 0]))
    ix, iz = np.unravel_index(np.argmax(env), env.shape)
    wx = ix / 31 * (c - 1) * pitch
    wz = 1e-3 + iz / 47 * 7e-3
    assert abs(wx - target[0]) < 0.4e-3
    assert abs(wz - target[2]) < 0.4e-3


def test_das_coherency_outputs():
    p = _forces_params(nx=8, nz=8, c=4, a=2, s=64, coherency_weighting=True)
    rng = np.random.default_rng(1)
    rf = rng.standard_normal((4, 2, 64)).astype(np.float32)
    coh, inco = golden.das(rf, p)
    assert coh.shape == (8, 8, 1) and inco.shape == (8, 8, 1)
    assert np.all(inco >= 0)
    w = golden.coherency_weighting(coh, inco)
    assert w.shape == coh.shape
    # |weighted| <= |coherent| pointwise (coherence factor <= 1)
    assert np.all(np.abs(w) <= np.abs(coh) + 1e-6)


def test_display_map_range(rng):
    v = rng.standard_normal((16, 16)).astype(np.float32)
    d = golden.display_map(v, db_cutoff=-60, threshold=1.0, gamma=1.5)
    assert d.min() >= 0 and d.max() <= 1.0
    assert d.max() == pytest.approx(1.0, abs=1e-5)
