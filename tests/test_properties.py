"""Property-based tests (hypothesis) for the DSP core and golden oracle."""

import numpy as np
from hypothesis import given, settings, strategies as st

from ogl_beamforming_tpu.ops import golden
from ogl_beamforming_tpu.params.enums import InterpolationMode
from ogl_beamforming_tpu.utils.hadamard import hadamard, hadamard_supported
from ogl_beamforming_tpu.utils.filters import (filter_first_moment,
                                               kaiser_low_pass_filter,
                                               tukey_window)

_ORDERS = [n for n in range(1, 257)
           if hadamard_supported(n)]


@settings(max_examples=25, deadline=None)
@given(st.sampled_from(_ORDERS))
def test_hadamard_orthogonal(n):
    h = hadamard(n)
    np.testing.assert_allclose(h @ h.T, n * np.eye(n), atol=1e-3)


@settings(max_examples=20, deadline=None)
@given(st.integers(2, 64), st.integers(1, 32), st.integers(0, 2 ** 31))
def test_fir_linearity(length, taps_len, seed):
    """FIR is linear: f(a x + b y) == a f(x) + b f(y)."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(length).astype(np.float32)
    y = rng.standard_normal(length).astype(np.float32)
    h = rng.standard_normal(taps_len).astype(np.float32)
    a, b = 2.5, -1.25
    lhs = golden.fir_filter(a * x + b * y, h)
    rhs = a * golden.fir_filter(x, h) + b * golden.fir_filter(y, h)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-4)


@settings(max_examples=20, deadline=None)
@given(st.integers(4, 128), st.integers(1, 4), st.integers(0, 2 ** 31))
def test_fir_decimation_consistency(length, decim, seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(length).astype(np.float32)
    h = rng.standard_normal(5).astype(np.float32)
    full = golden.fir_filter(x, h, 1)
    dec = golden.fir_filter(x, h, decim)
    np.testing.assert_allclose(dec, full[::decim][: len(dec)], rtol=1e-5,
                               atol=1e-5)


@settings(max_examples=20, deadline=None)
@given(st.floats(0.01, 0.99), st.floats(0.05, 1.0))
def test_tukey_bounds(t, taper):
    v = float(tukey_window(t, taper))
    assert -1e-6 <= v <= 1.0 + 1e-6


@settings(max_examples=10, deadline=None)
@given(st.integers(8, 128), st.floats(1.0, 10.0))
def test_kaiser_moment_centered(length, beta):
    """Symmetric Kaiser taps have first moment at L/2/fs."""
    fs = 10e6
    taps = kaiser_low_pass_filter(2e6, fs, beta, length)
    m = filter_first_moment(taps, fs)
    assert abs(m - length / 2 / fs) < 2.0 / fs


@settings(max_examples=15, deadline=None)
@given(st.sampled_from(list(InterpolationMode)), st.integers(0, 2 ** 31))
def test_interpolation_exact_at_integers(mode, seed):
    """All interpolation modes reproduce samples at integer indices."""
    rng = np.random.default_rng(seed)
    line = rng.standard_normal(64).astype(np.float32)
    idx = np.arange(2, 60, dtype=np.float32)
    out = golden.sample_rf(line, idx, mode, 1e6, 0.0, False)
    np.testing.assert_allclose(out, line[2:60], rtol=1e-5, atol=1e-5)


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2 ** 31))
def test_decode_scale_invariance(seed):
    """decode(c * rf) == c * decode(rf)."""
    rng = np.random.default_rng(seed)
    rf = rng.standard_normal((2, 8, 16)).astype(np.float32)
    h = hadamard(8)
    np.testing.assert_allclose(golden.decode_hadamard(3.0 * rf, h),
                               3.0 * golden.decode_hadamard(rf, h),
                               rtol=1e-5, atol=1e-5)


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2 ** 31))
def test_das_channel_additivity(seed):
    """DAS over all channels == sum of DAS over channel subsets — the
    property that justifies channel sharding (parallel/sharding.py)."""
    from ogl_beamforming_tpu.params.enums import AcquisitionKind
    from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz
    rng = np.random.default_rng(seed)
    c, a, s = 4, 2, 64
    pitch = 3e-4
    rf = rng.standard_normal((c, a, s)).astype(np.float32)

    def run(rf_part, ch_offset, ch_count):
        # emulate partial-channel accumulation by zeroing other channels
        full = np.zeros((c, a, s), np.float32)
        full[ch_offset:ch_offset + ch_count] = rf_part
        p = golden.DasParams(
            acquisition_kind=AcquisitionKind.FORCES, acquisition_count=a,
            channel_count=c, sample_count=s, sampling_frequency=5e6,
            speed_of_sound=1500.0,
            interpolation_mode=InterpolationMode.Linear, f_number=0.5,
            voxel_transform=das_transform_2d_xz([0, 1e-3],
                                                [3 * pitch, 6e-3]),
            xdc_element_pitch=np.array([pitch, pitch], np.float32),
            output_points=(6, 8, 1))
        return golden.das(full, p)

    whole = run(rf, 0, c)
    parts = run(rf[:2], 0, 2) + run(rf[2:], 2, 2)
    np.testing.assert_allclose(whole, parts, rtol=1e-4, atol=1e-5)
