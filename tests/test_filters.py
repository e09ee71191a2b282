import numpy as np
import pytest

from ogl_beamforming_tpu.params.enums import FilterKind
from ogl_beamforming_tpu.params.types import (FilterParameters,
                                              KaiserFilterParameters,
                                              MatchedChirpFilterParameters)
from ogl_beamforming_tpu.utils.filters import (baseband_chirp,
                                               filter_first_moment,
                                               kaiser_low_pass_filter,
                                               make_filter, rf_chirp,
                                               tukey_window)


def test_tukey_endpoints():
    assert tukey_window(0.0, 0.2) == pytest.approx(0.0, abs=1e-6)
    assert tukey_window(0.5, 0.2) == pytest.approx(1.0)
    assert tukey_window(0.999999, 0.2) == pytest.approx(0.0, abs=1e-4)


def test_kaiser_symmetry_and_dc():
    fs = 40e6
    taps = kaiser_low_pass_filter(5e6, fs, 6.0, 64)
    assert taps.shape == (64,)
    # Symmetric about n = L/2 (reference centers at length/2, math.c:755)
    for k in range(1, 31):
        assert taps[32 + k] == pytest.approx(taps[32 - k], rel=1e-5)
    # Low-pass: DC gain ~ wc = 2*pi*fc/fs scaled; just check passband >> stopband
    w = np.fft.rfftfreq(1024, 1 / fs)
    h = np.abs(np.fft.rfft(taps, 1024))
    passband = h[w < 3e6].mean()
    stopband = h[w > 9e6].mean()
    assert passband / stopband > 50


def test_chirp_shapes():
    fs = 40e6
    r = rf_chirp(2e6, 8e6, fs, 128)
    b = baseband_chirp(2e6, 8e6, fs, 128)
    assert r.dtype == np.float32 and r.shape == (128,)
    assert b.dtype == np.complex64 and b.shape == (128,)
    rr = rf_chirp(2e6, 8e6, fs, 128, reverse=True)
    np.testing.assert_allclose(rr, r[::-1], rtol=1e-6)
    br = baseband_chirp(2e6, 8e6, fs, 128, reverse=True)
    np.testing.assert_allclose(br, np.conj(b)[::-1], rtol=1e-5, atol=1e-6)


def test_first_moment_symmetric():
    fs = 10e6
    taps = kaiser_low_pass_filter(2e6, fs, 4.0, 32)
    # Symmetric (about L/2) filter: first moment ~ L/2 / fs
    assert filter_first_moment(taps, fs) == pytest.approx(16 / fs, rel=0.05)


def test_make_filter_kaiser():
    fp = FilterParameters(kind=FilterKind.Kaiser, sampling_frequency=40e6,
                          kaiser=KaiserFilterParameters(5e6, 6.0, 64))
    f = make_filter(fp)
    assert f.length == 64 and not f.complex
    assert f.time_delay == pytest.approx(32 / 40e6)


def test_make_filter_matched_chirp():
    fp = FilterParameters(
        kind=FilterKind.MatchedChirp, sampling_frequency=40e6, complex=True,
        matched_chirp=MatchedChirpFilterParameters(2e-6, 2e6, 8e6))
    f = make_filter(fp)
    assert f.complex and f.length == 80
    assert 0 < f.time_delay < 2e-6
