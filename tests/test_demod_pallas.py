"""Fused Pallas demodulate kernel vs golden oracle (interpret mode on CPU).

The kernel compiles for real TPU via Mosaic; interpret mode validates the
numerics in CI, and experiments/tpu_chain_check.py re-validates the full
demod chain against golden on hardware (where it takes the Pallas path).
"""

import numpy as np
import pytest

from helpers import nrmse

from ogl_beamforming_tpu.ops import golden
from ogl_beamforming_tpu.ops.demod_pallas import demodulate_pallas

TOL = 1e-5


def _rf(rng, shape):
    return rng.integers(-2048, 2048, shape).astype(np.int16)


def _taps(rng, length):
    h = rng.standard_normal(length).astype(np.float32)
    return h / np.abs(h).sum()


@pytest.mark.parametrize("c,a,s,length", [
    (4, 2, 256, 16),     # standard Kaiser demod shape
    (3, 1, 130, 8),      # odd pair count, rows not a row-block multiple
    (5, 1, 64, 1),       # single tap (no pad), rb falls to 1
    (2, 2, 512, 33),     # long odd-length filter
])
def test_matches_golden(rng, c, a, s, length):
    rf = _rf(rng, (c, a, s))
    taps = _taps(rng, length)
    fd, fs = 7.8e6, 33.3e6
    ref = golden.demodulate(rf, taps, fd, fs, 1, False)
    out = np.asarray(demodulate_pallas(rf, taps, fd, fs, interpret=True))
    assert out.shape == ref.shape
    assert nrmse(ref, out) < TOL


def test_traced_frequencies(rng):
    """plan.dyn feeds demodulation/sampling frequency as TRACED values —
    the phasor precompute must accept tracers (regression: np-scalar ctor
    raised on a JitTracer)."""
    import jax
    c, a, s, length = 2, 2, 128, 8
    rf = _rf(rng, (c, a, s))
    taps = _taps(rng, length)
    fn = jax.jit(lambda y, fd, fs: demodulate_pallas(
        y, taps, fd, fs, interpret=True))
    out = np.asarray(fn(rf, 5e6, 20e6))
    assert nrmse(golden.demodulate(rf, taps, 5e6, 20e6, 1, False),
                 out) < TOL


def test_vmap_frame_batch(rng):
    """frame_batch>1 plans vmap the demodulate op; the pallas batching rule
    must reproduce the per-frame result."""
    import jax
    b, c, a, s, length = 3, 2, 2, 128, 12
    rf = _rf(rng, (b, c, a, s))
    taps = _taps(rng, length)
    fd, fs = 5e6, 20e6
    fn = lambda y: demodulate_pallas(y, taps, fd, fs, interpret=True)
    batched = np.asarray(jax.vmap(fn)(rf))
    for i in range(b):
        assert nrmse(np.asarray(fn(rf[i])), batched[i]) < 1e-7


@pytest.mark.parametrize("cx_x,cx_h", [
    (False, False), (True, False), (False, True), (True, True),
])
def test_fir_matches_golden(rng, cx_x, cx_h):
    from ogl_beamforming_tpu.ops.demod_pallas import fir_pallas
    c, a, s, length = 3, 2, 192, 16
    x = rng.standard_normal((c, a, s)).astype(np.float32)
    if cx_x:
        x = (x + 1j * rng.standard_normal((c, a, s))).astype(np.complex64)
    taps = _taps(rng, length)
    if cx_h:
        taps = (taps + 1j * taps[::-1]).astype(np.complex64)
    ref = golden.fir_filter(x, taps, 1)
    out = np.asarray(fir_pallas(x, taps, interpret=True))
    assert out.shape == ref.shape
    assert nrmse(ref, out) < TOL


def test_gate_falls_back(rng, monkeypatch):
    """With the backend forced on ("interpret" on CPU), ineligible demod
    variants (f32 input, decimation>1) fall back to XLA and eligible FIRs
    route through the Pallas kernel — all matching golden."""
    from ogl_beamforming_tpu.ops import filtering
    monkeypatch.setattr(filtering, "DEMOD_PALLAS", "interpret")
    filtering.demodulate.clear_cache()   # drop traces made under auto gate
    c, a, s, length = 2, 2, 256, 16
    taps = _taps(rng, length)
    fd, fs = 5e6, 20e6

    rf32 = rng.standard_normal((c, a, s)).astype(np.float32)
    out = np.asarray(filtering.demodulate(rf32, taps, fd, fs, 1, False))
    assert nrmse(golden.demodulate(rf32, taps, fd, fs, 1, False), out) < TOL

    rf = _rf(rng, (c, a, s))
    out = np.asarray(filtering.demodulate(rf, taps, fd, fs, 2, False))
    assert nrmse(golden.demodulate(rf, taps, fd, fs, 2, False), out) < TOL

    ctaps = (taps + 1j * taps[::-1]).astype(np.complex64)
    out = np.asarray(filtering.demodulate(rf, ctaps, fd, fs, 1, True))
    assert nrmse(golden.demodulate(rf, ctaps, fd, fs, 1, True), out) < TOL
