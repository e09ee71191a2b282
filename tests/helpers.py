"""Shared test utilities."""

import numpy as np


def nrmse(ref, test) -> float:
    """Normalized RMS error — the BASELINE.md acceptance metric (<= 1e-3)."""
    ref = np.asarray(ref)
    test = np.asarray(test)
    denom = np.sqrt(np.mean(np.abs(ref) ** 2))
    if denom == 0:
        return float(np.sqrt(np.mean(np.abs(test) ** 2)))
    return float(np.sqrt(np.mean(np.abs(test - ref) ** 2)) / denom)


def point_scatter_rf(distances, sampling_frequency, speed_of_sound,
                     sample_count, frequency, cycles=2.0):
    """Synthesize an RF line: a short tone burst centered at the echo delay
    implied by ``distances`` (same shape broadcastable rules as numpy)."""
    t = np.arange(sample_count, dtype=np.float32) / sampling_frequency
    delay = np.asarray(distances, np.float32)[..., None] / speed_of_sound
    dur = cycles / frequency
    arg = t[None, ...] - delay
    env = np.exp(-0.5 * (arg / (dur / 4)) ** 2)
    return (env * np.sin(2 * np.pi * frequency * arg)).astype(np.float32)
