"""True device time of the Demodulate stage via in-jit repetition slope
(the gather_micro3 lesson: the tunneled attach has a ~0.65 ms/call
dispatch floor, so per-op timings of sub-ms kernels measure the tunnel,
not the device — demod_pallas_ab's 1.2-1.9 ms readings are dispatch-bound
for BOTH arms).

One jit applies the stage K times with per-rep distinct demodulation
frequencies (prevents CSE; the phasor precompute is part of the stage's
real cost) and folds each output to a scalar with sum(|y|) (prevents DCE
at ~1 extra HBM pass per rep).  The K_hi - K_lo slope cancels dispatch,
readback RTT and all fixed work.  A pairing-only control chain (same
structure, FIR+rotation replaced by the I/Q pairing alone) bounds the
reduce+pairing share of the slope.

Run on hardware:
  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/demod_slope.py
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ogl_beamforming_tpu.ops import filtering
    from ogl_beamforming_tpu.utils.transfer import sync

    rng = np.random.default_rng(3)
    c, a, s = 128, 16, 2048
    taps = np.kaiser(16, 4.0).astype(np.float32)
    taps /= taps.sum()
    rf = jnp.asarray(rng.integers(-2048, 2048, (c, a, s)).astype(np.int16))
    fs = 20e6

    def make_chain(k, control):
        @jax.jit
        def f(x):
            acc = jnp.float32(0)
            for i in range(k):
                fd = jnp.float32(5e6 + i * 1e3)
                if control:
                    xf = x.astype(jnp.float32)
                    y = jax.lax.complex(xf[..., 0::2],
                                        xf[..., 1::2]) * (fd / fs)
                else:
                    y = filtering.demodulate(x, taps, fd, fs, 1, False)
                acc = acc + jnp.sum(jnp.abs(y))
            return acc
        return f

    def timeit(fn, iters=24, warmup=3):
        for _ in range(warmup):
            sync(fn(rf))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(rf)
        sync(out)
        return (time.perf_counter() - t0) / iters

    ks = (2, 8, 24)
    for arm, control in (("xla", False), ("pallas", False),
                         ("control_pairing", True)):
        filtering.DEMOD_PALLAS = arm == "pallas"
        filtering.demodulate.clear_cache()
        times = {k: timeit(make_chain(k, control)) for k in ks}
        slope_ms = (times[24] - times[8]) / 16 * 1e3
        print(json.dumps({
            "arm": arm,
            "per_k_ms": {k: round(t * 1e3, 4) for k, t in times.items()},
            "slope_ms_per_rep": round(slope_ms, 4)}), flush=True)


if __name__ == "__main__":
    main()
