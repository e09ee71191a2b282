"""A/B: fused Pallas demodulate/FIR kernels vs the XLA tap-unrolled path
(ops/demod_pallas.py vs ops/filtering.py fallback), on the demod-chain
stage shapes (VERDICT r3 #2 follow-through: the stage's HBM bound is
~30 us; the XLA path measured ~1.8 ms).

Run on hardware:
  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/demod_pallas_ab.py
"""
import json
import time

import numpy as np


def timeit(fn, sync, warmup=2, iters=32):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from ogl_beamforming_tpu.ops import filtering, golden
    from ogl_beamforming_tpu.utils.transfer import sync, to_host

    rng = np.random.default_rng(3)
    c, a, s = 128, 16, 2048
    taps = np.kaiser(16, 4.0).astype(np.float32)
    taps /= taps.sum()
    rf_h = rng.integers(-2048, 2048, (c, a, s)).astype(np.int16)
    rf = jnp.asarray(rf_h)
    fd, fs = 5e6, 20e6

    ref = golden.demodulate(rf_h, taps, fd, fs, 1, False)

    for arm in (False, True):
        filtering.DEMOD_PALLAS = arm
        filtering.demodulate.clear_cache()
        fn = lambda: filtering.demodulate(rf, taps, fd, fs, 1, False)
        dt = timeit(fn, sync)
        err = float(np.linalg.norm(to_host(fn()) - ref)
                    / np.linalg.norm(ref))
        print(json.dumps({"stage": "demodulate",
                          "arm": "pallas" if arm else "xla",
                          "ms": round(dt * 1e3, 4),
                          "nrmse": round(err, 8)}), flush=True)

    # complex FIR at post-demod shapes (the Filter-stage case)
    iq_h = (rng.standard_normal((c, a, s // 2))
            + 1j * rng.standard_normal((c, a, s // 2))).astype(np.complex64)
    iq = jnp.asarray(iq_h.view(np.float32))   # complex can't cross H2D
    fir_ref = golden.fir_filter(iq_h, taps, 1)
    for arm in (False, True):
        filtering.DEMOD_PALLAS = arm
        fir = jax.jit(lambda y: filtering.fir_filter(
            jax.lax.complex(y[..., 0::2], y[..., 1::2]), taps, 1))
        dt = timeit(lambda: fir(iq), sync)
        err = float(np.linalg.norm(to_host(fir(iq)) - fir_ref)
                    / np.linalg.norm(fir_ref))
        print(json.dumps({"stage": "fir_complex",
                          "arm": "pallas" if arm else "xla",
                          "ms": round(dt * 1e3, 4),
                          "nrmse": round(err, 8)}), flush=True)


if __name__ == "__main__":
    main()
