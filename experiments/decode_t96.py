"""Decode T=96 to its HBM bound: pipeline the VPU split with the MXU.

Sweep (C=256, S=4096) at A in {64, 96, 256}: software-pipelined split
(pipe), block-size and channel-block variants, i8.  Also estimates the
device asymptote by comparing 8 vs 64 iteration averages (tunnel RTT
amortizes out).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ogl_beamforming_tpu.ops import decode
    from ogl_beamforming_tpu.utils.transfer import sync

    rng = np.random.default_rng(7)

    def bench(a, knobs, iters=64):
        c, s = 256, 4096
        rf = jnp.asarray(rng.integers(-2048, 2048, (c, a, s), np.int16))
        h = decode.hadamard_matrix(a)
        decode.DECODE_ABLATE.clear()
        decode.DECODE_ABLATE.update(knobs)
        decode._decode_call.cache_clear()
        f = jax.jit(lambda x: decode.decode_hadamard_pallas(x, h))
        sync(f(rf))

        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                out = f(rf)
            sync(out)
            return (time.perf_counter() - t0) / n * 1e3
        t8 = run(8)
        t64 = run(iters)
        # device asymptote: t(n) = dev + rtt/n -> dev ~ (64*t64 - 8*t8)/56
        dev = (iters * t64 - 8 * t8) / (iters - 8)
        return t64, dev

    for a in (96, 64, 256):
        for name, knobs in [
            ("pipe", {}),                      # new default
            ("nopipe", {"pipe": 0}),
            ("pipe_bs1024", {"bs": 1024}),
            ("pipe_bs4096", {"bs": 4096}),
            ("pipe_cb8", {"cb": 8}),
            ("i8", {"i8": 1}),
        ]:
            try:
                t, dev = bench(a, knobs)
                print(json.dumps({"a": a, "v": name, "ms": round(t, 3),
                                  "dev_ms": round(dev, 3)}), flush=True)
            except Exception as e:
                print(json.dumps({"a": a, "v": name,
                                  "err": str(e)[:200]}), flush=True)
    decode.DECODE_ABLATE.clear()
    decode._decode_call.cache_clear()


if __name__ == "__main__":
    main()
