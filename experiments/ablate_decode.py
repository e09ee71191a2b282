"""Decode kernel sweep: block sizes + int8 two-pass, T in {96, 256}."""
import json, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from ogl_beamforming_tpu.ops import decode as dec
    from ogl_beamforming_tpu.utils.transfer import sync, to_host

    def timeit(fn, warmup=4, iters=50):
        for _ in range(warmup): sync(fn())
        t0 = time.perf_counter()
        for _ in range(iters): out = fn()
        sync(out)
        return (time.perf_counter() - t0) / iters * 1e3

    c, s = 256, 4096
    variants = [
        ("default", {}),
        ("bs4096", {"bs": 4096}),
        ("bs4096_cb8", {"bs": 4096, "cb": 8}),
        ("bs4096_cb16", {"bs": 4096, "cb": 16}),
        ("i8", {"i8": 1}),
        ("i8_bs4096_cb8", {"i8": 1, "bs": 4096, "cb": 8}),
        ("i8_bs4096_cb16", {"i8": 1, "bs": 4096, "cb": 16}),
    ]
    for t in (96, 256):
        rf = jnp.asarray(np.random.randint(-32768, 32768, (c, t, s))
                         .astype(np.int16))
        h = dec.hadamard_matrix(t)
        ref = None
        for name, knobs in variants:
            dec.DECODE_ABLATE.clear(); dec.DECODE_ABLATE.update(knobs)
            dec._decode_call.cache_clear()
            t0 = time.perf_counter()
            try:
                ms = timeit(lambda: dec.decode_hadamard_pallas(rf, h))
                out = to_host(dec.decode_hadamard_pallas(rf, h))
                if ref is None: ref, err = out, 0.0
                else:
                    err = float(np.max(np.abs(out - ref)))
                print(json.dumps({f"T={t} {name}":
                                  {"ms": round(ms, 3),
                                   "GBs_raw": round(c*t*s*2/ms/1e6, 0),
                                   "compile_s": round(time.perf_counter()-t0, 1),
                                   "max_abs_err": err}}), flush=True)
            except Exception as e:
                print(json.dumps({f"T={t} {name}": str(e)[:250]}), flush=True)
    dec.DECODE_ABLATE.clear(); dec._decode_call.cache_clear()

if __name__ == "__main__":
    main()
