"""Bisect which op in the int8 decode kernel Mosaic rejects."""
import json
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl

    a, bs = 16, 256
    h_np = np.sign(np.random.randn(a, a)).astype(np.int8)
    x_np = np.random.randint(-32768, 32767, (a, bs)).astype(np.int16)

    def try_kernel(name, kernel, out_dtype=jnp.float32):
        try:
            fn = pl.pallas_call(
                kernel, out_shape=jax.ShapeDtypeStruct((a, bs), out_dtype))
            out = np.asarray(fn(jnp.asarray(h_np), jnp.asarray(x_np)))
            print(json.dumps({name: {"ok": True,
                                     "mean": float(np.mean(out))}}),
                  flush=True)
            return out
        except Exception as e:
            print(json.dumps({name: str(e)[:200]}), flush=True)

    def k_shift(h_ref, x_ref, o_ref):
        o_ref[:] = (x_ref[:] >> 8).astype(jnp.float32)
    try_kernel("shift16", k_shift)

    def k_split8(h_ref, x_ref, o_ref):
        hi = (x_ref[:] >> 8).astype(jnp.int8)
        lo = ((x_ref[:] & 255) - 128).astype(jnp.int8)
        o_ref[:] = hi.astype(jnp.float32) * 256 + lo.astype(jnp.float32)
    try_kernel("split8", k_split8)

    def k_dot(h_ref, x_ref, o_ref):
        hi = (x_ref[:] >> 8).astype(jnp.int8)
        p = jax.lax.dot_general(h_ref[:], hi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o_ref[:] = p.astype(jnp.float32)
    try_kernel("dot_hi", k_dot)

    def k_rowsum(h_ref, x_ref, o_ref):
        rs = jnp.sum(h_ref[:].astype(jnp.int32), axis=1, keepdims=True) * 128
        o_ref[:] = jnp.broadcast_to(rs.astype(jnp.float32), o_ref.shape)
    try_kernel("rowsum", k_rowsum)

    def k_full(h_ref, x_ref, o_ref):
        h = h_ref[:]
        rs = jnp.sum(h.astype(jnp.int32), axis=1, keepdims=True) * 128
        x = x_ref[:]
        hi = (x >> 8).astype(jnp.int8)
        lo = ((x & 255) - 128).astype(jnp.int8)
        dn = (((1,), (0,)), ((), ()))
        p_hi = jax.lax.dot_general(h, hi, dn,
                                   preferred_element_type=jnp.int32)
        p_lo = jax.lax.dot_general(h, lo, dn,
                                   preferred_element_type=jnp.int32)
        acc = p_hi * 256 + p_lo + rs
        o_ref[:] = acc.astype(jnp.float32) * np.float32(1.0 / 16)
    out = try_kernel("full", k_full)
    if out is not None:
        ref = (h_np.astype(np.int64) @ x_np.astype(np.int64)) / 16.0
        print(json.dumps({"full_max_err":
                          float(np.abs(out - ref).max())}), flush=True)

if __name__ == "__main__":
    main()
