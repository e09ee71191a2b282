"""Minimal probe: does Mosaic lower int8 x int8 -> int32 dot_general?"""
import functools, json, traceback
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    a = jnp.asarray(np.random.randint(-2, 2, (128, 128)).astype(np.int8))
    b = jnp.asarray(np.random.randint(-128, 128, (128, 256)).astype(np.int8))
    for name, (ad, bd, od) in {
        "i8i8i32": (jnp.int8, jnp.int8, jnp.int32),
        "i8i8f32": (jnp.int8, jnp.int8, jnp.float32),
    }.items():
        def kernel2(a_ref, b_ref, o_ref, od=od):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=od)
        try:
            fn = pl.pallas_call(
                kernel2,
                out_shape=jax.ShapeDtypeStruct((128, 256), od))
            out = np.asarray(fn(a.astype(ad), b.astype(bd)))
            ref = (np.asarray(a, np.int32) @ np.asarray(b, np.int32))
            err = float(np.abs(out.astype(np.float64) - ref).max())
            print(json.dumps({name: {"ok": True, "max_err": err}}), flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:500]}), flush=True)

if __name__ == "__main__":
    main()
