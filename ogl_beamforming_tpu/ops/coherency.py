"""Coherence-factor weighting (shaders/coherency_weighting.glsl)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def coherency_weighting(coherent: jax.Array, incoherent: jax.Array,
                        scale=1.0) -> jax.Array:
    """``coherent *= scale * coherent / incoherent`` per voxel
    (coherency_weighting.glsl:34-41; scale = 1 at the reference call site,
    beamformer_core.c:1299).

    For IQ data the GLSL ``vec2 * vec2`` product is *componentwise*: each of
    re/im is squared and divided by the (scalar) incoherent sum — not a
    complex multiply.  Zero incoherent energy maps to zero output.
    """
    w = jnp.where(incoherent != 0, scale / incoherent, 0.0)
    if jnp.iscomplexobj(coherent):
        re = coherent.real
        im = coherent.imag
        return jax.lax.complex(re * re * w, im * im * w)
    return coherent * coherent * w
