"""Device<->host transfer helpers.

Some TPU runtimes (e.g. the tunneled axon platform) cannot transfer
complex64 arrays device->host; complex values are split into re/im float32
planes on device and recombined on host.  Also provides a true
synchronization primitive: on tunneled runtimes ``block_until_ready`` can
return at enqueue time, so timing code must force a readback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def to_host(array) -> np.ndarray:
    """Device -> numpy, safe for complex dtypes on all platforms."""
    if isinstance(array, np.ndarray):
        return array
    if jnp.iscomplexobj(array):
        re = np.asarray(jnp.real(array))
        im = np.asarray(jnp.imag(array))
        return (re + 1j * im).astype(np.complex64)
    return np.asarray(array)


def sync(array) -> None:
    """Guarantee device completion (stronger than block_until_ready on
    tunneled platforms): reads one element back."""
    leaves = jax.tree.leaves(array)
    for leaf in leaves:
        if hasattr(leaf, "addressable_shards"):
            flat = jnp.ravel(jnp.real(leaf) if jnp.iscomplexobj(leaf)
                             else leaf)
            np.asarray(flat[0])
