"""Test configuration: force a virtual 8-device CPU platform.

Tests must run without TPU hardware; multi-chip sharding tests use an
8-device host-platform mesh.  The real-TPU path is exercised by bench.py and
__graft_entry__.py instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: the axon TPU plugin overrides JAX_PLATFORMS at import; the config
# update is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0x0621)
