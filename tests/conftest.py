"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding code
paths (origin_tpu.parallel) are exercised without TPU hardware, as the
framework is designed for `jax.sharding.Mesh` layouts that are
platform-agnostic.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
