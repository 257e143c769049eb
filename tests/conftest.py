"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding code
paths (origin_tpu.parallel) are exercised without TPU hardware.

Note: this environment pre-imports jax from sitecustomize with
JAX_PLATFORMS=axon (the tunneled TPU), so setting the env var here is too
late — we must override the live jax config before any backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
