"""Test configuration: force CPU backend with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh (SURVEY §4) —
``xla_force_host_platform_device_count=8`` — since real multi-chip hardware
is not available in CI.  Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
