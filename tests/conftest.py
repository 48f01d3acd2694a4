"""Test configuration: force CPU backend with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh (SURVEY §4) via
``xla_force_host_platform_device_count=8`` — real multi-chip hardware is not
available in CI.

Environment wrinkle: this machine's ``sitecustomize`` registers a remote-TPU
PJRT plugin at interpreter startup and programmatically selects
``jax_platforms="axon,cpu"`` — which overrides the ``JAX_PLATFORMS`` env
var.  ``jax.config.update`` after import wins over both, so we flip the
config back to pure CPU here (before any test imports jax-heavy modules).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Keep CPU test compiles out of the shared .jax_cache namespace: entries
# AOT-compiled on another host's CPU (different vector features) trigger
# loader warnings and risk SIGILL. Tests cache per-host instead.
os.environ.setdefault(
    "NBODY_GNN_TPU_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache", f"cpu-{os.uname().nodename}"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The package default only persists compiles >=1 s (right for the remote TPU
# backend); test programs are mostly sub-second CPU compiles, so persist them
# all — repeat suite runs skip recompilation (fast-mode budget, r5).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
