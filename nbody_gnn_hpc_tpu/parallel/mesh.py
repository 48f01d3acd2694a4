"""Device mesh helpers.

The reference's entire distributed story is ``multiprocessing.Pool`` fan-out
plus subprocess pipeline stages (SURVEY §2.3).  The TPU-native equivalent is
a 1-D ``jax.sharding.Mesh`` over the simulation/sample batch axis: XLA
shards the embarrassingly-parallel batch over ICI with no host processes,
and inserts psum/all-gather automatically where training requires it.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
