"""Device mesh helpers.

The reference's entire distributed story is ``multiprocessing.Pool`` fan-out
plus subprocess pipeline stages (SURVEY §2.3).  The TPU-native equivalent is
a ``jax.sharding.Mesh`` over the simulation/sample batch axis: XLA shards
the embarrassingly-parallel batch over ICI with no host processes, and
inserts psum/all-gather automatically where training requires it.

Two topologies are supported:

- :func:`make_mesh` — 1-D mesh over one slice's chips (the common case).
  When it spans every device, ordering is delegated to
  ``mesh_utils.create_device_mesh`` so consecutive mesh positions land on
  physically adjacent chips: irrelevant for the collective-free datagen
  fan-out, but it keeps the DP gradient ``psum`` on nearest-neighbor ICI
  rings instead of the enumeration-order ring ``jax.devices()`` happens to
  give.
- :func:`make_hybrid_mesh` — 2-D ``(dcn, data)`` mesh for multi-slice pods:
  the inner axis stays within a slice (ICI), only the outer axis crosses
  the data-center network.  Batch sharding over BOTH axes is pure DP — the
  per-step gradient reduction is the only DCN traffic, which is the optimal
  multi-slice schedule for a replicated 2.5M-param model (scaling-book
  recipe: DP over DCN, everything bandwidth-hungry within a slice).
"""

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DCN_AXIS = "dcn"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all,
    ICI-topology-ordered — see module docstring)."""
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if n == len(devices) and n > 1:
        try:
            from jax.experimental import mesh_utils
            return Mesh(mesh_utils.create_device_mesh((n,), devices),
                        (axis_name,))
        except Exception:  # noqa: BLE001 — enumeration order still works
            pass
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def slice_structure(devices=None) -> Optional[Tuple[int, int]]:
    """``(n_slices, devices_per_slice)`` when the platform reports a
    multi-slice topology (TPU ``device.slice_index``), else ``None``
    (single slice, or a platform — like the virtual CPU mesh — that has no
    slice concept)."""
    from collections import Counter

    devices = jax.devices() if devices is None else list(devices)
    idx = [getattr(d, "slice_index", None) for d in devices]
    if any(i is None for i in idx):
        return None
    counts = Counter(idx)
    n_slices = len(counts)
    # Require equal per-slice populations — a degraded pod with uneven
    # slices must not be silently reshaped into a (dcn, data) grid whose
    # inner axis crosses DCN.
    if n_slices <= 1 or len(set(counts.values())) != 1:
        return None
    return n_slices, len(devices) // n_slices


def make_hybrid_mesh(n_slices: Optional[int] = None,
                     axis_names: Tuple[str, str] = (DCN_AXIS, DATA_AXIS),
                     ) -> Mesh:
    """2-D ``(dcn, data)`` mesh over all devices for multi-slice pods.

    - ``n_slices=None`` (real hardware): the slice layout is read from the
      devices themselves and ``mesh_utils.create_hybrid_device_mesh``
      places the outer axis across slices (DCN) and the inner axis on each
      slice's ICI torus.  Raises if the platform reports no slices — call
      :func:`make_mesh` there instead.
    - explicit ``n_slices`` (virtual/CPU meshes, tests): devices are
      partitioned into ``n_slices`` contiguous groups, emulating the same
      topology so multi-slice code paths run anywhere.
    """
    devices = jax.devices()
    if n_slices is None:
        st = slice_structure(devices)
        if st is None:
            raise ValueError(
                "platform reports no multi-slice structure; pass n_slices "
                "explicitly (virtual meshes) or use make_mesh()")
        n_slices, per = st
        try:
            from jax.experimental import mesh_utils
            dm = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(1, per), dcn_mesh_shape=(n_slices, 1),
                devices=devices)
            return Mesh(dm.reshape(n_slices, per), axis_names)
        except Exception:  # noqa: BLE001 — fall through to slice grouping
            devices = sorted(devices, key=lambda d: d.slice_index)
    if len(devices) % n_slices:
        raise ValueError(f"{len(devices)} devices not divisible into "
                         f"{n_slices} slices")
    per = len(devices) // n_slices
    return Mesh(np.asarray(devices).reshape(n_slices, per), axis_names)


def batch_sharding(mesh: Mesh, axis_name=None) -> NamedSharding:
    """Shard the leading (batch) axis over the mesh — by default over EVERY
    mesh axis, so a 1-D data mesh and a 2-D (dcn, data) hybrid mesh both
    get full-mesh data parallelism from the same annotation."""
    spec = P(tuple(mesh.axis_names) if axis_name is None else axis_name)
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
