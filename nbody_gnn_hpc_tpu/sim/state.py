"""Immutable simulation state pytree.

The reference keeps mutable numpy arrays on a class
(``src/hpc/nbody.py:179-191``) and exposes them as a dict via
``get_state()`` (``nbody.py:250-259``).  Here the state is an immutable
NamedTuple pytree so it can flow through ``jit`` / ``vmap`` / ``lax.scan``
and be sharded over a device mesh.  Field names match the reference's
state-dict keys exactly.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class SimState(NamedTuple):
    """State of one (or a batch of) N-body system(s).

    Shapes for a single system: positions/velocities/accelerations ``(N, 3)``,
    masses ``(N,)``, time/step scalars.  A batch of B systems carries a
    leading ``B`` axis on every field (including time/step), produced by
    ``vmap`` or by stacking.
    """

    positions: jnp.ndarray
    velocities: jnp.ndarray
    accelerations: jnp.ndarray
    masses: jnp.ndarray
    time: jnp.ndarray
    step: jnp.ndarray

    @property
    def n_particles(self) -> int:
        return self.positions.shape[-2]

    def to_dict(self) -> dict:
        """Host-side dict with the reference's ``get_state()`` keys
        (``nbody.py:250-259``): positions, velocities, accelerations, masses,
        time, step."""
        return {
            "positions": np.asarray(self.positions),
            "velocities": np.asarray(self.velocities),
            "accelerations": np.asarray(self.accelerations),
            "masses": np.asarray(self.masses),
            "time": float(np.asarray(self.time)),
            "step": int(np.asarray(self.step)),
        }

    @classmethod
    def from_dict(cls, d: dict, dtype=jnp.float32) -> "SimState":
        return cls(
            positions=jnp.asarray(d["positions"], dtype=dtype),
            velocities=jnp.asarray(d["velocities"], dtype=dtype),
            accelerations=jnp.asarray(d["accelerations"], dtype=dtype),
            masses=jnp.asarray(d["masses"], dtype=dtype),
            time=jnp.asarray(d.get("time", 0.0), dtype=dtype),
            step=jnp.asarray(d.get("step", 0), dtype=jnp.int32),
        )


def make_state(positions, velocities, masses, accelerations=None, time=0.0,
               step=0, dtype=jnp.float32) -> SimState:
    """Build a SimState from arrays; accelerations default to zeros (callers
    normally recompute them with the force kernel immediately after)."""
    positions = jnp.asarray(positions, dtype=dtype)
    velocities = jnp.asarray(velocities, dtype=dtype)
    masses = jnp.asarray(masses, dtype=dtype)
    if accelerations is None:
        accelerations = jnp.zeros_like(positions)
    else:
        accelerations = jnp.asarray(accelerations, dtype=dtype)
    # Batched inputs (B, N, 3) get per-sim time/step arrays of shape (B,)
    # so the state vmaps over axis 0 on every leaf.
    batch_shape = positions.shape[:-2]
    return SimState(
        positions=positions,
        velocities=velocities,
        accelerations=accelerations,
        masses=masses,
        time=jnp.broadcast_to(jnp.asarray(time, dtype=dtype), batch_shape),
        step=jnp.broadcast_to(jnp.asarray(step, dtype=jnp.int32), batch_shape),
    )
