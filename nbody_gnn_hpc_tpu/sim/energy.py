"""Energy and momentum diagnostics (device-side, vectorized).

Semantics match the reference's ``compute_total_energy``
(``src/hpc/nbody.py:101-130``): kinetic = sum 0.5 m v^2; potential =
-G sum_{i<j} m_i m_j / sqrt(r^2 + eps^2).  The reference's serial double
loop becomes a masked pairwise reduction (its own metrics module already
uses this formulation at ``src/utils/metrics.py:85-104``).
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from nbody_gnn_hpc_tpu.sim.forces import G, SOFTENING


def kinetic_energy(velocities: jnp.ndarray, masses: jnp.ndarray) -> jnp.ndarray:
    """0.5 * sum_i m_i |v_i|^2  — shapes (..., N, 3), (..., N)."""
    return 0.5 * jnp.sum(masses * jnp.sum(velocities * velocities, axis=-1), axis=-1)


def potential_energy(positions: jnp.ndarray, masses: jnp.ndarray,
                     softening: float = SOFTENING) -> jnp.ndarray:
    """-G * sum_{i<j} m_i m_j / sqrt(|x_i - x_j|^2 + eps^2), shape (...,).

    Computed with mean-mass-normalized masses so the pairwise product stays
    O(1): m_i * m_j overflows float32 beyond masses ~1e19 (solar-system
    scenes use ~1e30).  The prefactor is reapplied in an overflow-safe
    order: ((G * scale) * sum) * scale.
    """
    dtype = positions.dtype
    n = positions.shape[-2]
    diff = positions[..., None, :, :] - positions[..., :, None, :]
    r2 = jnp.sum(diff * diff, axis=-1) + jnp.asarray(softening, dtype) ** 2
    inv_r = jax.lax.rsqrt(r2)
    # Zero the diagonal (self-pairs); factor 0.5 de-duplicates (i,j)/(j,i).
    eye = jnp.eye(n, dtype=dtype)
    inv_r = inv_r * (1.0 - eye)
    scale = jnp.mean(masses, axis=-1, keepdims=True)
    nm = masses / scale
    mm = nm[..., None, :] * nm[..., :, None]
    s = jnp.sum(mm * inv_r, axis=(-2, -1))
    scale = jnp.squeeze(scale, axis=-1)
    return -0.5 * ((jnp.asarray(G, dtype) * scale) * s) * scale


def total_energy(positions: jnp.ndarray, velocities: jnp.ndarray,
                 masses: jnp.ndarray, softening: float = SOFTENING
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(kinetic, potential, total) — mirrors ``compute_total_energy``'s
    return contract (``nbody.py:101-130``)."""
    ke = kinetic_energy(velocities, masses)
    pe = potential_energy(positions, masses, softening)
    return ke, pe, ke + pe


def total_momentum(velocities: jnp.ndarray, masses: jnp.ndarray) -> jnp.ndarray:
    """sum_i m_i v_i — shape (..., 3).  Exactly conserved by pairwise forces
    (Newton's third law); used as a test oracle (SURVEY §4)."""
    return jnp.sum(masses[..., None] * velocities, axis=-2)
