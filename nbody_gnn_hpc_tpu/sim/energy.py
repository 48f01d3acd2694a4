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


# Above this N the dense formulation's (N, N, 3) diff tensor outgrows HBM
# comfort (~1.2 GB f32 at N=10k); the row-blocked scan takes over.  Same
# threshold class as ops/pairwise.PALLAS_MIN_N.
BLOCKED_MIN_N = 2048
PE_BLOCK = 512  # rows per block: (PE_BLOCK, N) pair plane, ~20 MB at N=10k


def potential_energy(positions: jnp.ndarray, masses: jnp.ndarray,
                     softening: float = SOFTENING) -> jnp.ndarray:
    """-G * sum_{i<j} m_i m_j / sqrt(|x_i - x_j|^2 + eps^2), shape (...,).

    Computed with mean-mass-normalized masses so the pairwise product stays
    O(1): m_i * m_j overflows float32 beyond masses ~1e19 (solar-system
    scenes use ~1e30).  The prefactor is reapplied in an overflow-safe
    order: ((G * scale) * sum) * scale.

    Large N (>= BLOCKED_MIN_N) dispatches to a row-blocked ``lax.scan`` so
    the diagnostic runs in O(PE_BLOCK * N) memory — the TPU-native
    equivalent of the reference's any-N serial loop
    (``src/hpc/nbody.py:101-130``); ``NBodySimulator.run(verbose=True)``
    energy prints work in the Barnes-Hut regime because of it (SURVEY
    §2.2's "blocked variant for N=10k").
    """
    n = positions.shape[-2]
    if n >= BLOCKED_MIN_N:
        return _potential_energy_blocked(positions, masses, softening)
    dtype = positions.dtype
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


def _potential_energy_blocked(positions: jnp.ndarray, masses: jnp.ndarray,
                              softening: float = SOFTENING) -> jnp.ndarray:
    """Row-blocked PE: scan over PE_BLOCK-row blocks, each a (block, N)
    pair plane — bounded memory at any N.  Same math and overflow-safe
    scaling as the dense path; padding rows carry zero normalized mass so
    they contribute exactly zero (their inv_r is finite: r2 >= softening^2
    > 0 against every partner)."""
    if positions.ndim > 2:
        # Batched leading dims: vmap the flat computation.  Shared (N,)
        # masses broadcast against batched positions like the dense path.
        lead = positions.shape[:-2]
        flat_p = positions.reshape((-1,) + positions.shape[-2:])
        flat_m = jnp.broadcast_to(
            masses, lead + masses.shape[-1:]).reshape(
                (-1,) + masses.shape[-1:])
        out = jax.vmap(
            lambda p, m: _potential_energy_blocked(p, m, softening)
        )(flat_p, flat_m)
        return out.reshape(lead)

    dtype = positions.dtype
    n = positions.shape[0]
    n_blocks = -(-n // PE_BLOCK)
    pad = n_blocks * PE_BLOCK - n

    scale = jnp.mean(masses, axis=-1)
    nm = masses.astype(dtype) / scale
    pos = positions
    if pad:
        pos = jnp.concatenate(
            [pos, jnp.zeros((pad, 3), dtype)], axis=0)
        nm = jnp.concatenate([nm, jnp.zeros((pad,), dtype)], axis=0)
    soft2 = jnp.asarray(softening, dtype) ** 2
    col_idx = jnp.arange(n_blocks * PE_BLOCK, dtype=jnp.int32)
    row_blocks = pos.reshape(n_blocks, PE_BLOCK, 3)
    nm_blocks = nm.reshape(n_blocks, PE_BLOCK)

    def block_sum(carry, inputs):
        b, rows, nm_rows = inputs
        diff = rows[:, None, :] - pos[None, :, :]       # (block, N_pad, 3)
        r2 = jnp.sum(diff * diff, axis=-1) + soft2
        inv_r = jax.lax.rsqrt(r2)
        rows_idx = b * PE_BLOCK + jnp.arange(PE_BLOCK, dtype=jnp.int32)
        inv_r = jnp.where(rows_idx[:, None] == col_idx[None, :],
                          jnp.zeros((), dtype), inv_r)  # self-pairs
        mm = nm_rows[:, None] * nm[None, :]
        return carry + jnp.sum(mm * inv_r), None

    s, _ = jax.lax.scan(
        block_sum, jnp.zeros((), dtype),
        (jnp.arange(n_blocks, dtype=jnp.int32), row_blocks, nm_blocks))
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
