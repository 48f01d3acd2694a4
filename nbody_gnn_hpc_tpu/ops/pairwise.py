"""Tiled Pallas TPU kernel for O(N^2) softened gravity at large N.

This is the TPU-native replacement for the reference's Barnes-Hut flat-tree
traversal (``src/hpc/barnes_hut.py:367-431``): instead of pointer-chasing an
octree (TPU-hostile — SURVEY §2.2), the N x N interaction matrix is blocked
through VMEM, i-tiles in the grid, j-tiles in an inner loop, so no O(N^2)
intermediate ever exists in HBM.  At N=10k the entire positions array
(packed, ~0.3 MB) sits in VMEM while each grid step streams (TILE_I, TILE_J)
pair-blocks through the VPU.

Layout: particle data is packed into lane-aligned arrays —

- ``packed``  (8, N_pad): rows 0..2 = x,y,z; row 3 = G * m (pre-scaled so the
  kernel never multiplies by G); rows 4..7 zero padding to the f32 sublane
  tile of 8.
- ``packedT`` (N_pad, 8): same data transposed, so the i-tile reads its
  coordinates as (TILE_I, 1) columns without an on-chip transpose.

Zero-mass padding rows exert exactly zero force; the self-pair contributes
exactly zero because dx = 0 (finite softened factor times zero displacement),
matching the reference's ``if i != j`` skip (``nbody.py:46``).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_gnn_hpc_tpu.sim.forces import G, SOFTENING

TILE_I = 256
TILE_J = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pairwise_kernel(packed_ref, packedT_ref, out_ref, *, n_pad: int,
                     softening: float):
    """One grid step: accelerations for TILE_I receiver particles.

    packed_ref:  (8, n_pad) full array in VMEM (sources).
    packedT_ref: (TILE_I, 8) block — receivers' coordinates.
    out_ref:     (TILE_I, 8) block — cols 0..2 receive ax, ay, az.
    """
    soft2 = jnp.float32(softening * softening)
    xi = packedT_ref[:, 0:1]  # (TILE_I, 1)
    yi = packedT_ref[:, 1:2]
    zi = packedT_ref[:, 2:3]

    n_j_blocks = n_pad // TILE_J

    def body(j, acc):
        ax, ay, az = acc
        xj = packed_ref[0:1, pl.ds(j * TILE_J, TILE_J)]   # (1, TILE_J)
        yj = packed_ref[1:2, pl.ds(j * TILE_J, TILE_J)]
        zj = packed_ref[2:3, pl.ds(j * TILE_J, TILE_J)]
        gm = packed_ref[3:4, pl.ds(j * TILE_J, TILE_J)]   # G * m_j

        dx = xj - xi                                      # (TILE_I, TILE_J)
        dy = yj - yi
        dz = zj - zi
        d2 = dx * dx + dy * dy + dz * dz
        inv_r = jax.lax.rsqrt(d2 + soft2)
        f = gm * (inv_r * inv_r * inv_r)                  # G m_j / r^3
        # Zero coincident pairs explicitly: G*m/soft^3 can overflow f32 at
        # large masses and inf * 0 = NaN (see sim/forces.py).
        f = jnp.where(d2 > 0, f, 0.0)
        ax = ax + jnp.sum(f * dx, axis=1, keepdims=True)
        ay = ay + jnp.sum(f * dy, axis=1, keepdims=True)
        az = az + jnp.sum(f * dz, axis=1, keepdims=True)
        return ax, ay, az

    zero = jnp.zeros((TILE_I, 1), jnp.float32)
    ax, ay, az = jax.lax.fori_loop(0, n_j_blocks, body, (zero, zero, zero))

    out = jnp.concatenate(
        [ax, ay, az, jnp.zeros((TILE_I, 5), jnp.float32)], axis=1)
    out_ref[:, :] = out


@functools.partial(jax.jit, static_argnames=("softening", "interpret"))
def pallas_accelerations(positions: jnp.ndarray,
                         masses: jnp.ndarray,
                         softening: float = SOFTENING,
                         interpret: bool = False) -> jnp.ndarray:
    """Blocked all-pairs accelerations via Pallas.

    Args:
        positions: (N, 3) float32.
        masses:    (N,) float32.
        softening: Plummer softening length (static).
        interpret: run in Pallas interpreter mode (CPU testing).

    Returns:
        (N, 3) float32 accelerations, numerically matching
        :func:`nbody_gnn_hpc_tpu.sim.forces.pairwise_accelerations` up to f32
        reduction-order rounding (the reference's Numba ``fastmath`` kernel
        makes no bitwise-sum guarantee either — SURVEY §7 "hard parts").
    """
    n = positions.shape[0]
    n_pad = _round_up(max(n, TILE_J), TILE_J)
    positions = positions.astype(jnp.float32)
    masses = masses.astype(jnp.float32)

    xyz = jnp.pad(positions, ((0, n_pad - n), (0, 0))).T       # (3, n_pad)
    gm = jnp.pad(jnp.float32(G) * masses, (0, n_pad - n))[None]  # (1, n_pad)
    packed = jnp.concatenate(
        [xyz, gm, jnp.zeros((4, n_pad), jnp.float32)], axis=0)  # (8, n_pad)
    packedT = packed.T                                          # (n_pad, 8)

    grid = (n_pad // TILE_I,)
    out = pl.pallas_call(
        functools.partial(_pairwise_kernel, n_pad=n_pad, softening=softening),
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_I, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_I, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=15 * n_pad * n_pad, bytes_accessed=2 * 8 * n_pad * 4,
            transcendentals=n_pad * n_pad),
    )(packed, packedT)

    return out[:n, :3]
