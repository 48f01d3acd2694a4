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


# -- small-N single-shot kernel (vmap-friendly) -------------------------------

def _pairwise_small_kernel(packed_ref, packedT_ref, out_ref, *,
                           softening: float):
    """Whole N_pad x N_pad pair plane in one shot (no grid, no loop).

    NEGATIVE RESULT, kept as documentation: the hypothesis was that vmapping
    this empty-grid kernel over the 300-sim datagen batch (vmap prepends a
    grid axis) would beat XLA's fused broadcast. Measured on the v5e it is
    17x SLOWER (19.2 vs 1.1 ms per batched eval at (300, 200)) — the
    per-grid-step packing/DMA overhead dominates at these tiny plane sizes,
    and embedding the custom call in the 400-step trajectory scan OOMs HBM
    (XLA loses its buffer-reuse planning around the opaque call). The
    production dispatch therefore keeps small N on the XLA kernel
    (sim/forces.py); Pallas pays off only at large N where the plane work
    amortizes the call (see the symmetric kernel below).
    """
    soft2 = jnp.float32(softening * softening)
    xi = packedT_ref[:, 0:1]
    yi = packedT_ref[:, 1:2]
    zi = packedT_ref[:, 2:3]
    xj = packed_ref[0:1, :]
    yj = packed_ref[1:2, :]
    zj = packed_ref[2:3, :]
    gm = packed_ref[3:4, :]
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    d2s = dx * dx + (dy * dy + (dz * dz + soft2))
    inv_r = jax.lax.rsqrt(d2s)
    f = gm * (inv_r * inv_r * inv_r)  # finite at the self pair; f * 0 = 0
    ax = jnp.sum(f * dx, axis=1, keepdims=True)
    ay = jnp.sum(f * dy, axis=1, keepdims=True)
    az = jnp.sum(f * dz, axis=1, keepdims=True)
    n_pad = ax.shape[0]
    out_ref[:, :] = jnp.concatenate(
        [ax, ay, az, jnp.zeros((n_pad, 5), jnp.float32)], axis=1)


@functools.partial(jax.jit, static_argnames=("softening", "interpret"))
def pallas_accelerations_small(positions: jnp.ndarray,
                               masses: jnp.ndarray,
                               softening: float = SOFTENING,
                               interpret: bool = False) -> jnp.ndarray:
    """Single-shot blocked all-pairs for N ≲ 1k (same contract as
    :func:`pallas_accelerations`); vmap over a leading batch axis turns the
    empty grid into a per-sim grid — the datagen fast path."""
    n = positions.shape[0]
    n_pad = _round_up(max(n, 128), 128)
    positions = positions.astype(jnp.float32)
    masses = masses.astype(jnp.float32)
    xyz = jnp.pad(positions, ((0, n_pad - n), (0, 0))).T
    gm = jnp.pad(jnp.float32(G) * masses, (0, n_pad - n))[None]
    packed = jnp.concatenate(
        [xyz, gm, jnp.zeros((4, n_pad), jnp.float32)], axis=0)

    out = pl.pallas_call(
        functools.partial(_pairwise_small_kernel, softening=softening),
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=15 * n_pad * n_pad, bytes_accessed=2 * 8 * n_pad * 4,
            transcendentals=n_pad * n_pad),
    )(packed, packed.T)
    return out[:n, :3]


# -- symmetric (Newton's 3rd law) kernel -------------------------------------

TILE_SYM = 512  # square tile; (512, 512) f32 planes keep scoped VMEM < 16 MB


def _pairwise_sym_kernel(packed_ref, packedT_ref, out_ref, acc_ref, *,
                         n_pad: int, softening: float):
    """Grid step I: all tile pairs (I, J>=I), each computed ONCE.

    Newton's 3rd law halves the pair work: for an off-diagonal tile pair the
    mass-free kernel plane s = (d² + soft²)^{-3/2} and the displacement
    planes are shared between the force on the i side (row sums, weighted by
    G·m_j) and the reaction on the j side (column sums, weighted by G·m_i,
    negated). The j-side sums accumulate across grid steps in a persistent
    (8, n_pad) VMEM scratch — TPU grids execute sequentially on a core, so
    step I reads contributions exactly from steps < I.

    The diagonal tile is computed the plain full way (both triangles): the
    self pair contributes exactly zero because s is finite (soft² > 0) and
    multiplies a zero displacement. Finite-f caveat: G·m·soft⁻³ must stay
    below f32 max, i.e. m ≲ 5e21 at the default softening — twelve orders
    of magnitude above the reference's mass range (nbody.py:147).
    """
    soft2 = jnp.float32(softening * softening)
    tile = TILE_SYM
    grid_i = pl.program_id(0)
    n_blocks = n_pad // tile

    @pl.when(grid_i == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    base = grid_i * tile
    xi = packedT_ref[pl.ds(base, tile), 0:1]   # (tile, 1)
    yi = packedT_ref[pl.ds(base, tile), 1:2]
    zi = packedT_ref[pl.ds(base, tile), 2:3]
    gmi = packedT_ref[pl.ds(base, tile), 3:4]

    def planes(off):
        xj = packed_ref[0:1, pl.ds(off, tile)]  # (1, tile)
        yj = packed_ref[1:2, pl.ds(off, tile)]
        zj = packed_ref[2:3, pl.ds(off, tile)]
        gmj = packed_ref[3:4, pl.ds(off, tile)]
        dx = xj - xi
        dy = yj - yi
        dz = zj - zi
        d2s = dx * dx + (dy * dy + (dz * dz + soft2))
        inv_r = jax.lax.rsqrt(d2s)
        s = inv_r * inv_r * inv_r
        return gmj, s, dx, dy, dz

    # Diagonal tile: full computation, i-side only (covers both orders).
    gmj, s, dx, dy, dz = planes(base)
    f = gmj * s
    ax = jnp.sum(f * dx, axis=1, keepdims=True)
    ay = jnp.sum(f * dy, axis=1, keepdims=True)
    az = jnp.sum(f * dz, axis=1, keepdims=True)

    def body(j, acc):
        ax, ay, az = acc
        off = j * tile
        gmj, s, dx, dy, dz = planes(off)
        tx = s * dx
        ty = s * dy
        tz = s * dz
        ax = ax + jnp.sum(gmj * tx, axis=1, keepdims=True)
        ay = ay + jnp.sum(gmj * ty, axis=1, keepdims=True)
        az = az + jnp.sum(gmj * tz, axis=1, keepdims=True)
        # Reaction on the j tile (gmi weights rows; negated by symmetry).
        acc_ref[0:1, pl.ds(off, tile)] -= jnp.sum(gmi * tx, axis=0,
                                                  keepdims=True)
        acc_ref[1:2, pl.ds(off, tile)] -= jnp.sum(gmi * ty, axis=0,
                                                  keepdims=True)
        acc_ref[2:3, pl.ds(off, tile)] -= jnp.sum(gmi * tz, axis=0,
                                                  keepdims=True)
        return ax, ay, az

    ax, ay, az = jax.lax.fori_loop(grid_i + 1, n_blocks, body, (ax, ay, az))

    row = jnp.concatenate(
        [ax, ay, az, jnp.zeros((tile, 5), jnp.float32)], axis=1)
    out_ref[:, :] = row + acc_ref[:, pl.ds(base, tile)].T


def _pairwise_sym_mxu_kernel(packed_ref, packedT_ref, w_ref, out_ref,
                             acc_ref, *, n_pad: int, softening: float):
    """Symmetric kernel with MXU-offloaded reductions.

    ROUND-3 MEASURED NEGATIVE RESULT — DO NOT dispatch to this kernel.
    Measured on the v5e at N=10k (20-step scan harness): 0.632 ms/step
    (158 Gpairs/s) vs the direct symmetric kernel's 0.733 ms (136) — only
    +16%, because the kernel is rsqrt/plane-construction-bound on the VPU,
    not reduction-bound.  And the moment decomposition is numerically
    UNSOUND for close encounters: the per-particle error is
    eps * |x - c| * sum(gm*s), which reaches O(1) of the particle's own
    force when a neighbor is very close (measured max rel err 1.113 vs
    the XLA kernel at N=10k uniform, vs 5e-7 for the direct form —
    centering bounds |x| but not the |x|/|dx| ratio).  Kept, with its
    tests, as documentation of the dead end (ROADMAP round-3 item).

    The VPU's per-pair work in ``_pairwise_sym_kernel`` is dominated by the
    mass-weighting and the six reductions.  Both factor through the moment
    decomposition

        a_i = sum_j gm_j s_ij (x_j - x_i)
            = (s @ W)[:, 1:4] - x_i * (s @ W)[:, 0]    with W = gm*[1,x,y,z]

    so one (tile, tile) @ (tile, 8) MXU matmul replaces four weighted row
    reductions (and its mirror ``W_i^T @ s`` replaces the column side) while
    the VPU only builds the s-plane (~12 ops/pair instead of ~27).

    Exactness: the self pair MUST be zeroed in the s-plane — in the direct
    form it vanishes by multiplying dx = 0, but the decomposed form would
    compute s_ii*gm_i*x_i twice with different rounding and leave an
    eps * soft^-3-scale residual.  The wrapper also centers coordinates so
    the x-moment cancellation error stays at the pair-separation scale.
    """
    soft2 = jnp.float32(softening * softening)
    tile = TILE_SYM
    grid_i = pl.program_id(0)
    n_blocks = n_pad // tile

    @pl.when(grid_i == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    base = grid_i * tile
    xi = packedT_ref[pl.ds(base, tile), 0:1]   # (tile, 1)
    yi = packedT_ref[pl.ds(base, tile), 1:2]
    zi = packedT_ref[pl.ds(base, tile), 2:3]
    w_i = w_ref[pl.ds(base, tile), :]          # (tile, 8) gm*[1,x,y,z,0..]

    def s_plane(off):
        xj = packed_ref[0:1, pl.ds(off, tile)]  # (1, tile)
        yj = packed_ref[1:2, pl.ds(off, tile)]
        zj = packed_ref[2:3, pl.ds(off, tile)]
        dx = xj - xi
        dy = yj - yi
        dz = zj - zi
        d2 = dx * dx + (dy * dy + dz * dz)
        s = jax.lax.rsqrt(d2 + soft2)
        s = s * s * s
        # Coincident pairs: always zeroed here (the decomposed moments do
        # not get the dx=0 rescue the direct form has).
        return jnp.where(d2 > 0, s, 0.0)

    def moments_i(s, off):
        m = jnp.dot(s, w_ref[pl.ds(off, tile), :],
                    preferred_element_type=jnp.float32)     # (tile, 8)
        return m

    # Diagonal tile (self pair zeroed in-plane).
    s = s_plane(base)
    m = moments_i(s, base)
    ax = m[:, 1:2] - xi * m[:, 0:1]
    ay = m[:, 2:3] - yi * m[:, 0:1]
    az = m[:, 3:4] - zi * m[:, 0:1]

    def body(j, acc):
        ax, ay, az = acc
        off = j * tile
        s = s_plane(off)
        m = moments_i(s, off)                               # i-side moments
        ax = ax + (m[:, 1:2] - xi * m[:, 0:1])
        ay = ay + (m[:, 2:3] - yi * m[:, 0:1])
        az = az + (m[:, 3:4] - zi * m[:, 0:1])
        # j-side (reaction): mj = W_i^T @ s -> (8, tile); per column j:
        # a_j += mj[1:4] - x_j * mj[0]
        mj = jax.lax.dot_general(w_i, s, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        xj = packed_ref[0:1, pl.ds(off, tile)]
        yj = packed_ref[1:2, pl.ds(off, tile)]
        zj = packed_ref[2:3, pl.ds(off, tile)]
        acc_ref[0:1, pl.ds(off, tile)] += mj[1:2, :] - xj * mj[0:1, :]
        acc_ref[1:2, pl.ds(off, tile)] += mj[2:3, :] - yj * mj[0:1, :]
        acc_ref[2:3, pl.ds(off, tile)] += mj[3:4, :] - zj * mj[0:1, :]
        return ax, ay, az

    ax, ay, az = jax.lax.fori_loop(grid_i + 1, n_blocks, body, (ax, ay, az))

    row = jnp.concatenate(
        [ax, ay, az, jnp.zeros((tile, 5), jnp.float32)], axis=1)
    out_ref[:, :] = row + acc_ref[:, pl.ds(base, tile)].T


@functools.partial(jax.jit, static_argnames=("softening", "interpret"))
def pallas_accelerations_symmetric_mxu(positions: jnp.ndarray,
                                       masses: jnp.ndarray,
                                       softening: float = SOFTENING,
                                       interpret: bool = False
                                       ) -> jnp.ndarray:
    """Symmetric kernel with MXU moment reductions — measured negative
    result, NOT used by any dispatch (see the kernel docstring: +16% speed,
    catastrophically wrong for close encounters).  Same contract as
    :func:`pallas_accelerations_symmetric`; coordinates are centered first
    (translation-invariant physics), which bounds |x| by the cloud radius
    but cannot bound the |x|/|dx| cancellation ratio."""
    n = positions.shape[0]
    n_pad = _round_up(max(n, TILE_SYM), TILE_SYM)
    positions = positions.astype(jnp.float32)
    positions = positions - positions.mean(axis=0, keepdims=True)
    masses = masses.astype(jnp.float32)

    xyz_r = jnp.pad(positions, ((0, n_pad - n), (0, 0)))        # (n_pad, 3)
    xyz = xyz_r.T                                               # (3, n_pad)
    gm_r = jnp.pad(jnp.float32(G) * masses, (0, n_pad - n))     # (n_pad,)
    packed = jnp.concatenate(
        [xyz, gm_r[None], jnp.zeros((4, n_pad), jnp.float32)], axis=0)
    # Moment weights W = gm * [1, x, y, z, 0, 0, 0, 0]  (n_pad, 8).
    w = jnp.concatenate(
        [gm_r[:, None], gm_r[:, None] * xyz_r,
         jnp.zeros((n_pad, 4), jnp.float32)], axis=1)

    out = pl.pallas_call(
        functools.partial(_pairwise_sym_mxu_kernel, n_pad=n_pad,
                          softening=softening),
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        grid=(n_pad // TILE_SYM,),
        in_specs=[
            pl.BlockSpec((8, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_SYM, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, n_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * n_pad * n_pad + 2 * n_pad * n_pad * 8,
            bytes_accessed=3 * 8 * n_pad * 4,
            transcendentals=n_pad * n_pad // 2),
    )(packed, packed.T, w)

    return out[:n, :3]


@functools.partial(jax.jit, static_argnames=("softening", "interpret"))
def pallas_accelerations_symmetric(positions: jnp.ndarray,
                                   masses: jnp.ndarray,
                                   softening: float = SOFTENING,
                                   interpret: bool = False) -> jnp.ndarray:
    """Newton's-3rd-law blocked all-pairs accelerations (each pair computed
    once; ~1.7x the plain kernel at N=10k — 0.62 ms/step, 161 Gpairs/s
    counting ordered pairs). Same contract as :func:`pallas_accelerations`."""
    n = positions.shape[0]
    n_pad = _round_up(max(n, TILE_SYM), TILE_SYM)
    positions = positions.astype(jnp.float32)
    masses = masses.astype(jnp.float32)

    xyz = jnp.pad(positions, ((0, n_pad - n), (0, 0))).T
    gm = jnp.pad(jnp.float32(G) * masses, (0, n_pad - n))[None]
    packed = jnp.concatenate(
        [xyz, gm, jnp.zeros((4, n_pad), jnp.float32)], axis=0)

    out = pl.pallas_call(
        functools.partial(_pairwise_sym_kernel, n_pad=n_pad,
                          softening=softening),
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        grid=(n_pad // TILE_SYM,),
        in_specs=[
            pl.BlockSpec((8, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_SYM, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, n_pad), jnp.float32)],
        # The scratch carries state across grid steps: the grid must stay
        # sequential ("arbitrary"), never parallelized.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=9 * n_pad * n_pad, bytes_accessed=2 * 8 * n_pad * 4,
            transcendentals=n_pad * n_pad // 2),
    )(packed, packed.T)

    return out[:n, :3]
