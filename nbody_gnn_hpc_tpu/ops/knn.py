"""On-device graph construction: k-NN and fully-connected edge sets.

The reference builds k-NN graphs on the host with ``scipy.spatial.cKDTree``
— once per dataset for training (``src/ai/train.py:103-122``) but once per
rollout step for inference (``src/ai/predict.py:76-82``), forcing two
host<->device transfers per step.  Here the k-NN is a dense distance matrix +
``lax.top_k`` with the self-distance masked out: static shapes, stays on
device, jit/vmap/scan-compatible.  The resulting edge *set* matches cKDTree's
``query(k+1)[:, 1:]`` (order within the k neighbors is irrelevant to the
sum-aggregation GNN).
"""

import jax
import jax.numpy as jnp
import numpy as np


# Above this particle count, knn_edge_index switches to the row-blocked
# formulation: the dense path materializes an (N, N) f32 distance matrix
# (400 MB at N=10k — the BH-regime sizes the sim side already runs), the
# blocked path peaks at (KNN_BLOCK, N). 2048 keeps the protocol sizes
# (N=200) on the single-fused-op dense path.
KNN_DENSE_MAX = 2048
KNN_BLOCK = 512


def knn_edge_index(positions: jnp.ndarray, k: int,
                   block_size=None) -> jnp.ndarray:
    """k nearest neighbors for each particle, excluding self.

    Args:
        positions: (N, 3).
        k: neighbor count (k < N).
        block_size: force the row-blocked path with this block size
            (default: dense for N <= KNN_DENSE_MAX, else blocked with
            KNN_BLOCK rows — O(block*N) memory instead of O(N^2), the same
            trick as the blocked potential energy, sim/energy.py).

    Returns:
        (2, N*k) int32 edge_index: row i repeated k times -> its k nearest
        neighbors, matching the reference's layout
        (``train.py:118-120``: row=repeat(arange(N), k), col=knn indices).
        The reference's any-N equivalent is a host cKDTree per call
        (``predict.py:54-91``); both paths here are jit/vmap/scan-safe.
    """
    n = positions.shape[0]
    if block_size is None and n > KNN_DENSE_MAX:
        block_size = KNN_BLOCK
    if block_size is not None and block_size < n:
        idx = _knn_rows_blocked(positions, k, int(block_size))
    else:
        d2 = jnp.sum(
            (positions[:, None, :] - positions[None, :, :]) ** 2, axis=-1)
        # Exclude self by pushing the diagonal to +inf before top_k of -d2
        # (via where — adding eye*inf would poison off-diagonals with
        # 0*inf=NaN).
        d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
        _, idx = jax.lax.top_k(-d2, k)  # (N, k) nearest-first
    row = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    col = idx.reshape(-1).astype(jnp.int32)
    return jnp.stack([row, col])


def _knn_rows_blocked(positions: jnp.ndarray, k: int,
                      block_size: int) -> jnp.ndarray:
    """(N, k) nearest-neighbor indices, O(block_size * N) peak memory.

    Rows are processed in blocks: each block materializes only its
    (block, N) distance slab. Every row's distance vector is computed with
    the same elementwise ops as the dense path, so the selected neighbor
    sets are identical (top_k tie-breaking included). Padding rows (to a
    block multiple) are computed and sliced off.
    """
    n = positions.shape[0]
    n_blocks = -(-n // block_size)
    n_pad = n_blocks * block_size
    pos_pad = jnp.pad(positions, ((0, n_pad - n), (0, 0)))
    rows = pos_pad.reshape(n_blocks, block_size, positions.shape[1])
    row_ids = jnp.arange(n_pad, dtype=jnp.int32).reshape(n_blocks,
                                                         block_size)
    col_ids = jnp.arange(n, dtype=jnp.int32)

    def one_block(args):
        block_pos, block_ids = args
        d2 = jnp.sum(
            (block_pos[:, None, :] - positions[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(block_ids[:, None] == col_ids[None, :], jnp.inf, d2)
        _, idx = jax.lax.top_k(-d2, k)
        return idx

    idx = jax.lax.map(one_block, (rows, row_ids))  # (n_blocks, block, k)
    return idx.reshape(n_pad, k)[:n]


def fully_connected_edge_index(n: int) -> np.ndarray:
    """All ordered pairs (i, j), i != j — layout parity with
    ``train.py:93-99`` / ``predict.py:83-86`` (row-major, self removed)."""
    row = np.repeat(np.arange(n), n)
    col = np.tile(np.arange(n), n)
    mask = row != col
    return np.stack([row[mask], col[mask]]).astype(np.int32)


def is_row_regular(edge_index, n_nodes: int) -> bool:
    """True iff ``edge_index[0] == repeat(arange(n_nodes), E // n_nodes)`` —
    the layout both builders above emit, and the precondition for the GNN's
    scatter-free ``gather_mode="matmul"`` (models/gnn.py). Host-side check
    on concrete arrays (cannot run under jit)."""
    edges = np.asarray(edge_index)
    n_edges = edges.shape[1]
    if n_nodes == 0 or n_edges % n_nodes != 0:
        return False
    return np.array_equal(
        edges[0], np.repeat(np.arange(n_nodes), n_edges // n_nodes))


def edge_index_for(n_particles: int, k_neighbors, positions=None):
    """Reference edge-policy dispatch (``train.py:91-122``): fully connected
    when k is None or k >= N-1, else k-NN from ``positions``."""
    if k_neighbors is None or k_neighbors >= n_particles - 1:
        return jnp.asarray(fully_connected_edge_index(n_particles))
    if positions is None:
        raise ValueError("positions required for k-NN edges")
    return knn_edge_index(jnp.asarray(positions), int(k_neighbors))
