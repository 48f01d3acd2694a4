"""Physics-informed edge features + segment aggregation helpers.

Numerics match ``NBodyGNN.compute_edge_features`` (``src/ai/model.py:124-132``)
exactly: dist = |pos_col - pos_row| + 1e-8; direction = diff / dist;
inv_dist_sq = 1 / (dist^2 + 1e-6).  Features are computed once per forward
pass and shared by all message-passing layers (reference ``model.py:153-156``).
"""

import jax
import jax.numpy as jnp


def edge_features(pos: jnp.ndarray, edge_index: jnp.ndarray) -> jnp.ndarray:
    """(E, 5) features [dist, dir_x, dir_y, dir_z, 1/(dist^2+1e-6)].

    Args:
        pos: (N, 3) node positions (normalized space during training).
        edge_index: (2, E) int — [row (source), col (target)].
    """
    row, col = edge_index[0], edge_index[1]
    diff = pos[col] - pos[row]
    dist = jnp.linalg.norm(diff, axis=-1, keepdims=True) + 1e-8
    direction = diff / dist
    inv_dist_sq = 1.0 / (dist ** 2 + 1e-6)
    return jnp.concatenate([dist, direction, inv_dist_sq], axis=-1)


def aggregate_to_targets(messages: jnp.ndarray, edge_index: jnp.ndarray,
                         n_nodes: int) -> jnp.ndarray:
    """Sum edge messages into their target nodes.

    PyG's default flow is source_to_target with aggregation at
    ``edge_index[1]`` (the reference's ``aggr='add'`` MessagePassing,
    ``model.py:35``); ``jax.ops.segment_sum`` with static ``num_segments``
    compiles to a single scatter-add on TPU.
    """
    return jax.ops.segment_sum(messages, edge_index[1], num_segments=n_nodes)
