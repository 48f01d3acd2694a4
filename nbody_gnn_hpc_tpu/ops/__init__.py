"""TPU kernel & graph-op layer: Pallas pairwise forces, on-device k-NN,
edge features, segment aggregation."""

from nbody_gnn_hpc_tpu.ops.edges import aggregate_to_targets, edge_features
from nbody_gnn_hpc_tpu.ops.fused_edge import fused_edge_layer
from nbody_gnn_hpc_tpu.ops.knn import (edge_index_for,
                                       fully_connected_edge_index,
                                       knn_edge_index)
from nbody_gnn_hpc_tpu.ops.pairwise import (pallas_accelerations,
                                            pallas_accelerations_small,
                                            pallas_accelerations_symmetric)

__all__ = [
    "pallas_accelerations", "pallas_accelerations_symmetric",
    "pallas_accelerations_small",
    "fused_edge_layer",
    "knn_edge_index", "fully_connected_edge_index",
    "edge_index_for", "edge_features", "aggregate_to_targets",
]
