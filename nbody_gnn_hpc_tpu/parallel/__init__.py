"""Parallelism layer: device mesh, sharded ensemble datagen, data-parallel
training (reference equivalent: mp.Pool fan-out, SURVEY §2.3)."""

from nbody_gnn_hpc_tpu.parallel.datagen import (PlanesEnsemble,
                                                build_ensemble_state,
                                                fetch_host_trajectory,
                                                simulate_ensemble,
                                                trajectory_slice)
from nbody_gnn_hpc_tpu.parallel.mesh import (DATA_AXIS, DCN_AXIS,
                                             batch_sharding, make_hybrid_mesh,
                                             make_mesh, pad_to_multiple,
                                             replicated, slice_structure)
from nbody_gnn_hpc_tpu.parallel.train_dp import make_dp_train_step

__all__ = [
    "DATA_AXIS", "DCN_AXIS", "make_mesh", "make_hybrid_mesh",
    "slice_structure", "batch_sharding", "replicated",
    "pad_to_multiple", "simulate_ensemble", "build_ensemble_state",
    "trajectory_slice", "make_dp_train_step", "PlanesEnsemble",
    "fetch_host_trajectory",
]
