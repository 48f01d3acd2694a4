"""Persistence layer (reference parity: ``src/hpc/checkpoint.py``)."""

from nbody_gnn_hpc_tpu.io.checkpoint import (CheckpointManager,
                                             create_training_dataset)
from nbody_gnn_hpc_tpu.io.model_io import load_checkpoint, save_checkpoint

__all__ = ["CheckpointManager", "create_training_dataset",
           "save_checkpoint", "load_checkpoint"]
