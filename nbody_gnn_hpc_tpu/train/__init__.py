"""Training layer (reference parity: ``src/ai/train.py``)."""

from nbody_gnn_hpc_tpu.train.dataset import (GNNDataset,
                                             datasets_from_manifest,
                                             write_manifest)
from nbody_gnn_hpc_tpu.train.loss import PhysicsInformedLoss, mse_loss
from nbody_gnn_hpc_tpu.train.schedule import (cosine_warm_restarts,
                                              make_step_schedule)
from nbody_gnn_hpc_tpu.train.trainer import Trainer

__all__ = ["GNNDataset", "PhysicsInformedLoss", "mse_loss", "Trainer",
           "cosine_warm_restarts", "make_step_schedule",
           "datasets_from_manifest", "write_manifest"]
