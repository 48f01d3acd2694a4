"""Model layer (reference parity: ``src/ai/model.py``)."""

from nbody_gnn_hpc_tpu.models.gnn import (NBodyGNN, ParticleInteractionLayer,
                                          count_parameters, forward_batch,
                                          init_model, model_from_config)

__all__ = ["NBodyGNN", "ParticleInteractionLayer", "init_model",
           "count_parameters", "forward_batch", "model_from_config"]
