"""Inference layer (reference parity: ``src/ai/predict.py``)."""

from nbody_gnn_hpc_tpu.predict.predictor import Predictor, compare_with_hpc
from nbody_gnn_hpc_tpu.predict.quantize import (dequantize_params,
                                                quantize_checkpoint,
                                                quantize_params)
from nbody_gnn_hpc_tpu.predict.selection import (discover_checkpoints,
                                                 score_checkpoints,
                                                 select_checkpoint)

__all__ = ["Predictor", "compare_with_hpc", "quantize_params",
           "dequantize_params", "quantize_checkpoint",
           "discover_checkpoints", "score_checkpoints", "select_checkpoint"]
