"""Inference layer (reference parity: ``src/ai/predict.py``)."""

from nbody_gnn_hpc_tpu.predict.predictor import Predictor, compare_with_hpc

__all__ = ["Predictor", "compare_with_hpc"]
