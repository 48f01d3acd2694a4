"""Model checkpoint serialization.

Parity target: the reference's torch ``.pt`` checkpoints
(``src/ai/train.py:537-549``) containing model + optimizer + scheduler state,
best val loss, history, and the load-bearing normalization stats consumed at
inference (``src/ai/predict.py:42-52``).  Same dict keys and filenames
(``best_model.pt`` / ``checkpoint_epoch_K.pt`` / ``final_model.pt``); the
container is a pickle of numpy-ified JAX pytrees instead of a torch archive
(torch is not part of this framework's compute path).
"""

import pickle
from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def save_checkpoint(filepath, *, params, opt_state=None, scheduler_state=None,
                    best_val_loss=None, history=None, norm_stats=None,
                    model_config=None, extra: Dict = None) -> str:
    """Write a checkpoint dict mirroring the reference's keys
    (``train.py:540-547``): model/optimizer/scheduler state, best_val_loss,
    history, norm_stats — plus model_config for self-describing loads."""
    filepath = Path(filepath)
    filepath.parent.mkdir(parents=True, exist_ok=True)
    ckpt = {
        "model_state_dict": _to_numpy(params),
        "optimizer_state_dict": _to_numpy(opt_state),
        "scheduler_state_dict": _to_numpy(scheduler_state),
        "best_val_loss": best_val_loss,
        "history": history,
        "norm_stats": _to_numpy(norm_stats),
        "model_config": model_config,
        "format": "nbody_gnn_hpc_tpu.pickle.v1",
    }
    if extra:
        ckpt.update(extra)
    with open(filepath, "wb") as f:
        pickle.dump(ckpt, f, protocol=pickle.HIGHEST_PROTOCOL)
    return str(filepath)


def load_checkpoint(filepath) -> Dict:
    with open(filepath, "rb") as f:
        return pickle.load(f)
