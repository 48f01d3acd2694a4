"""Model checkpoint serialization.

Parity target: the reference's torch ``.pt`` checkpoints
(``src/ai/train.py:537-549``) containing model + optimizer + scheduler state,
best val loss, history, and the load-bearing normalization stats consumed at
inference (``src/ai/predict.py:42-52``).  Same dict keys and filenames
(``best_model.pt`` / ``checkpoint_epoch_K.pt`` / ``final_model.pt``); the
container is a pickle of numpy-ified JAX pytrees instead of a torch archive
(torch is not part of this framework's compute path).
"""

import json
import os
import pickle
import re
from pathlib import Path
from typing import Any, Dict, Optional

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
    # Write-to-temp + atomic rename: a crash mid-save (stall-watchdog
    # os._exit, SIGKILL) must never leave a truncated pickle at the final
    # path — `--resume auto` skips unreadable files, but evaluate/serve
    # load these by name and would die on a torn best_model.pt.
    tmppath = filepath.with_name(filepath.name + ".tmp")
    with open(tmppath, "wb") as f:
        pickle.dump(ckpt, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmppath, filepath)
    return str(filepath)


def load_checkpoint(filepath) -> Dict:
    with open(filepath, "rb") as f:
        return pickle.load(f)


# Filenames the training loop itself writes (``Trainer.train``); resume must
# ignore post-training artifacts (selected_model.pt, best_rollout_model.pt)
# — those are inference promotions, not training states.
_TRAIN_CKPT_RE = re.compile(
    r"^(final_model|best_model|checkpoint_epoch_\d+)\.pt$")
# Tie-break when several files record the same epoch: final_model is written
# last (complete state at exit), a cadence checkpoint next, best_model is
# the oldest of the three at a given epoch.
def _tie_rank(name: str) -> int:
    if name.startswith("final_model"):
        return 2
    return 1 if name.startswith("checkpoint_epoch_") else 0


def latest_checkpoint(model_dir, backend: str = "pickle") -> Optional[str]:
    """Filename of the training checkpoint with the highest recorded epoch.

    Powers ``train_model.py --resume auto`` (crash/outage recovery): scans
    the training loop's own artifacts — ``final_model.pt``,
    ``checkpoint_epoch_*.pt``, ``best_model.pt`` (or the Orbax sidecar
    index's entries under the same names) — and returns the name whose
    stored ``scheduler_state_dict.epoch`` is largest, or ``None`` if no
    resumable checkpoint exists. Unreadable/foreign ``.pt`` files are
    skipped rather than fatal: a half-written file from the crashed run
    must not block recovery.
    """
    model_dir = Path(model_dir)

    def epoch_of(entry: Dict) -> int:
        sched = entry.get("scheduler_state_dict") or {}
        return int(sched.get("epoch", 0) or 0)

    candidates = {}  # filename -> epoch
    if backend == "orbax":
        index_path = model_dir / "orbax_index.json"
        if index_path.exists():
            try:
                index = json.loads(index_path.read_text())
            except json.JSONDecodeError:
                index = {}  # torn sidecar from the crash — no entries usable
            for name, entry in index.items():
                if not _TRAIN_CKPT_RE.match(name):
                    continue
                # The sidecar index is written synchronously but the tensor
                # save it points at is ASYNC (Orbax): a crash between the
                # two leaves an index entry whose step never became durable.
                # Orbax finalizes a step by renaming its temp dir to the
                # bare step number and writing _CHECKPOINT_METADATA, so
                # durability is a cheap filesystem check — skip entries
                # whose step isn't finalized instead of letting restore
                # crash the resume.
                step_dir = model_dir / "orbax" / str(entry.get("step"))
                if not (step_dir / "_CHECKPOINT_METADATA").exists():
                    continue
                candidates[name] = epoch_of(entry)
    else:
        for path in sorted(model_dir.glob("*.pt")):
            if not _TRAIN_CKPT_RE.match(path.name):
                continue
            try:
                ckpt = load_checkpoint(path)
            except Exception:
                continue  # truncated by the crash — skip, don't block resume
            if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
                candidates[path.name] = epoch_of(ckpt)
    if not candidates:
        return None
    return max(candidates, key=lambda n: (candidates[n], _tie_rank(n)))
