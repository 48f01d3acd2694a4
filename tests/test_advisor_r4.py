"""Regressions for round-4 advisor findings (resume-auto completed marker,
host-oracle watchdog beats)."""

import importlib.util
import json
import sys
from pathlib import Path

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"


def _load_train_model():
    spec = importlib.util.spec_from_file_location(
        "train_model_mod", SCRIPTS / "train_model.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["train_model_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_remaining_epochs_auto_early_stop_marker(tmp_path):
    """--resume auto must treat a legitimately early-stopped run
    (early_stopped marker in training_history.json) as 0 remaining epochs;
    a crashed run (no marker / corrupt file) keeps its same-total-budget
    remainder, and a budget-completed run stays extendable to a larger
    --epochs (the documented fine-tune-by-resume pattern)."""
    mod = _load_train_model()
    hist = tmp_path / "training_history.json"

    # Crashed run: no history file yet -> continue to the same budget.
    assert mod.remaining_epochs_auto(200, 62, tmp_path) == 138
    # Early-stopped run: marker -> nothing left to train.
    hist.write_text(json.dumps({"train_loss": [1.0], "completed": True,
                                "early_stopped": True}))
    assert mod.remaining_epochs_auto(200, 62, tmp_path) == 0
    # Budget-completed run resumed with a LARGER budget: extendable.
    hist.write_text(json.dumps({"train_loss": [1.0], "completed": True,
                                "early_stopped": False}))
    assert mod.remaining_epochs_auto(200, 62, tmp_path) == 138
    # Absent marker (pre-marker history) -> crash semantics.
    hist.write_text(json.dumps({"train_loss": [1.0]}))
    assert mod.remaining_epochs_auto(200, 62, tmp_path) == 138
    # Corrupt history must not crash recovery.
    hist.write_text("{not json")
    assert mod.remaining_epochs_auto(200, 62, tmp_path) == 138
    # At/over budget: 0 regardless of marker.
    hist.write_text(json.dumps({"completed": True, "early_stopped": True}))
    assert mod.remaining_epochs_auto(200, 200, tmp_path) == 0
    assert mod.remaining_epochs_auto(200, 250, tmp_path) == 0


def test_protocol_ground_truth_progress_beats():
    """The f64 host oracle must fire progress_cb once per completed sim —
    the hook evaluate.py uses to beat its stall watchdog through this
    host-CPU-only (beat-less on device) stage."""
    from nbody_gnn_hpc_tpu.sim import protocol_ground_truth

    beats = []
    pos, vel, masses = protocol_ground_truth(
        n_test_sims=3, n_particles=4, n_steps=2, dt=0.001,
        progress_cb=lambda: beats.append(1))
    assert len(beats) == 3
    assert pos.shape == (3, 3, 4, 3)
