"""Unit tests for run_demo.py's declarative stage table.

The full pipeline is exercised end-to-end by test_cli.py; these pin the
orchestrator's *wiring* — which argv each stage builds, when stages skip,
and that the clean manifest covers every model-side artifact a stage can
produce (the reference's cleaner at run_demo.py:45-94 has the same job).
"""

import argparse
import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_run_demo():
    spec = importlib.util.spec_from_file_location(
        "run_demo_module", REPO / "scripts" / "run_demo.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


rd = _load_run_demo()


def _args(**overrides):
    defaults = dict(skip_training=False, skip_datagen=False, no_clean=False,
                    max_samples=None, epochs=None, no_windows=False,
                    compression="gzip", f64_ground_truth=False,
                    rollout_select=False, finetune_rollout=False,
                    no_finetune_rollout=False,
                    resume=False, watchdog=None,
                    production=False, reference_protocol=False)
    defaults.update(overrides)
    return argparse.Namespace(**defaults)


def test_pipeline_stage_order():
    titles = [s.title for s in rd.PIPELINE]
    assert titles == ["Generating Training Data", "Training GNN Model",
                      "Selecting Checkpoint (rollout-aware)",
                      "Fine-tuning Rollout (K-step unrolled objective)",
                      "Evaluating AI vs HPC", "Exporting Results to CSV"]


def test_selection_stage_skipped_by_default():
    """Parity default: the reference evaluates the best-val checkpoint, so
    the selection stage must be opt-in."""
    stage = rd.PIPELINE[2]
    assert stage.skip(_args()) is not None
    assert stage.skip(_args(rollout_select=True)) is None


def test_finetune_stage_skipped_by_default():
    stage = rd.PIPELINE[3]
    assert stage.skip(_args()) is not None
    assert stage.skip(_args(finetune_rollout=True)) is None


def test_production_implies_selection_and_finetune():
    """--production = selection + fine-tune by default (round-5 decision:
    +9.0 min measured for 93.35 -> 33.54 posRMSE in one fresh session),
    with --no-finetune-rollout as the explicit opt-out. The bare/
    reference-protocol default keeps both OFF."""
    prod = rd.resolve_mode(_args(production=True))
    assert prod.rollout_select is True
    assert prod.finetune_rollout is True
    assert rd.PIPELINE[3].skip(prod) is None
    # Opt-out: selection stays, fine-tune skips, evaluate scores the
    # selected checkpoint.
    opt = rd.resolve_mode(_args(production=True, no_finetune_rollout=True))
    assert opt.rollout_select is True
    assert opt.finetune_rollout is False
    assert rd.PIPELINE[3].skip(opt) is not None
    cfg = rd.TrainingConfig()
    argv = rd._evaluate_argv(opt, cfg)
    assert argv[argv.index("-m") + 1] == "./models/selected_model.pt"
    # Outside --production the opt-out is a no-op and both stay off.
    bare = rd.resolve_mode(_args(no_finetune_rollout=True))
    assert bare.finetune_rollout is False and bare.rollout_select is False


def test_finetune_argv_uses_measured_curriculum():
    cfg = rd.TrainingConfig()
    argv = rd._finetune_argv(_args(finetune_rollout=True), cfg)
    assert argv[0] == "finetune_rollout.py"
    assert argv[argv.index("--curriculum") + 1] == "8:1500,16:900"
    assert argv[argv.index("-o") + 1] == "./models/best_rollout_model.pt"


def test_finetune_composes_with_selection():
    """With both flags the selection winner is the fine-tune base —
    otherwise the ~2-min selection sweep would be wasted wall-clock."""
    cfg = rd.TrainingConfig()
    argv = rd._finetune_argv(_args(finetune_rollout=True,
                                   rollout_select=True), cfg)
    assert argv[argv.index("-m") + 1] == "./models/selected_model.pt"


def test_parse_curriculum():
    spec = importlib.util.spec_from_file_location(
        "finetune_rollout_module", REPO / "scripts" / "finetune_rollout.py")
    ft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ft)
    assert ft.parse_curriculum("8:1500,16:900") == [(8, 1500), (16, 900)]
    assert ft.parse_curriculum("4:10") == [(4, 10)]
    import pytest
    with pytest.raises(ValueError):
        ft.parse_curriculum("8:0")
    with pytest.raises(ValueError):
        ft.parse_curriculum("8")


def test_selection_argv_uses_full_horizon_default():
    """run_demo must NOT cap the selection horizon: short-horizon rollout
    scores mispredict full-horizon ranking (measured — selection.py), and
    the CLI's default adapts to whatever data --skip-datagen reuses."""
    cfg = rd.TrainingConfig()
    argv = rd._select_argv(_args(rollout_select=True), cfg)
    assert argv[0] == "select_checkpoint.py"
    assert "--promote" in argv
    assert "--horizon" not in argv


def test_evaluate_argv_uses_selected_model_only_with_flag():
    cfg = rd.TrainingConfig()
    base = rd._evaluate_argv(_args(), cfg)
    assert "./models/selected_model.pt" not in base
    sel = rd._evaluate_argv(_args(rollout_select=True), cfg)
    assert sel[sel.index("-m") + 1] == "./models/selected_model.pt"
    f64 = rd._evaluate_argv(_args(f64_ground_truth=True), cfg)
    assert "--f64-ground-truth" in f64
    # fine-tune output takes precedence over the selected checkpoint
    both = rd._evaluate_argv(_args(rollout_select=True,
                                   finetune_rollout=True), cfg)
    assert both[both.index("-m") + 1] == "./models/best_rollout_model.pt"


def test_clean_manifest_covers_selection_artifacts():
    """A fresh run must not leave a stale selected_model.pt from a previous
    --rollout-select run (evaluate would silently score the old model)."""
    patterns = [p for p, _ in rd.CLEAN_MANIFEST]
    assert "models/selected_model.pt" in patterns
    assert "models/checkpoint_selection.json" in patterns
    assert "models/best_rollout_model.pt" in patterns


def test_resume_implies_no_clean_and_auto_checkpoint():
    """--resume must never delete the interrupted run's artifacts, and the
    training stage must pick up from the newest checkpoint."""
    args = rd.resolve_mode(_args(resume=True))
    assert args.no_clean is True
    cfg = rd.TrainingConfig()
    argv = rd._train_argv(args, cfg)
    assert argv[argv.index("--resume") + 1] == "auto"
    assert "--resume" not in rd._train_argv(rd.resolve_mode(_args()), cfg)


def test_production_arms_the_stall_watchdog():
    """An outage mid---production run must become a resumable failure, not
    an indefinite hang: EVERY device-driving stage gets the watchdog by
    default (an outage during evaluation or selection hangs a readback
    exactly like one during training)."""
    args = rd.resolve_mode(_args(production=True, finetune_rollout=True))
    assert args.watchdog == rd.PRODUCTION_WATCHDOG_S
    cfg = rd.TrainingConfig()
    for argv in (rd._datagen_argv(args, cfg), rd._train_argv(args, cfg),
                 rd._select_argv(args, cfg), rd._finetune_argv(args, cfg),
                 rd._evaluate_argv(args, cfg)):
        assert argv[argv.index("--watchdog") + 1] == str(args.watchdog), argv
    # ...and stays off outside production unless asked.
    bare = rd.resolve_mode(_args())
    assert bare.watchdog is None
    assert "--watchdog" not in rd._train_argv(bare, cfg)
    explicit = rd.resolve_mode(_args(watchdog=60.0))
    assert "--watchdog" in rd._datagen_argv(explicit, cfg)


def test_watchdog_zero_disables_everywhere():
    """--watchdog 0 is an explicit disable, not a silently-dropped value —
    including under --production (the only spelling to opt out of its
    default) — and negatives are rejected loudly."""
    import pytest

    cfg = rd.TrainingConfig()
    off = rd.resolve_mode(_args(watchdog=0.0))
    assert off.watchdog is None
    assert "--watchdog" not in rd._train_argv(off, cfg)
    prod_off = rd.resolve_mode(_args(production=True, watchdog=0.0))
    assert prod_off.watchdog is None
    assert "--watchdog" not in rd._datagen_argv(prod_off, cfg)
    with pytest.raises(SystemExit):
        rd.resolve_mode(_args(watchdog=-1.0))


def test_clean_manifest_data_entries_survive_skip_datagen():
    data_patterns = {p for p, is_data in rd.CLEAN_MANIFEST if is_data}
    assert "data/train_dataset.h5" in data_patterns
    assert "data/checkpoints" in data_patterns
    # model artifacts must NOT be marked as data (they are always cleaned)
    assert "models/best_model.pt" not in data_patterns
