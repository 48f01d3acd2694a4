#!/usr/bin/env python3
"""End-to-end pipeline driver: clean -> datagen -> train -> evaluate -> CSV.

Behavior parity with the reference's orchestrator (same stage order, same
flags ``--skip-training/--skip-datagen/--no-clean/--max-samples``, same
subprocess isolation and exit-on-failure, same cleaned artifacts — see
/root/reference/scripts/run_demo.py:26-94), implemented here as a declarative
stage table executed by a tiny runner.

Usage:
    python scripts/run_demo.py [--production | --reference-protocol]
                               [--skip-training] [--skip-datagen]
                               [--no-clean] [--resume] [--max-samples N]
                               [--epochs N] [--no-windows]
                               [--compression gzip|lzf|none]
                               [--watchdog SECONDS]
                               [--f64-ground-truth]
                               [--rollout-select] [--finetune-rollout]
                               [--no-finetune-rollout]

``--production`` is the measured-best recipe in ONE switch (RESULTS.md):
manifest datagen + lzf (124 s vs 657 s), a 60-epoch budget, the f64
published-number evaluation oracle, rollout-aware checkpoint selection,
and the two-rung rollout fine-tune. Selection is default because best-val
selection is a measured lottery (one fresh production run: 580.7 posRMSE
best-val vs 93.4 with full-horizon selection from the SAME checkpoints,
~2 min extra, zero extra training — RESULTS.md). Fine-tune is default
since round 5 on the same standard of evidence: one fresh end-to-end
``--production --finetune-rollout`` session measured +9.0 min (12% of the
73-min pipeline) for 93.35 -> 33.54 posRMSE — 2.8x, f64 protocol; opt out
with ``--no-finetune-rollout``. Both are deliberate deviations from the
reference protocol (best-val save, /root/reference/src/ai/train.py:519-528,
evaluated as-is by /root/reference/scripts/evaluate.py:50-63), documented
in PARITY.md; the bare reference protocol remains the no-flag default and
is nameable explicitly as ``--reference-protocol``.
"""

import argparse
import shutil
import subprocess
import sys
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, List, Optional

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from nbody_gnn_hpc_tpu.config import TrainingConfig

# ---------------------------------------------------------------------------
# Workspace cleaning: everything removable is listed here, as glob patterns
# relative to the repo root. ``fresh_data_only`` entries survive when the
# user asked to reuse existing datasets (--skip-datagen).
# ---------------------------------------------------------------------------

CLEAN_MANIFEST = (
    # (glob pattern, removed when --skip-datagen?)
    ("results", False),
    ("models/best_model.pt", False),
    ("models/final_model.pt", False),
    ("models/checkpoint_epoch_*.pt", False),
    ("models/selected_model.pt", False),
    ("models/checkpoint_selection.json", False),
    ("models/best_rollout_model.pt", False),
    ("models/training_history.json", False),
    ("models/config.json", False),
    ("data/checkpoints", True),
    ("data/train_dataset.h5", True),
    ("data/val_dataset.h5", True),
)

WORKSPACE_DIRS = ("data", "models", "results")


def clean_workspace(keep_data: bool) -> None:
    banner("Cleaning Previous Results")
    for pattern, is_data in CLEAN_MANIFEST:
        if is_data and keep_data:
            continue
        for target in sorted(REPO.glob(pattern)):
            if target.is_dir():
                shutil.rmtree(target)
            else:
                target.unlink()
            print(f"  Deleted: {target.relative_to(REPO)}")
    for name in WORKSPACE_DIRS:
        (REPO / name).mkdir(exist_ok=True)
    print("  Clean complete!\n")


# ---------------------------------------------------------------------------
# Stage table
# ---------------------------------------------------------------------------

@dataclass
class Stage:
    title: str
    argv: Callable[[argparse.Namespace, TrainingConfig], List[str]]
    # Returns a message if the stage should be skipped, else None.
    skip: Callable[[argparse.Namespace], Optional[str]] = lambda a: None
    # Raises SystemExit with a message if prerequisites are missing.
    precheck: Callable[[argparse.Namespace], None] = lambda a: None


def _datagen_argv(args, cfg):
    argv = ["generate_data.py",
            "--particles", str(cfg.particles),
            "--simulations", str(cfg.simulations),
            "--steps", str(cfg.steps),
            "--sequence-length", str(cfg.sequence_length),
            "--workers", str(cfg.workers),
            "--compression", args.compression]
    if args.no_windows:
        argv += ["--no-windows"]
    return argv + _watchdog_argv(args)


def _watchdog_argv(args):
    # resolve_mode normalized 0 -> None, so a set value is always positive.
    return (["--watchdog", str(args.watchdog)]
            if args.watchdog is not None else [])


def _train_argv(args, cfg):
    epochs = args.epochs if args.epochs is not None else cfg.epochs
    argv = ["train_model.py", "--physics-loss", "--epochs", str(epochs)]
    if args.max_samples:
        argv += ["--max-samples", str(args.max_samples)]
    if args.resume:
        argv += ["--resume", "auto"]
    return argv + _watchdog_argv(args)


def _select_argv(args, cfg):
    # No --horizon: the CLI defaults to the full horizon the saved val
    # trajectories support (short-horizon scores mispredict full-horizon
    # ranking — measured, predict/selection.py docstring), and adapts to
    # whatever data --skip-datagen reuses.
    return ["select_checkpoint.py", "--promote"] + _watchdog_argv(args)


def _finetune_argv(args, cfg):
    # The measured production recipe (RESULTS.md): two-rung curriculum from
    # the near-identity epoch-10 checkpoint. With --rollout-select the
    # selection winner is the base instead (so both stages compose); the
    # fallback is the script default (best_model.pt) on short runs that
    # never saved epoch 10.
    argv = ["finetune_rollout.py", "--curriculum", "8:1500,16:900",
            "-o", "./models/best_rollout_model.pt"]
    if args.rollout_select:
        argv += ["-m", "./models/selected_model.pt"]
    elif (REPO / "models/checkpoint_epoch_10.pt").exists():
        argv += ["-m", "./models/checkpoint_epoch_10.pt"]
    return argv + _watchdog_argv(args)


def _evaluate_argv(args, cfg):
    argv = ["evaluate.py",
            "--n-test-sims", str(cfg.n_test_sims),
            "--particles", str(cfg.particles),
            "--steps", str(cfg.steps)]
    if args.finetune_rollout:
        argv += ["-m", "./models/best_rollout_model.pt"]
    elif args.rollout_select:
        argv += ["-m", "./models/selected_model.pt"]
    if args.f64_ground_truth:
        argv += ["--f64-ground-truth"]
    return argv + _watchdog_argv(args)


def _require_dataset(args):
    # Windowed HDF5 datasets OR a --no-windows manifest (the --production
    # default) both satisfy the training stage (train_model.py resolves the
    # manifest itself).
    if args.skip_datagen and not any(
            (REPO / p).exists() for p in ("data/train_dataset.h5",
                                          "data/dataset_manifest.json")):
        sys.exit("Error: --skip-datagen specified but no training data found!")


PIPELINE = (
    Stage("Generating Training Data", _datagen_argv,
          skip=lambda a: "using existing data" if a.skip_datagen else None,
          precheck=_require_dataset),
    Stage("Training GNN Model", _train_argv,
          skip=lambda a: "using existing model" if a.skip_training else None),
    Stage("Selecting Checkpoint (rollout-aware)", _select_argv,
          skip=lambda a: None if a.rollout_select else "off by default "
          "(parity: the reference evaluates best-val; --rollout-select)"),
    Stage("Fine-tuning Rollout (K-step unrolled objective)", _finetune_argv,
          skip=lambda a: None if a.finetune_rollout else "off by default "
          "(parity: the reference has no rollout objective; "
          "--finetune-rollout)"),
    Stage("Evaluating AI vs HPC", _evaluate_argv),
    Stage("Exporting Results to CSV", lambda a, c: ["export_csv.py"]),
)


# ---------------------------------------------------------------------------
# Runner
# ---------------------------------------------------------------------------

def banner(text: str) -> None:
    rule = "=" * 60
    print(f"\n{rule}\nSTEP: {text}\n{rule}")


def execute(stage: Stage, args: argparse.Namespace,
            cfg: TrainingConfig) -> None:
    stage.precheck(args)
    why_skip = stage.skip(args)
    if why_skip is not None:
        print(f"\n[Skipping {stage.title.lower()} - {why_skip}]")
        return
    argv = stage.argv(args, cfg)
    argv[0] = str(REPO / "scripts" / argv[0])
    banner(stage.title)
    print(f"Running: {' '.join([sys.executable] + argv)}\n")
    t0 = time.time()
    proc = subprocess.run([sys.executable] + argv, cwd=REPO)
    dt = time.time() - t0
    if proc.returncode != 0:
        from nbody_gnn_hpc_tpu.utils.watchdog import STALL_EXIT_CODE

        print(f"\nError: {stage.title} failed with code {proc.returncode}")
        if proc.returncode == STALL_EXIT_CODE:
            print("The stage's stall watchdog fired (device backend "
                  "outage?). Once the backend recovers, rerun with "
                  "--resume to continue from the last checkpoint.")
        sys.exit(1)
    print(f"\nCompleted in {dt:.1f}s ({dt / 60:.1f} min)")


def print_header(cfg: TrainingConfig) -> None:
    rule = "=" * 60
    rows = {
        "Particles": cfg.particles, "Simulations": cfg.simulations,
        "Steps": cfg.steps, "Hidden Dim": cfg.hidden_dim,
        "Layers": cfg.n_layers, "Dropout": cfg.dropout,
        "k-Neighbors": cfg.k_neighbors, "Batch Size": cfg.batch_size,
        "Noise Std": cfg.noise_std, "Weight Decay": cfg.weight_decay,
        "Device": cfg.get_device(),
    }
    print(f"\n{rule}\nAI-HPC N-BODY GNN PIPELINE (TPU)\n{rule}")
    for label, value in rows.items():
        print(f"  {label + ':':<14}{value}")
    print(rule)


# Training-epoch budget of the measured production recipe (RESULTS.md:
# 60-epoch run, 49.4 s median epoch; best-val converged by epoch 42).
PRODUCTION_EPOCHS = 60
# Stall-watchdog default under --production (see resolve_mode).
PRODUCTION_WATCHDOG_S = 1800.0


def resolve_mode(args: argparse.Namespace) -> argparse.Namespace:
    """Expand --production / --reference-protocol into concrete flags.

    Mutates and returns ``args``. Kept separate from main() so the wiring
    is unit-testable (tests/test_cli.py pins that --production implies
    rollout selection — the measured fix for the best-val lottery).
    """
    if args.production and args.reference_protocol:
        raise SystemExit(
            "Error: --production and --reference-protocol are mutually "
            "exclusive")
    if args.watchdog is not None and args.watchdog < 0:
        raise SystemExit(
            "Error: --watchdog must be positive (or 0 to disable)")
    if args.production:
        args.rollout_select = True
        if not args.no_finetune_rollout:
            # Promoted to a production default in round 5 on measurement:
            # one fresh end-to-end session priced the two-rung fine-tune at
            # +9.0 min (12% of the 73-min pipeline) for 93.35 -> 33.54
            # posRMSE (2.8x, f64 protocol) — RESULTS.md. Opt out with
            # --no-finetune-rollout to evaluate the selected checkpoint.
            args.finetune_rollout = True
        args.no_windows = True
        args.f64_ground_truth = True
        if args.compression is None:
            args.compression = "lzf"
        if args.epochs is None:
            args.epochs = PRODUCTION_EPOCHS
        if args.watchdog is None:
            # Generous enough for a cold remote Mosaic compile (observed
            # 5-15 min) yet bounded: a backend outage mid-pipeline becomes
            # a resumable failure instead of an indefinite hang.
            args.watchdog = PRODUCTION_WATCHDOG_S
    if args.resume:
        # Resuming an interrupted run must not delete its artifacts:
        # datagen resumes at the file level, training from the newest
        # checkpoint (train_model.py --resume auto).
        args.no_clean = True
    if args.compression is None:
        args.compression = "gzip"  # reference-parity default
    if args.watchdog == 0:
        # Explicit disable — uniform across every entry point (the
        # subscripts treat 0 the same way via maybe_watchdog); note 0 also
        # suppressed the --production default above (0 is not None).
        args.watchdog = None
    return args


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Run full AI-HPC demo pipeline")
    parser.add_argument("--production", action="store_true",
                        help="Measured-best recipe in one switch: manifest "
                             "datagen + lzf, 60-epoch budget, f64 oracle, "
                             "rollout-aware checkpoint selection (best-val "
                             "selection is a measured 6x lottery) AND the "
                             "two-rung rollout fine-tune (+9 min measured "
                             "for 2.8x posRMSE — RESULTS.md). Opt out of "
                             "the fine-tune with --no-finetune-rollout")
    parser.add_argument("--no-finetune-rollout", action="store_true",
                        help="Under --production: skip the rollout "
                             "fine-tune stage and evaluate the selected "
                             "checkpoint instead (93.35 vs 33.54 posRMSE "
                             "measured; saves ~9 min). No-op otherwise")
    parser.add_argument("--reference-protocol", action="store_true",
                        help="Explicitly name the bare reference protocol "
                             "(the no-flag default): best-val checkpoint "
                             "selection, windowed gzip datagen, f32 "
                             "evaluation oracle")
    parser.add_argument("--skip-training", action="store_true",
                        help="Skip training (use existing model)")
    parser.add_argument("--skip-datagen", action="store_true",
                        help="Skip data generation (reuse existing data)")
    parser.add_argument("--no-clean", action="store_true",
                        help="Do not delete previous results")
    parser.add_argument("--resume", action="store_true",
                        help="Continue an interrupted run: keep existing "
                             "artifacts (implies --no-clean), resume datagen "
                             "at the file level and training from the newest "
                             "checkpoint to the same --epochs total. Pair "
                             "with the same mode flags as the original run")
    parser.add_argument("--watchdog", type=float, default=None,
                        metavar="SECONDS",
                        help="Stall watchdog for every device-driving stage "
                             "(datagen, training, selection, fine-tune, "
                             "evaluation): a stage exits with a distinctive "
                             "code if the device makes no progress for this "
                             "many seconds (default: off; 1800 under "
                             "--production; 0 disables explicitly). Rerun "
                             "with --resume after an outage")
    parser.add_argument("--max-samples", type=int, default=None,
                        help="Limit training samples (default: use all)")
    # Additive (beyond reference parity) production-protocol knobs:
    parser.add_argument("--epochs", type=int, default=None,
                        help="Override training epochs (default: config)")
    parser.add_argument("--no-windows", action="store_true",
                        help="Datagen writes a manifest instead of windowed "
                             "HDF5 (training reads trajectories directly)")
    parser.add_argument("--compression", choices=("gzip", "lzf", "none"),
                        default=None,
                        help="HDF5 compression for datagen artifacts "
                             "(default: gzip; lzf under --production)")
    parser.add_argument("--f64-ground-truth", action="store_true",
                        help="Evaluate against the float64 reference-protocol "
                             "oracle (published-number protocol)")
    parser.add_argument("--rollout-select", action="store_true",
                        help="After training, pick the served checkpoint by "
                             "full-horizon rollout RMSE on val trajectories "
                             "(scripts/select_checkpoint.py) instead of "
                             "best-val loss, and evaluate that model")
    parser.add_argument("--finetune-rollout", action="store_true",
                        help="After training, fine-tune with the measured "
                             "two-rung K-step unrolled curriculum "
                             "(scripts/finetune_rollout.py; 9 min measured "
                             "in a fresh warm-cache session, ~25 min cold) "
                             "and evaluate best_rollout_model.pt — takes "
                             "precedence over --rollout-select at "
                             "evaluation. ON by default under --production")
    args = resolve_mode(parser.parse_args())

    cfg = TrainingConfig()
    print_header(cfg)
    t0 = time.time()

    if not args.no_clean:
        clean_workspace(keep_data=args.skip_datagen)

    for stage in PIPELINE:
        execute(stage, args, cfg)

    dt = time.time() - t0
    rule = "=" * 60
    print(f"\n{rule}\nPIPELINE COMPLETE!\n{rule}")
    print(f"\nTotal time: {dt:.1f}s ({dt / 60:.1f} min)")
    print("\nOutputs:")
    print("  - data/       (training & validation datasets)")
    print("  - models/     (trained model & training history)")
    print("  - results/    (evaluation metrics & plots)")
    print(rule)


if __name__ == "__main__":
    main()
