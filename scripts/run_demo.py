#!/usr/bin/env python3
"""Full demo pipeline: Clean -> Generate Data -> Train GNN -> Evaluate -> CSV.

CLI parity: reference ``scripts/run_demo.py`` — same stages, flags
(--skip-training / --skip-datagen / --no-clean / --max-samples), subprocess
isolation with exit-on-failure, and the same cleaned paths.

Usage:
    python scripts/run_demo.py
    python scripts/run_demo.py --skip-training
    python scripts/run_demo.py --skip-datagen
"""

import argparse
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from nbody_gnn_hpc_tpu.config import TrainingConfig


def run_command(cmd, description):
    print(f"\n{'=' * 60}")
    print(f"STEP: {description}")
    print(f"{'=' * 60}")
    print(f"Running: {' '.join(cmd)}\n")
    start = time.time()
    result = subprocess.run(cmd, cwd=Path(__file__).parent.parent)
    elapsed = time.time() - start
    if result.returncode != 0:
        print(f"\nError: {description} failed with code {result.returncode}")
        sys.exit(1)
    print(f"\nCompleted in {elapsed:.1f}s ({elapsed / 60:.1f} min)")
    return result


def clean_previous_results(project_root: Path, keep_data: bool = False):
    """Delete previous data/models/results (parity: run_demo.py:45-94)."""
    print(f"\n{'=' * 60}")
    print("STEP: Cleaning Previous Results")
    print(f"{'=' * 60}")

    dirs_to_clean = [("results", "Results")]
    if not keep_data:
        dirs_to_clean.insert(0, ("data/checkpoints", "Checkpoints"))

    files_to_clean = [
        "models/best_model.pt",
        "models/final_model.pt",
        "models/training_history.json",
        "models/config.json",
    ]
    if not keep_data:
        files_to_clean += ["data/train_dataset.h5", "data/val_dataset.h5"]

    models_dir = project_root / "models"
    if models_dir.exists():
        for f in models_dir.glob("checkpoint_epoch_*.pt"):
            files_to_clean.append(str(f.relative_to(project_root)))

    for dir_path, label in dirs_to_clean:
        full = project_root / dir_path
        if full.exists():
            shutil.rmtree(full)
            print(f"  Deleted {label}: {dir_path}")

    for file_path in files_to_clean:
        full = project_root / file_path
        if full.exists():
            full.unlink()
            print(f"  Deleted: {file_path}")

    for d in ("data", "models", "results"):
        (project_root / d).mkdir(exist_ok=True)
    print("  Clean complete!\n")


def main():
    parser = argparse.ArgumentParser(
        description="Run full AI-HPC demo pipeline")
    parser.add_argument("--skip-training", action="store_true",
                        help="Skip training (use existing model)")
    parser.add_argument("--skip-datagen", action="store_true",
                        help="Skip data generation (reuse existing data)")
    parser.add_argument("--no-clean", action="store_true",
                        help="Do not delete previous results")
    parser.add_argument("--max-samples", type=int, default=None,
                        help="Limit training samples (default: use all)")
    args = parser.parse_args()

    config = TrainingConfig()
    project_root = Path(__file__).parent.parent
    scripts_dir = Path(__file__).parent
    python = sys.executable

    print("\n" + "=" * 60)
    print("AI-HPC N-BODY GNN PIPELINE (TPU)")
    print("=" * 60)
    for label, v in (("Particles", config.particles),
                     ("Simulations", config.simulations),
                     ("Steps", config.steps),
                     ("Hidden Dim", config.hidden_dim),
                     ("Layers", config.n_layers),
                     ("Dropout", config.dropout),
                     ("k-Neighbors", config.k_neighbors),
                     ("Batch Size", config.batch_size),
                     ("Noise Std", config.noise_std),
                     ("Weight Decay", config.weight_decay),
                     ("Device", config.get_device())):
        print(f"  {label + ':':<14}{v}")
    print("=" * 60)

    total_start = time.time()

    if not args.no_clean:
        clean_previous_results(project_root, keep_data=args.skip_datagen)

    if args.skip_datagen:
        if not (project_root / "data" / "train_dataset.h5").exists():
            print("Error: --skip-datagen specified but no training data "
                  "found!")
            sys.exit(1)
        print("\n[Skipping data generation - using existing data]")
    else:
        run_command([
            python, str(scripts_dir / "generate_data.py"),
            "--particles", str(config.particles),
            "--simulations", str(config.simulations),
            "--steps", str(config.steps),
            "--sequence-length", str(config.sequence_length),
            "--workers", str(config.workers),
        ], "Generating Training Data")

    if not args.skip_training:
        cmd = [python, str(scripts_dir / "train_model.py"), "--physics-loss",
               "--epochs", str(config.epochs)]
        if args.max_samples:
            cmd += ["--max-samples", str(args.max_samples)]
        run_command(cmd, "Training GNN Model")
    else:
        print("\n[Skipping training - using existing model]")

    run_command([
        python, str(scripts_dir / "evaluate.py"),
        "--n-test-sims", str(config.n_test_sims),
        "--particles", str(config.particles),
        "--steps", str(config.steps),
    ], "Evaluating AI vs HPC")

    export_script = scripts_dir / "export_csv.py"
    if export_script.exists():
        run_command([python, str(export_script)], "Exporting Results to CSV")

    total_elapsed = time.time() - total_start
    print("\n" + "=" * 60)
    print("PIPELINE COMPLETE!")
    print("=" * 60)
    print(f"\nTotal time: {total_elapsed:.1f}s ({total_elapsed / 60:.1f} min)")
    print("\nOutputs:")
    print("  - data/       (training & validation datasets)")
    print("  - models/     (trained model & training history)")
    print("  - results/    (evaluation metrics & plots)")
    print("=" * 60)


if __name__ == "__main__":
    main()
