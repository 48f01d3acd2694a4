#!/usr/bin/env python3
"""Train the GNN model for N-body prediction (TPU-native).

CLI parity: reference ``scripts/train_model.py`` — same flags, config
override pattern, ``models/config.json`` persisted for evaluation, val set
using the train set's normalization stats.

Usage:
    python scripts/train_model.py --epochs 200
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from nbody_gnn_hpc_tpu.config import TrainingConfig
from nbody_gnn_hpc_tpu.models import count_parameters
from nbody_gnn_hpc_tpu.train import GNNDataset, Trainer


# Flags that override a TrainingConfig field of the same name when given.
# Each row: (long flag, short flag or None, type). The flag set is the parity
# surface with the reference CLI; the override loop below applies them.
CONFIG_FLAGS = (
    ("--epochs", "-e", int),
    ("--batch-size", "-b", int),
    ("--learning-rate", "-lr", float),
    ("--hidden-dim", None, int),
    ("--n-layers", None, int),
    ("--early-stopping", None, int),
    ("--workers", "-w", int),
    ("--dropout", None, float),
    ("--noise-std", None, float),
    ("--weight-decay", None, float),
    ("--k-neighbors", None, int),
)


def remaining_epochs_auto(budget: int, current_epoch: int,
                          model_dir: Path) -> int:
    """Epochs left for ``--resume auto`` crash recovery.

    A run that legitimately finished EARLY (patience fired at epoch <
    budget) stamps ``early_stopped: true`` into training_history.json
    (Trainer._save_history); without consulting it, a rerun after an
    outage in a LATER pipeline stage would burn up to
    ``budget - current_epoch`` TPU epochs retraining a finished model
    (advisor r4). A budget-completed run (``completed`` without
    ``early_stopped``) stays extendable to a larger ``--epochs``."""
    remaining = max(0, budget - current_epoch)
    if remaining == 0:
        return 0
    hist_path = Path(model_dir) / "training_history.json"
    try:
        with open(hist_path) as f:
            early_stopped = bool(json.load(f).get("early_stopped", False))
    except (OSError, ValueError):
        early_stopped = False
    if early_stopped:
        print(f"  --resume auto: previous run finished by early stopping "
              f"at epoch {current_epoch} — nothing to retrain")
        return 0
    return remaining


def build_parser():
    parser = argparse.ArgumentParser(description="Train N-Body GNN Model")
    for flag, short, typ in CONFIG_FLAGS:
        names = (flag, short) if short else (flag,)
        parser.add_argument(*names, type=typ, default=None)
    parser.add_argument("--data-dir", "-d", type=str, default="./data")
    parser.add_argument("--model-dir", "-o", type=str, default="./models")
    parser.add_argument("--physics-loss", action="store_true", default=True)
    parser.add_argument("--max-samples", type=int, default=None,
                        help="Limit training samples (default: use all)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="Shard each batch over all attached devices "
                             "(1-D data mesh; params replicated)")
    parser.add_argument("--no-bf16", action="store_true",
                        help="Train matmuls in float32 instead of bfloat16")
    parser.add_argument("--remat", action="store_true",
                        help="Rematerialize interaction layers in backward "
                             "(lower memory, ~35%% slower)")
    parser.add_argument("--edge-impl", choices=("auto", "xla", "fused", "fused_full"),
                        default="auto",
                        help="GNN edge-stream implementation: the fused "
                             "Pallas kernel (TPU), the XLA formulation, or "
                             "auto (fused on TPU when the edge layout "
                             "allows)")
    parser.add_argument("--ckpt-backend", choices=("pickle", "orbax"),
                        default="pickle",
                        help="Checkpoint backend: pickle .pt files "
                             "(reference parity, synchronous) or orbax "
                             "(async background writes)")
    parser.add_argument("--resume", type=str, default=None, metavar="CKPT",
                        help="Resume from a checkpoint file in --model-dir "
                             "(e.g. final_model.pt), training --epochs MORE "
                             "epochs. The special value 'auto' is crash "
                             "recovery: pick the checkpoint with the "
                             "highest recorded epoch and train only the "
                             "REMAINING epochs up to --epochs total (fresh "
                             "start if none found). The reference's "
                             "Trainer.load_model existed but no CLI wired "
                             "it up (SURVEY §5); this does.")
    parser.add_argument("--watchdog", type=float, default=None,
                        metavar="SECONDS",
                        help="Exit with a distinctive code if no epoch "
                             "chunk completes for this many seconds "
                             "(backend-outage stall detection; rerun with "
                             "--resume auto to continue). Must cover the "
                             "first chunk's compile time. 0 disables.")
    return parser


def main():
    args = build_parser().parse_args()

    config = TrainingConfig()
    for flag, _, _ in CONFIG_FLAGS:
        field = flag.lstrip("-").replace("-", "_")
        override = getattr(args, field)
        if override is not None:
            setattr(config, field, override)

    device = config.get_device()
    data_dir = Path(args.data_dir)
    model_dir = Path(args.model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)

    train_path = data_dir / "train_dataset.h5"
    val_path = data_dir / "val_dataset.h5"
    manifest_path = data_dir / "dataset_manifest.json"
    use_manifest = not train_path.exists() and manifest_path.exists()
    if not train_path.exists() and not use_manifest:
        print(f"Error: Training data not found at {train_path} "
              f"(and no {manifest_path.name})")
        print("Run generate_data.py first!")
        sys.exit(1)

    print("=" * 60)
    print("N-BODY GNN TRAINING (TPU)")
    print("=" * 60)
    for label, v in (("Device", device), ("Epochs", config.epochs),
                     ("Batch Size", config.batch_size),
                     ("Learning Rate", config.learning_rate),
                     ("Hidden Dim", config.hidden_dim),
                     ("Layers", config.n_layers),
                     ("k-Neighbors", config.k_neighbors),
                     ("Dropout", config.dropout),
                     ("Weight Decay", config.weight_decay),
                     ("Noise Std", config.noise_std),
                     ("Physics Loss", args.physics_loss)):
        print(f"  {label + ':':<16} {v}")
    print("=" * 60)

    print("\nLoading datasets...")
    if use_manifest:
        # --no-windows datagen: build (state, target) pairs directly from
        # the trajectory files (window protocol recorded in the manifest).
        from nbody_gnn_hpc_tpu.train import datasets_from_manifest
        print(f"  (trajectory-direct path via {manifest_path.name})")
        train_dataset, val_dataset = datasets_from_manifest(
            manifest_path, k_neighbors=config.k_neighbors)
    else:
        train_dataset = GNNDataset(str(train_path),
                                   sequence_length=config.sequence_length,
                                   k_neighbors=config.k_neighbors)
        val_dataset = GNNDataset(
            str(val_path), sequence_length=config.sequence_length,
            k_neighbors=config.k_neighbors,
            external_norm_stats=train_dataset.get_normalization_stats()
        ) if val_path.exists() else None

    if args.max_samples and len(train_dataset) > args.max_samples:
        print(f"Subsampling: {len(train_dataset)} -> {args.max_samples}")
        train_dataset.last_states = train_dataset.last_states[:args.max_samples]
        train_dataset.targets = train_dataset.targets[:args.max_samples]
        train_dataset.n_samples = args.max_samples

    import jax

    model_config = {
        "node_input_dim": 7,
        "hidden_dim": config.hidden_dim,
        "n_layers": config.n_layers,
        "output_dim": 6,
        "dropout": config.dropout,
        # TPU training runs bf16 matmuls (params stay f32); inference
        # rebuilds the model at f32 from the same checkpoint.  Non-TPU
        # backends stay f32: bf16 buys nothing there, and jax 0.9's CPU
        # thunk runtime rejects BF16xBF16->F32 dots outright.
        "dtype": "float32" if (args.no_bf16 or
                               jax.default_backend() != "tpu")
                 else "bfloat16",
        "remat": args.remat,
        "edge_impl": args.edge_impl,
    }

    print(f"\n  Train samples: {len(train_dataset)}")
    if val_dataset:
        print(f"  Val samples:   {len(val_dataset)}")

    from nbody_gnn_hpc_tpu.models import model_from_config

    model = model_from_config(model_config)

    # Persist config for evaluate.py (reference train_model.py:125-131).
    saved_config = {
        "model_type": "gnn",
        "model_config": model_config,
        "training_config": config.to_dict(),
    }
    with open(model_dir / "config.json", "w") as f:
        json.dump(saved_config, f, indent=2, default=str)

    mesh = None
    if args.data_parallel:
        import jax

        from nbody_gnn_hpc_tpu.parallel import make_mesh

        mesh = make_mesh()
        print(f"  Data parallel:  {mesh.devices.size} devices")
        del jax

    trainer = Trainer(
        model=model,
        train_dataset=train_dataset,
        val_dataset=val_dataset,
        mesh=mesh,
        model_dir=str(model_dir),
        learning_rate=config.learning_rate,
        batch_size=config.batch_size,
        use_physics_loss=args.physics_loss,
        num_workers=config.workers,
        weight_decay=config.weight_decay,
        noise_std=config.noise_std,
        n_epochs=config.epochs,
        ckpt_backend=args.ckpt_backend,
    )
    print(f"  Parameters:    {count_parameters(trainer.params):,}")

    n_epochs = config.epochs
    resume_name = args.resume
    if resume_name == "auto":
        from nbody_gnn_hpc_tpu.io.model_io import latest_checkpoint

        resume_name = latest_checkpoint(model_dir, backend=args.ckpt_backend)
        if resume_name is None:
            print("  --resume auto: no checkpoint found; starting fresh")
    if resume_name:
        trainer.load_model(resume_name)
        print(f"  Resumed from:  {model_dir / resume_name} "
              f"(epoch {trainer.current_epoch}, "
              f"best val {trainer.best_val_loss:.6f})")
        if args.resume == "auto":
            # Crash recovery continues to the SAME total budget; explicit
            # --resume CKPT keeps its train-N-more semantics for fine-tuning.
            n_epochs = remaining_epochs_auto(config.epochs,
                                             trainer.current_epoch, model_dir)
            print(f"  Remaining:     {n_epochs} of {config.epochs} epochs")

    print("\nStarting training...")
    history = trainer.train(n_epochs=n_epochs,
                            early_stopping_patience=config.early_stopping,
                            save_every=10,
                            watchdog_s=args.watchdog)

    print("\n" + "=" * 60)
    print("TRAINING COMPLETE")
    print("=" * 60)
    print(f"  Best Val Loss:    {trainer.best_val_loss:.6f}")
    if history["train_loss"]:  # empty when --resume auto had 0 remaining
        print(f"  Final Train Loss: {history['train_loss'][-1]:.6f}")
    print(f"  Model saved to:   {model_dir}")
    print("=" * 60)

    try:
        from nbody_gnn_hpc_tpu.utils import Visualizer

        viz = Visualizer(str(model_dir / "plots"))
        viz.plot_training_history(history, save_name="training_history.png",
                                  show=False)
        print(f"  Training plot:    "
              f"{model_dir / 'plots' / 'training_history.png'}")
    except Exception as e:  # plotting is best-effort (reference :165-171)
        print(f"  (Could not create plot: {e})")


if __name__ == "__main__":
    main()
