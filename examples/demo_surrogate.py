#!/usr/bin/env python3
"""Quickstart: train a tiny GNN surrogate end-to-end in one script.

Generates a few simulations on-device, trains a small model for a handful
of epochs, and rolls it out against fresh ground truth — the whole
reference pipeline (SURVEY §3.1) at toy scale, in-process.

Usage:
    python examples/demo_surrogate.py [--sims 6] [--particles 24] [--epochs 5]
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from nbody_gnn_hpc_tpu.io import CheckpointManager, create_training_dataset
from nbody_gnn_hpc_tpu.models import NBodyGNN
from nbody_gnn_hpc_tpu.parallel import simulate_ensemble, trajectory_slice
from nbody_gnn_hpc_tpu.predict import Predictor, compare_with_hpc
from nbody_gnn_hpc_tpu.sim import shared_masses
from nbody_gnn_hpc_tpu.train import GNNDataset, Trainer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sims", type=int, default=6)
    parser.add_argument("--particles", type=int, default=24)
    parser.add_argument("--steps", type=int, default=80)
    parser.add_argument("--epochs", type=int, default=5)
    args = parser.parse_args()

    workdir = Path(tempfile.mkdtemp(prefix="nbody_demo_"))
    print(f"workdir: {workdir}")

    # 1. Data generation: one sharded device program for all sims.
    masses = shared_masses(args.particles, seed=42)
    traj = simulate_ensemble(
        seeds=[42 + i for i in range(args.sims)],
        n_particles=args.particles, n_steps=args.steps, box_size=10.0,
        dt=0.001, shared_masses=masses)
    manager = CheckpointManager(str(workdir / "checkpoints"))
    trajs = []
    for i in range(args.sims):
        manager.save_trajectory(trajectory_slice(traj, i), f"sim_{i:04d}")
        trajs.append(manager.load_trajectory(f"sim_{i:04d}"))

    n_train = max(1, int(0.8 * args.sims))
    create_training_dataset(trajs[:n_train], str(workdir / "train.h5"),
                            sequence_length=5, masses=masses)
    create_training_dataset(trajs[n_train:], str(workdir / "val.h5"),
                            sequence_length=5, masses=masses)

    # 2. Training.
    ds_train = GNNDataset(str(workdir / "train.h5"), k_neighbors=6)
    ds_val = GNNDataset(str(workdir / "val.h5"), k_neighbors=6,
                        external_norm_stats=ds_train.get_normalization_stats())
    model = NBodyGNN(node_input_dim=7, hidden_dim=32, n_layers=2,
                     output_dim=6, dropout=0.1)
    trainer = Trainer(model, ds_train, ds_val,
                      model_dir=str(workdir / "models"), batch_size=16)
    trainer.train(n_epochs=args.epochs, verbose=True)

    # 3. Rollout vs fresh ground truth.
    predictor = Predictor(model, str(workdir / "models" / "best_model.pt"),
                          k_neighbors=6)
    test = simulate_ensemble([9999], args.particles, args.steps,
                             box_size=10.0, dt=0.001, shared_masses=masses)
    result = compare_with_hpc(
        predictor,
        {"positions": np.asarray(test.positions[0], np.float64),
         "velocities": np.asarray(test.velocities[0], np.float64),
         "masses": masses},
        start_step=5, n_prediction_steps=args.steps - 6)
    print(f"\nRollout vs HPC over {args.steps - 6} steps:")
    print(f"  mean position RMSE: {result['mean_position_rmse']:.4e}")
    print(f"  final position RMSE: {result['final_position_rmse']:.4e}")


if __name__ == "__main__":
    main()
