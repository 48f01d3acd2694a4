#!/usr/bin/env python3
"""Evaluate the GNN model against HPC ground truth (TPU-native).

CLI + protocol parity: reference ``scripts/evaluate.py`` — shared masses
(seed 42), test sims seeded 9999+i at dt=0.001, rollout starting from step
seq_len=5 for steps-5-1 steps (the published protocol, SURVEY §7), metrics
aggregated mean±std into ``results/evaluation_results.json``, plots for the
first test sim.

TPU redesign: ground truths run as ONE sharded ensemble program; each
rollout is a single scan-compiled device program (no per-step host
round-trips, cf. reference predict.py:142-147).
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from nbody_gnn_hpc_tpu.models import NBodyGNN
from nbody_gnn_hpc_tpu.parallel import simulate_ensemble
from nbody_gnn_hpc_tpu.predict import Predictor
from nbody_gnn_hpc_tpu.sim import shared_masses as make_shared_masses
from nbody_gnn_hpc_tpu.utils import compute_all_metrics


def main():
    parser = argparse.ArgumentParser(description="Evaluate GNN Model")
    parser.add_argument("--model-path", "-m", type=str,
                        default="./models/best_model.pt")
    parser.add_argument("--config-path", "-c", type=str,
                        default="./models/config.json")
    parser.add_argument("--output-dir", "-o", type=str, default="./results")
    parser.add_argument("--n-test-sims", type=int, default=10)
    parser.add_argument("--particles", "-n", type=int, default=200)
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--seed", type=int, default=9999)
    parser.add_argument("--quantize", choices=("bf16", "int8"), default=None,
                        help="Evaluate with weight-only quantized params "
                             "(measures the serving-quantization RMSE delta)")
    parser.add_argument("--f64-ground-truth", action="store_true",
                        help="Generate ground truth with the float64 host "
                             "oracle (the reference's precision regime, "
                             "nbody.py:179-184) instead of the f32 TPU "
                             "ensemble. Slower, but makes RMSE directly "
                             "comparable with the reference's published "
                             "numbers.")
    parser.add_argument("--watchdog", type=float, default=None,
                        metavar="SECONDS",
                        help="Exit with a distinctive code if the device "
                             "makes no progress for this many seconds "
                             "(backend-outage stall detection). Must cover "
                             "the rollout program's compile time. "
                             "0 disables.")
    args = parser.parse_args()

    model_path = Path(args.model_path)
    config_path = Path(args.config_path)
    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    if not model_path.exists():
        print(f"Error: Model not found at {model_path}")
        sys.exit(1)

    print("=" * 60)
    print("GNN MODEL EVALUATION (TPU)")
    print("=" * 60)

    if config_path.exists():
        with open(config_path) as f:
            config = json.load(f)
        model_config = config["model_config"]
        k_neighbors = config.get("training_config", {}).get("k_neighbors", 40)
    else:
        model_config = {"node_input_dim": 7, "hidden_dim": 256,
                        "n_layers": 6, "output_dim": 6, "dropout": 0.1}
        k_neighbors = 40

    print("\nLoading model...")
    from nbody_gnn_hpc_tpu.models import model_from_config

    # Inference at float32 regardless of the training compute dtype (the
    # checkpoint params are float32 either way).
    model = model_from_config(model_config, dtype_override="float32")
    predictor = Predictor(model, str(model_path), k_neighbors=k_neighbors)
    if args.quantize and not predictor.quantization:
        print(f"  (weight-only {args.quantize} quantization)")
        predictor.quantize(args.quantize)

    print(f"\nRunning {args.n_test_sims} test simulations "
          f"({args.particles} particles, {args.steps} steps)...")

    # Shared masses matching training (reference evaluate.py:76-77).
    shared_masses = make_shared_masses(args.particles, seed=42)
    seq_len = 5  # rollout start (published protocol, evaluate.py:79)
    prediction_steps = args.steps - seq_len - 1

    # Stall watchdog over the two device programs below (ground-truth
    # ensemble + batched rollout): a backend outage mid-evaluation becomes
    # a clean distinctive-code exit instead of an indefinite readback hang.
    from nbody_gnn_hpc_tpu.utils.watchdog import maybe_watchdog

    watchdog = maybe_watchdog(args.watchdog, what="evaluation progress")

    if args.f64_ground_truth:
        # Reference-precision oracle on the host CPU (published protocol).
        from nbody_gnn_hpc_tpu.sim import protocol_ground_truth

        print("  (ground truth: float64 host oracle)")
        # Host-only work: beat the watchdog per completed sim so a slow
        # (but healthy) oracle is not mistaken for a device stall.
        gt_pos, gt_vel, _ = protocol_ground_truth(
            n_test_sims=args.n_test_sims, n_particles=args.particles,
            n_steps=args.steps, dt=0.001, box_size=10.0, seed=args.seed,
            verbose=True,
            progress_cb=watchdog.beat if watchdog is not None else None)
    else:
        # All ground truths in one sharded ensemble program (f32, on device).
        ensemble = simulate_ensemble(
            seeds=[args.seed + i for i in range(args.n_test_sims)],
            n_particles=args.particles, n_steps=args.steps, box_size=10.0,
            dt=0.001, shared_masses=shared_masses)
        gt_pos = np.asarray(ensemble.positions, np.float64)
        gt_vel = np.asarray(ensemble.velocities, np.float64)

    test_results = []
    viz = None
    try:
        from nbody_gnn_hpc_tpu.utils import Visualizer

        viz = Visualizer(str(output_dir / "plots"))
    except Exception as e:
        print(f"  (Plots disabled: {e})")

    if watchdog is not None:
        watchdog.beat()  # ground truths materialized on the host

    # All rollouts in ONE device program (vmap over test sims) — the
    # reference rolls them out one host-trip-per-step (SURVEY §3.4).
    ai_all = predictor.predict_rollout_batch(
        gt_pos[:, seq_len].astype(np.float32),
        gt_vel[:, seq_len].astype(np.float32),
        shared_masses, n_steps=prediction_steps)
    if watchdog is not None:
        # predict_rollout_batch returns host arrays — all device work done.
        watchdog.stop()

    for i in range(args.n_test_sims):
        print(f"\n  Test {i + 1}/{args.n_test_sims}")
        ai = {"positions": ai_all["positions"][i],
              "velocities": ai_all["velocities"][i]}

        hpc_pos = gt_pos[i, seq_len:seq_len + prediction_steps + 1]
        hpc_vel = gt_vel[i, seq_len:seq_len + prediction_steps + 1]

        metrics = compute_all_metrics(
            ai["positions"][:len(hpc_pos)], ai["velocities"][:len(hpc_vel)],
            hpc_pos, hpc_vel, shared_masses)
        test_results.append(metrics)
        print(f"    Position RMSE: {metrics['position_rmse']:.6e}")
        print(f"    Velocity RMSE: {metrics['velocity_rmse']:.6e}")

        if i == 0 and viz is not None:
            viz.plot_comparison(hpc_pos, ai["positions"][:len(hpc_pos)],
                                title="Test 1: HPC vs AI",
                                save_name="comparison_test_1.png", show=False)
            pos_rmse = np.sqrt(np.mean(
                (ai["positions"][:len(hpc_pos)] - hpc_pos) ** 2, axis=(1, 2)))
            vel_rmse = np.sqrt(np.mean(
                (ai["velocities"][:len(hpc_vel)] - hpc_vel) ** 2, axis=(1, 2)))
            viz.plot_error_over_time(pos_rmse, vel_rmse,
                                     title="Test 1: Error Over Time",
                                     save_name="error_over_time_test_1.png",
                                     show=False)
            try:
                from nbody_gnn_hpc_tpu.utils import compute_energy_error

                pred_energy, _ = compute_energy_error(
                    ai["positions"], ai["velocities"], shared_masses)
                target_energy, _ = compute_energy_error(
                    hpc_pos, hpc_vel, shared_masses)
                viz.plot_energy_conservation(
                    target_energy, pred_energy,
                    title="Test 1: Energy Conservation",
                    save_name="energy_conservation_test_1.png", show=False)
            except Exception as e:
                print(f"    (Could not plot energy: {e})")

    print("\n" + "=" * 60)
    print("EVALUATION RESULTS")
    print("=" * 60)

    avg_metrics = {}
    for key in test_results[0].keys():
        v0 = test_results[0][key]
        if isinstance(v0, (int, float)) and not np.isnan(v0):
            values = [r[key] for r in test_results
                      if not np.isnan(r.get(key, float("nan")))]
            if values:
                avg_metrics[key] = float(np.mean(values))
                avg_metrics[f"{key}_std"] = float(np.std(values))

    print(f"\nAveraged over {args.n_test_sims} test simulations:")
    print("-" * 40)
    for m in ("position_rmse", "position_mae", "velocity_rmse",
              "velocity_mae"):
        print(f"  {m}: {avg_metrics.get(m, float('nan')):.6e} ± "
              f"{avg_metrics.get(m + '_std', 0):.6e}")
    print("-" * 40)

    results = {
        "model_path": str(model_path),
        "model_type": "gnn",
        "n_test_simulations": args.n_test_sims,
        "n_particles": args.particles,
        "n_steps": args.steps,
        "ground_truth": ("float64_host" if args.f64_ground_truth
                         else "float32_tpu"),
        "quantization": predictor.quantization,
        "average_metrics": avg_metrics,
        "per_simulation_metrics": test_results,
    }
    results_path = output_dir / "evaluation_results.json"
    with open(results_path, "w") as f:
        json.dump(results, f, indent=2, default=str)

    print(f"\n  Results: {results_path}")
    print(f"  Plots:   {output_dir / 'plots'}")
    print("=" * 60)


if __name__ == "__main__":
    main()
