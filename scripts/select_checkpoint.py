#!/usr/bin/env python3
"""Rollout-aware checkpoint selection (beyond-reference capability).

Scores every checkpoint a training run saved (periodic + best + final) by
full-horizon autoregressive rollout RMSE on held-out validation
trajectories, prints the ranking, and optionally promotes the winner to
``models/selected_model.pt`` for evaluation/serving.

Why this exists: the reference (and our parity ``Trainer``) selects on
one-step val loss (``train.py:519-528``), which RESULTS.md shows
anticorrelates with rollout quality — identically-configured runs measured
394-step position RMSE 121.9 vs 580.7 purely from which epoch best-val
landed on.  Full-horizon rollouts on a few val trajectories cost minutes for
8 checkpoints (one compile + 8 executions) and select on the quantity that
matters; short horizons are NOT a safe shortcut (measured: a horizon-50
sweep picks a checkpoint 3× worse at 394 steps — selection.py docstring).

Usage:
    python scripts/select_checkpoint.py                # rank + report
    python scripts/select_checkpoint.py --promote      # + write selected_model.pt
"""

import argparse
import json
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from nbody_gnn_hpc_tpu.io import CheckpointManager
from nbody_gnn_hpc_tpu.models import model_from_config
from nbody_gnn_hpc_tpu.predict.selection import (discover_checkpoints,
                                                 score_checkpoints,
                                                 select_checkpoint)
from nbody_gnn_hpc_tpu.train.rollout_tune import load_trajectory_tensor


def main():
    parser = argparse.ArgumentParser(
        description="Rollout-aware checkpoint selection")
    parser.add_argument("--models-dir", "-m", default="./models")
    parser.add_argument("--config-path", "-c", default="./models/config.json")
    parser.add_argument("--data-dir", "-d", default="./data")
    parser.add_argument("--horizon", "-k", type=int, default=None,
                        help="Rollout steps per scored checkpoint (default: "
                             "the longest the val trajectories support — "
                             "measured: short horizons mispredict full"
                             "-horizon ranking, see predict/selection.py)")
    parser.add_argument("--n-sims", type=int, default=4,
                        help="Held-out val trajectories to score against")
    parser.add_argument("--start-step", type=int, default=5,
                        help="Rollout start (published protocol starts at 5)")
    parser.add_argument("--metric", choices=("position_rmse",
                                             "velocity_rmse"),
                        default="position_rmse")
    parser.add_argument("--promote", action="store_true",
                        help="Copy the winner to <models-dir>/selected_model.pt")
    parser.add_argument("--output", "-o", default=None,
                        help="Selection report JSON "
                             "(default <models-dir>/checkpoint_selection.json)")
    parser.add_argument("--watchdog", type=float, default=None,
                        metavar="SECONDS",
                        help="Exit with a distinctive code if no checkpoint "
                             "finishes scoring for this many seconds "
                             "(backend-outage stall detection). Must cover "
                             "the rollout program's compile time. "
                             "0 disables.")
    args = parser.parse_args()

    with open(args.config_path) as f:
        config = json.load(f)
    k_neighbors = config.get("training_config", {}).get("k_neighbors", 40)
    model = model_from_config(config["model_config"],
                              dtype_override="float32")

    candidates = discover_checkpoints(args.models_dir)
    if not candidates:
        print(f"No checkpoints found in {args.models_dir}")
        sys.exit(1)

    # Validation split = the last 20% of sims by name (generate_data.py:184
    # puts the first 80% in the train split).
    ckpt_dir = Path(args.data_dir) / "checkpoints"
    names = sorted(p.name.replace("_trajectory.h5", "")
                   for p in ckpt_dir.glob("*_trajectory.h5"))
    val_names = names[int(0.8 * len(names)):][:args.n_sims]
    if not val_names:
        print(f"No trajectories found in {ckpt_dir}")
        sys.exit(1)

    val_states = load_trajectory_tensor(ckpt_dir, val_names)
    import h5py
    with h5py.File(ckpt_dir / f"{val_names[0]}_trajectory.h5", "r") as f:
        masses = f["masses"][:].astype(np.float32)

    horizon = args.horizon
    if horizon is None:  # full-horizon default (see selection.py docstring)
        horizon = val_states.shape[1] - args.start_step - 1
    if horizon < 1:
        print(f"Val trajectories save only {val_states.shape[1]} states — "
              f"no rollout horizon left after --start-step {args.start_step}")
        sys.exit(1)
    print(f"Scoring {len(candidates)} checkpoints: {horizon}-step "
          f"rollouts on {len(val_names)} val trajectories "
          f"({', '.join(val_names)})")

    from nbody_gnn_hpc_tpu.utils.watchdog import maybe_watchdog

    watchdog = maybe_watchdog(args.watchdog,
                              what="checkpoint-scoring progress")
    try:
        scores = score_checkpoints(
            model, candidates, val_states, masses, k_neighbors,
            horizon=horizon, start_step=args.start_step,
            progress_cb=watchdog.beat if watchdog is not None else None)
    finally:
        if watchdog is not None:
            watchdog.stop()  # report/promotion below are host-only
    best = select_checkpoint(scores, args.metric)

    print(f"\n{'checkpoint':<28} {'pos RMSE':>12} {'vel RMSE':>14}")
    print("-" * 56)
    for s in scores:
        mark = "  <-- selected" if s["path"] == best["path"] else ""
        print(f"{Path(s['path']).name:<28} {s['position_rmse']:>12.4g} "
              f"{s['velocity_rmse']:>14.4g}{mark}")

    report = {"metric": args.metric, "horizon": horizon,
              "start_step": args.start_step, "val_sims": val_names,
              "scores": scores, "selected": best["path"]}
    out = Path(args.output or Path(args.models_dir)
               / "checkpoint_selection.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"\nReport: {out}")

    if args.promote:
        dst = Path(args.models_dir) / "selected_model.pt"
        shutil.copyfile(best["path"], dst)
        print(f"Promoted {Path(best['path']).name} -> {dst}")


if __name__ == "__main__":
    main()
