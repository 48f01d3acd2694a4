#!/usr/bin/env python3
"""Rollout-aware fine-tuning of a trained GNN (beyond-reference capability).

Starts from an existing checkpoint (default best_model.pt), fine-tunes with
a K-step unrolled objective (see nbody_gnn_hpc_tpu/train/rollout_tune.py),
and saves ``best_rollout_model.pt`` with the same checkpoint schema.

Usage:
    python scripts/finetune_rollout.py --horizon 8 --steps 1000
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from nbody_gnn_hpc_tpu.io import load_checkpoint, save_checkpoint
from nbody_gnn_hpc_tpu.models import model_from_config
from nbody_gnn_hpc_tpu.train.rollout_tune import (finetune_rollout,
                                                  load_trajectory_tensor)


def parse_curriculum(spec: str):
    """'8:1500,16:900' -> [(8, 1500), (16, 900)] with validation."""
    try:
        rungs = [(int(h), int(s)) for h, _, s in
                 (part.partition(":") for part in spec.split(","))]
    except ValueError:
        raise ValueError(f"bad curriculum spec: {spec!r} "
                         "(expected 'K:steps[,K:steps...]')") from None
    if any(h < 1 or s < 1 for h, s in rungs):
        raise ValueError(f"bad curriculum spec: {spec!r} "
                         "(horizons and steps must be >= 1)")
    return rungs


def main():
    parser = argparse.ArgumentParser(description="Rollout-aware fine-tuning")
    parser.add_argument("--model-path", "-m", default="./models/best_model.pt")
    parser.add_argument("--config-path", "-c", default="./models/config.json")
    parser.add_argument("--data-dir", "-d", default="./data")
    parser.add_argument("--output", "-o", default="./models/best_rollout_model.pt")
    parser.add_argument("--horizon", "-k", type=int, default=8)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--curriculum", default=None,
                        help="Comma-separated K:steps rungs run in sequence "
                             "in one process (e.g. '8:1500,16:900' — the "
                             "measured production recipe, RESULTS.md); "
                             "overrides --horizon/--steps")
    parser.add_argument("--batch-size", "-b", type=int, default=8)
    parser.add_argument("--learning-rate", "-lr", type=float, default=5e-5)
    parser.add_argument("--max-sims", type=int, default=None,
                        help="Limit trajectories loaded (memory/speed)")
    parser.add_argument("--watchdog", type=float, default=None,
                        metavar="SECONDS",
                        help="Exit with a distinctive code if no logged "
                             "step chunk completes for this many seconds "
                             "(backend-outage stall detection). Must cover "
                             "each rung's compile time. 0 disables.")
    args = parser.parse_args()

    with open(args.config_path) as f:
        config = json.load(f)
    model_config = config["model_config"]
    k_neighbors = config.get("training_config", {}).get("k_neighbors", 40)

    ckpt = load_checkpoint(args.model_path)
    import jax

    params = jax.tree_util.tree_map(jax.numpy.asarray,
                                    ckpt["model_state_dict"])
    norm_stats = ckpt["norm_stats"]
    # Fine-tune at f32 (inference dtype) — the unroll is precision-sensitive.
    model = model_from_config(model_config, dtype_override="float32")

    ckpt_dir = Path(args.data_dir) / "checkpoints"
    names = sorted(p.name.replace("_trajectory.h5", "")
                   for p in ckpt_dir.glob("*_trajectory.h5"))
    # Fine-tune on the TRAIN split only (first 80% — generate_data.py:184).
    names = names[:int(0.8 * len(names))]
    if args.max_sims:
        names = names[:args.max_sims]
    if not names:
        print(f"No trajectories found in {ckpt_dir} — the unrolled "
              "objective needs raw trajectory files (run generate_data.py, "
              "windowed datasets alone are not enough)")
        sys.exit(1)
    print(f"Loading {len(names)} trajectories...")
    trajectories = load_trajectory_tensor(ckpt_dir, names)
    masses_file = __import__("h5py").File(
        ckpt_dir / f"{names[0]}_trajectory.h5", "r")
    masses = masses_file["masses"][:].astype(np.float32)
    masses_file.close()

    rungs = parse_curriculum(args.curriculum) if args.curriculum \
        else [(args.horizon, args.steps)]
    from nbody_gnn_hpc_tpu.utils.watchdog import maybe_watchdog

    watchdog = maybe_watchdog(args.watchdog, what="fine-tune step progress")
    histories = []
    try:
        for i, (horizon, steps) in enumerate(rungs, 1):
            print(f"Fine-tuning rung {i}/{len(rungs)}: horizon={horizon}, "
                  f"steps={steps}, batch={args.batch_size}, "
                  f"lr={args.learning_rate}")
            params, history = finetune_rollout(
                model, params, trajectories, norm_stats, masses,
                k_neighbors=k_neighbors, horizon=horizon,
                batch_size=args.batch_size, learning_rate=args.learning_rate,
                n_steps=steps,
                progress_cb=watchdog.beat if watchdog is not None else None)
            histories.append({"horizon": horizon, "steps": steps,
                              "history": history})
        # The save numpy-ifies device params (a readback) — keep the
        # watchdog armed until the artifact is durable.
        save_checkpoint(args.output, params=params, norm_stats=norm_stats,
                        history=histories[-1]["history"],
                        model_config=model_config,
                        extra={"finetune": {"curriculum": rungs,
                                            "base": str(args.model_path),
                                            "rungs": histories}})
    finally:
        if watchdog is not None:
            watchdog.stop()
    print(f"Saved {args.output}")


if __name__ == "__main__":
    main()
