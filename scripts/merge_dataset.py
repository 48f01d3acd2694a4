#!/usr/bin/env python3
"""Merge individual trajectory files into training datasets without loading
everything into RAM.

CLI parity: reference ``scripts/merge_dataset.py`` — streams
``*_trajectory.h5`` files into windowed datasets one file at a time.

Deliberate fixes vs the reference (SURVEY §7 quirks):
- masses ARE written (the reference omits them, silently degrading the
  physics loss to unit masses via the train.py:63 fallback);
- the 80/20 train/val split IS performed (the reference's trailing split
  logic is unfinished commentary, merge_dataset.py:156-176);
- exact per-file sample counting (the reference estimates from the first
  file and resizes on overflow).

Usage:
    python scripts/merge_dataset.py --output-dir ./data
"""

import argparse
import sys
from pathlib import Path

import h5py
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def write_split(traj_files, output_path, seq_len, stride=1):
    """Stream one list of trajectory files into one windowed dataset."""
    # First pass: exact sample counts + shape/mass probe.
    counts, n_particles, masses = [], None, None
    for tf in traj_files:
        with h5py.File(tf, "r") as f:
            n_steps = int(f.attrs["n_steps"])
            if n_particles is None:
                n_particles = f["positions"].shape[1]
                if "masses" in f:
                    masses = f["masses"][:]
            if f["positions"].shape[1] != n_particles:
                print(f"Skipping {tf}: mismatch in particle count")
                counts.append(0)
                continue
            counts.append(max(0, -(-(n_steps - seq_len) // stride))
                          if n_steps > seq_len else 0)
    total = sum(counts)
    if total == 0:
        print(f"No samples for {output_path}; skipping")
        return 0

    in_shape = (seq_len, n_particles, 6)
    tgt_shape = (n_particles, 6)
    with h5py.File(output_path, "w") as out:
        inputs_ds = out.create_dataset(
            "inputs", shape=(total,) + in_shape, dtype="float32",
            compression="gzip", compression_opts=4,
            chunks=(min(100, total),) + in_shape)
        targets_ds = out.create_dataset(
            "targets", shape=(total,) + tgt_shape, dtype="float32",
            compression="gzip", compression_opts=4,
            chunks=(min(100, total),) + tgt_shape)

        idx = 0
        for tf, n_samples in zip(traj_files, counts):
            if n_samples == 0:
                continue
            with h5py.File(tf, "r") as f:
                state = np.concatenate(
                    [f["positions"][:], f["velocities"][:]],
                    axis=-1).astype(np.float32)
            starts = np.arange(0, state.shape[0] - seq_len, stride)
            windows = state[starts[:, None] + np.arange(seq_len)[None, :]]
            inputs_ds[idx:idx + n_samples] = windows
            targets_ds[idx:idx + n_samples] = state[starts + seq_len]
            idx += n_samples
            del state, windows

        out.attrs["n_samples"] = total
        out.attrs["sequence_length"] = seq_len
        if masses is not None:
            out.create_dataset("masses", data=masses.astype(np.float32))
    print(f"  {output_path}: {total} samples from {len(traj_files)} files")
    return total


def main():
    parser = argparse.ArgumentParser(description="Merge trajectories safely")
    parser.add_argument("--output-dir", "-o", type=str, default="./data",
                        help="Output directory containing checkpoints folder")
    parser.add_argument("--sequence-length", type=int, default=10,
                        help="Sequence length")
    parser.add_argument("--test-size", type=float, default=0.2,
                        help="Validation fraction (80/20 default split)")
    args = parser.parse_args()

    output_dir = Path(args.output_dir)
    checkpoint_dir = output_dir / "checkpoints"
    if not checkpoint_dir.exists():
        print(f"Error: Checkpoint directory not found at {checkpoint_dir}")
        sys.exit(1)

    traj_files = sorted(checkpoint_dir.glob("*_trajectory.h5"))
    print(f"Found {len(traj_files)} trajectory files.")
    if not traj_files:
        print("No files to merge.")
        sys.exit(0)

    n_train = int((1.0 - args.test_size) * len(traj_files))
    n_train = max(1, min(n_train, len(traj_files)))

    print("Creating train/val datasets...")
    write_split(traj_files[:n_train], output_dir / "train_dataset.h5",
                args.sequence_length)
    if n_train < len(traj_files):
        write_split(traj_files[n_train:], output_dir / "val_dataset.h5",
                    args.sequence_length)

    print("Merge complete.")


if __name__ == "__main__":
    main()
