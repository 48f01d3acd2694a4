#!/usr/bin/env python3
"""Generate training data for the N-body GNN (TPU-native).

CLI parity: reference ``scripts/generate_data.py`` — same flags, seeds
(shared masses from --seed, per-sim seeds seed+i), dt hardcoded to 0.001,
resumable via existing trajectory files, 80/20 train/val split.

TPU redesign: instead of a process pool running one Numba sim per worker
(reference :143-147), each batch of simulations integrates as ONE sharded
device program (vmap over sims, mesh over chips) — the thread-pinning env
guards the reference needs (:16-19) have no equivalent here.

Usage:
    python scripts/generate_data.py --particles 200 --simulations 300 --steps 400
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from nbody_gnn_hpc_tpu.io import CheckpointManager, create_training_dataset
from nbody_gnn_hpc_tpu.parallel import (fetch_host_trajectory,
                                        simulate_ensemble, trajectory_slice)
from nbody_gnn_hpc_tpu.sim import shared_masses as make_shared_masses
from nbody_gnn_hpc_tpu.utils import StageTimer


def main():
    parser = argparse.ArgumentParser(description="Generate N-body training data")
    parser.add_argument("--particles", "-n", type=int, default=500,
                        help="Number of particles per simulation")
    parser.add_argument("--simulations", "-s", type=int, default=50,
                        help="Number of simulations to run")
    parser.add_argument("--steps", type=int, default=200,
                        help="Timesteps per simulation")
    parser.add_argument("--save-interval", type=int, default=1,
                        help="Save state every N steps")
    parser.add_argument("--box-size", type=float, default=10.0,
                        help="Simulation box size")
    parser.add_argument("--workers", "-w", type=int, default=None,
                        help="(parity flag; sims run on-device, not in workers)")
    parser.add_argument("--output-dir", "-o", type=str, default="./data",
                        help="Output directory")
    parser.add_argument("--sequence-length", type=int, default=5,
                        help="Sequence length for training samples")
    parser.add_argument("--seed", type=int, default=42,
                        help="Random seed base")
    parser.add_argument("--batch-size", type=int, default=100,
                        help="Simulations per device batch (memory control)")
    parser.add_argument("--gzip-level", type=int, default=4,
                        help="HDF5 gzip level for windowed datasets "
                             "(4 = reference default; 1 = ~3x faster writes)")
    parser.add_argument("--compression", choices=("gzip", "lzf", "none"),
                        default="gzip",
                        help="HDF5 codec for all written files (gzip = "
                             "reference schema default; lzf ~5-10x faster "
                             "host writes; none fastest). Readers are "
                             "codec-agnostic.")
    parser.add_argument("--prefetch", type=int, default=2,
                        help="Device batches dispatched ahead of host "
                             "writes (HBM permitting)")
    parser.add_argument("--watchdog", type=float, default=None,
                        metavar="SECONDS",
                        help="Exit with a distinctive code if no batch "
                             "readback completes for this many seconds "
                             "(backend-outage stall detection; rerunning "
                             "resumes at the file level). Must cover the "
                             "first batch's compile time. 0 disables.")
    parser.add_argument("--no-windows", action="store_true",
                        help="Skip the windowed train/val HDF5 files (the "
                             "dominant datagen cost: each state is stored "
                             "~seq-len times over). Writes "
                             "dataset_manifest.json instead; train_model.py "
                             "builds the (state, target) pairs directly "
                             "from the trajectory files at load time.")
    args = parser.parse_args()

    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    checkpoint_dir = output_dir / "checkpoints"
    checkpoint_dir.mkdir(exist_ok=True)

    import jax

    print("=" * 60)
    print("N-BODY DATA GENERATION (TPU)")
    print("=" * 60)
    print(f"  Particles:     {args.particles}")
    print(f"  Simulations:   {args.simulations}")
    print(f"  Steps:         {args.steps}")
    print(f"  Devices:       {len(jax.devices())} ({jax.default_backend()})")
    print(f"  Output Dir:    {output_dir}")
    print("=" * 60)

    manager = CheckpointManager(str(checkpoint_dir))
    timer = StageTimer()

    # Shared masses: all sims use the same particle masses so the physics
    # loss is exact (reference generate_data.py:106-110).
    shared_masses = make_shared_masses(args.particles, seed=args.seed)
    print(f"  Shared masses: range [{shared_masses.min():.2e}, "
          f"{shared_masses.max():.2e}]")

    n_batches = -(-args.simulations // args.batch_size)
    print(f"\nProcessing {args.simulations} simulations in {n_batches} "
          f"batches (prefetch depth {args.prefetch})...")

    # Plan the work: which sims each batch still owes (file-level resume,
    # reference generate_data.py:129-130).
    plans = []
    total_skipped = 0
    for batch_idx in range(n_batches):
        start = batch_idx * args.batch_size
        end = min(start + args.batch_size, args.simulations)
        todo = [i for i in range(start, end)
                if not manager.trajectory_exists(f"sim_{i:04d}")]
        total_skipped += (end - start) - len(todo)
        plans.append(todo)

    def dispatch(todo):
        """Launch one batch on the device; returns the (async) device traj.

        layout="planes": the single-chip lanes path returns the trajectory
        in planes layout (no device-side transpose — the measured ~17% of
        integrator time); fetch_host_trajectory converts during the
        readback the save stage already pays."""
        return simulate_ensemble(
            seeds=[args.seed + i for i in todo],
            n_particles=args.particles,
            n_steps=args.steps,
            box_size=args.box_size,
            dt=0.001,  # pipeline value (reference hardcodes it too)
            save_interval=args.save_interval,
            shared_masses=shared_masses,
            layout="planes")

    # Pipeline, three overlapped rungs (measured on the 300x400x200 run:
    # device compute ~40 ms, tunnel readback ~26 s/batch, HDF5 write
    # ~16 s/batch — the host, not the chip, is the bottleneck):
    #   1. --prefetch keeps batches in flight on the device (async exec),
    #   2. a single background writer thread writes batch k's HDF5 files
    #      while the main thread fetches batch k+1's readback — before this
    #      they serialized (stall/write ratio 0.92 measured), costing
    #      min(fetch, save) per steady batch,
    #   3. the readback itself is the irreducible serial stage (one tunnel).
    # One writer thread only: each trajectory is its own HDF5 file, and a
    # single writer keeps h5py single-threaded.
    from concurrent.futures import ThreadPoolExecutor

    in_memory = {}  # sim_idx -> trajectory dict, avoids disk round-trips
    inflight = []   # (todo, device_traj)
    work = [todo for todo in plans if todo]
    next_dispatch = 0
    done_sims = 0
    batch_stats = []  # per-batch (fetch_stall_s, save_s) — overlap evidence
    import time as _time

    def save_batch(todo, traj):
        # Runs on the writer thread and mutates `in_memory` and the shared
        # StageTimer — race-free ONLY under the single-writer invariant
        # (max_workers=1 below): the main thread touches both only after
        # .result()/.shutdown(), and no two saves ever run concurrently.
        t0 = _time.perf_counter()
        with timer.stage("save"):
            for j, sim_idx in enumerate(todo):
                sl = trajectory_slice(traj, j)
                manager.save_trajectory(
                    sl, f"sim_{sim_idx:04d}",
                    metadata={"n_particles": args.particles,
                              "seed": args.seed + sim_idx},
                    compression=args.compression)
                in_memory[sim_idx] = {
                    "positions": sl.positions, "velocities": sl.velocities,
                    "masses": sl.masses,
                    "n_steps": sl.positions.shape[0]}
        return _time.perf_counter() - t0

    writer = ThreadPoolExecutor(max_workers=1)  # see save_batch invariant
    pending = None  # (fetch_stall_s, Future[save_s]) of the previous batch
    from nbody_gnn_hpc_tpu.utils.watchdog import maybe_watchdog

    watchdog = maybe_watchdog(args.watchdog if work else None,
                              what="batch-readback progress")
    try:
        while inflight or next_dispatch < len(work):
            while (next_dispatch < len(work)
                   and len(inflight) < max(1, args.prefetch)):
                with timer.stage("dispatch"):
                    inflight.append((work[next_dispatch],
                                     dispatch(work[next_dispatch])))
                next_dispatch += 1
            todo, device_traj = inflight.pop(0)
            # If the previous batch's write already finished, harvest it now
            # — a save failure then surfaces BEFORE this batch's ~26s
            # readback is paid, one batch earlier than the post-fetch check.
            if pending is not None and pending[1].done():
                prev, pending = pending, None
                batch_stats.append((prev[0], prev[1].result()))
            t0 = _time.perf_counter()
            with timer.stage("fetch"):
                traj = fetch_host_trajectory(device_traj)
            t_fetch = _time.perf_counter() - t0
            if watchdog is not None:
                watchdog.beat()  # the readback completed — real progress
            done_sims += len(todo)
            print(f"  Simulated {done_sims} new sims "
                  f"(+{total_skipped} resumed); writing...")
            if pending is not None:
                # .result() re-raises any writer-thread failure here, before
                # more work is dispatched. Clear `pending` first so the
                # finally block below never double-reports the same future.
                prev, pending = pending, None
                batch_stats.append((prev[0], prev[1].result()))
            pending = (t_fetch, writer.submit(save_batch, todo, traj))
        if pending is not None:
            prev, pending = pending, None
            batch_stats.append((prev[0], prev[1].result()))
    finally:
        if watchdog is not None:
            watchdog.stop()
        writer.shutdown(wait=True)
        if pending is not None:
            # We are unwinding on an exception (a fetch failure or
            # interrupt) with the previous batch's write never checked —
            # surface a writer-thread failure instead of swallowing it
            # (a failed/partial trajectory write must not pass silently:
            # --resume trusts what landed on disk).
            exc = pending[1].exception()
            if exc is not None:
                print(f"  WARNING: trajectory write failed in the writer "
                      f"thread: {exc!r}", file=sys.stderr)
    if total_skipped:
        print(f"  Already complete: skipped {total_skipped} sims")
    if len(batch_stats) > 1:
        # Overlap evidence. Steady-state fetch stalls now run concurrently
        # with the previous batch's HDF5 write; the first batch's stall
        # includes compile + pipeline fill and is reported separately. With
        # full overlap, wall ~= fill + sum(fetch) + last write, so
        # sum(stage seconds) in the report below exceeds wall — the gap IS
        # the hidden host-write time.
        steady = sorted(f for f, _ in batch_stats[1:])
        stall = sum(steady)
        writes = sum(s for _, s in batch_stats)
        print(f"  Pipeline overlap ({len(batch_stats)} batches, prefetch "
              f"{args.prefetch}): first fetch {batch_stats[0][0]:.1f}s "
              f"(compile+fill), steady-state fetch stalls "
              f"p50 {steady[len(steady) // 2]:.2f}s / "
              f"max {steady[-1]:.2f}s / total {stall:.1f}s; "
              f"host writes {writes:.1f}s, overlapped with the next "
              f"batch's readback (writer thread) and with device compute "
              f"(prefetch)")

    n_train = int(0.8 * args.simulations)

    if args.no_windows:
        from nbody_gnn_hpc_tpu.train import write_manifest

        sim_names = [f"sim_{i:04d}" for i in range(args.simulations)]
        manifest = write_manifest(output_dir, sim_names[:n_train],
                                  sim_names[n_train:],
                                  sequence_length=args.sequence_length)
        print("\n" + "=" * 60)
        print("DATA GENERATION COMPLETE (trajectory manifest mode)")
        print("=" * 60)
        print(f"  Manifest:      {manifest}")
        print(f"  Trajectories:  {checkpoint_dir}")
        print(timer.report())
        print("=" * 60)
        return

    # Assemble for dataset creation: fresh sims straight from memory,
    # resumed sims from their files.
    all_trajectories = []
    with timer.stage("load"):
        for i in range(args.simulations):
            if i in in_memory:
                all_trajectories.append(in_memory[i])
            else:
                t = manager.load_trajectory(f"sim_{i:04d}")
                all_trajectories.append({
                    "positions": t["positions"],
                    "velocities": t["velocities"],
                    "masses": t["masses"],
                    "n_steps": t["n_steps"],
                })

    print(f"\nGenerated {len(all_trajectories)} trajectories")
    print("\nCreating training datasets...")

    masses = all_trajectories[0].get("masses")

    with timer.stage("dataset"):
        create_training_dataset(all_trajectories[:n_train],
                                str(output_dir / "train_dataset.h5"),
                                sequence_length=args.sequence_length,
                                stride=1, masses=masses,
                                gzip_level=args.gzip_level,
                                compression=args.compression)
        create_training_dataset(all_trajectories[n_train:],
                                str(output_dir / "val_dataset.h5"),
                                sequence_length=args.sequence_length,
                                stride=1, masses=masses,
                                gzip_level=args.gzip_level,
                                compression=args.compression)

    print("\n" + "=" * 60)
    print("DATA GENERATION COMPLETE")
    print("=" * 60)
    print(f"  Train dataset: {output_dir / 'train_dataset.h5'}")
    print(f"  Val dataset:   {output_dir / 'val_dataset.h5'}")
    print(timer.report())
    print("=" * 60)


if __name__ == "__main__":
    main()
