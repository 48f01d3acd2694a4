"""GNN training dataset: windowed HDF5 -> device-resident tensors.

Parity target: ``GNNDataset`` (``src/ai/train.py:30-179``) — same public
surface (n_samples, n_particles, masses, normalization stats, precomputed
static edge set, ``__getitem__`` normalization semantics,
``get_normalization_stats``/``get_masses_tensor``) — with a TPU-first data
path: instead of a fork-per-worker DataLoader re-reading HDF5 rows
(``train.py:126-168``), the whole epoch's (last-state, target) pairs are
loaded once and live in HBM (~1 GB at the production scale — SURVEY §7),
so the train loop never touches the host.

Deliberate fix vs the reference (SURVEY §7 quirks): normalization-stat and
edge-averaging sample draws are SEEDED (the reference uses the unseeded
global RNG at ``train.py:73,106``, making stats nondeterministic run-to-run;
stats are carried in checkpoints so this only affects reproducibility).
"""

from typing import Dict, Optional

import h5py
import numpy as np

from nbody_gnn_hpc_tpu.ops.knn import fully_connected_edge_index, knn_edge_index

_STAT_SEED = 12345  # fixed draw for norm stats / edge averaging (see above)


class GNNDataset:
    """Reads the windowed HDF5 dataset (schema: ``checkpoint.py:345-395``).

    Only the LAST state of each input window is used — this reproduces the
    reference's learning problem exactly (``train.py:143``; the
    ``sequence_length`` ctor arg is dead there too and kept for parity).
    """

    def __init__(self,
                 data_path: str,
                 sequence_length: int = 5,
                 k_neighbors: Optional[int] = None,
                 include_mass: bool = True,
                 external_norm_stats: Optional[Dict[str, np.ndarray]] = None):
        self.data_path = str(data_path)
        self.sequence_length = sequence_length
        self.k_neighbors = k_neighbors
        self.include_mass = include_mass

        with h5py.File(self.data_path, "r") as f:
            self.n_samples = int(f.attrs["n_samples"])
            self.n_particles = int(f["inputs"].shape[2])

            if "masses" in f:
                self.masses = f["masses"][:]
            else:
                # merge_dataset-produced files may omit masses; the reference
                # silently falls back to ones (train.py:63) which degrades the
                # physics loss — keep the fallback but warn loudly.
                self.masses = np.ones(self.n_particles)
                print("WARNING: dataset has no 'masses'; physics loss will "
                      "use unit masses")

            self._load_tensors(f)

        self._init_stats_and_edges(external_norm_stats)

    @classmethod
    def from_trajectories(cls, trajectories, sequence_length: int = 5,
                          stride: int = 1,
                          k_neighbors: Optional[int] = None,
                          include_mass: bool = True,
                          external_norm_stats: Optional[Dict] = None):
        """Build the dataset directly from trajectory dicts — no windowed
        HDF5 file needed.

        The windowed file stores every length-L window but only the LAST
        state of each is ever read (``train.py:143``), so the (last_state,
        target) pairs reduce to ``state[L-1:T-1], state[L:T]`` per
        trajectory — exactly what ``create_training_dataset``'s windows
        (starts ``range(0, T-L, stride)``, ``io/checkpoint.py:242-246``)
        collapse to. Sample ordering, mass handling, and the seeded
        stat/edge draws all match the file path, so the two constructions
        are tensor-identical (tests/test_dataset_trainer.py pins this).

        ``trajectories``: dicts with ``positions``/``velocities`` of shape
        (T, N, 3) and optionally shared ``masses`` (first dict wins).
        """
        self = cls.__new__(cls)
        self.data_path = "<trajectories>"
        self.sequence_length = sequence_length
        self.k_neighbors = k_neighbors
        self.include_mass = include_mass

        trajectories = list(trajectories)  # accept generators; reused below
        lasts, targets = [], []
        contributing = []
        for traj in trajectories:
            state = np.concatenate(
                [np.asarray(traj["positions"]),
                 np.asarray(traj["velocities"])],
                axis=-1).astype(np.float32)  # (T, N, 6)
            if state.shape[0] - sequence_length <= 0:
                continue
            starts = np.arange(0, state.shape[0] - sequence_length, stride)
            lasts.append(state[starts + sequence_length - 1])
            targets.append(state[starts + sequence_length])
            contributing.append(traj)
        if not lasts:
            raise ValueError("No samples could be created from trajectories")

        self.last_states = np.concatenate(lasts)
        self.targets = np.concatenate(targets)
        self.n_samples = int(self.last_states.shape[0])
        self.n_particles = int(self.last_states.shape[1])
        # Masses from the first trajectory that actually contributed samples
        # (a skipped too-short first trajectory must not supply them).
        m = contributing[0].get("masses")
        if m is not None:
            self.masses = np.asarray(m)
        else:
            self.masses = np.ones(self.n_particles)
            print("WARNING: trajectories have no 'masses'; physics loss "
                  "will use unit masses")

        self._init_stats_and_edges(external_norm_stats)
        return self

    def _init_stats_and_edges(self, external_norm_stats) -> None:
        k_neighbors = self.k_neighbors
        rng = np.random.RandomState(_STAT_SEED)

        if external_norm_stats is not None:
            self.state_mean = np.asarray(external_norm_stats["state_mean"],
                                         np.float32)
            self.state_std = np.asarray(external_norm_stats["state_std"],
                                        np.float32)
            print("  Using external normalization stats")
        else:
            # Per-feature mean/std over <=500 random last-states
            # (train.py:71-88), std clamped at 1e-6.
            n_stat = min(500, self.n_samples)
            idx = rng.choice(self.n_samples, n_stat, replace=False)
            flat = self.last_states[np.sort(idx)].reshape(-1, 6)
            self.state_mean = flat.mean(axis=0).astype(np.float32)
            self.state_std = np.maximum(
                flat.std(axis=0).astype(np.float32), 1e-6)

        print(f"  Normalization stats — mean: {self.state_mean}, "
              f"std: {self.state_std}")

        # Static edge set (train.py:91-122): fully connected for small N /
        # k=None, else k-NN from average positions of <=10 random samples.
        if k_neighbors is None or k_neighbors >= self.n_particles - 1:
            self.edge_index = fully_connected_edge_index(self.n_particles)
            print(f"Using fully connected graph "
                  f"({self.edge_index.shape[1]} edges)")
        else:
            print(f"Precomputing {k_neighbors}-NN edges...")
            n_avg = min(10, self.n_samples)
            idx = rng.choice(self.n_samples, n_avg, replace=False)
            avg_positions = self.last_states[idx, :, :3].mean(axis=0)
            self.edge_index = np.asarray(
                knn_edge_index(avg_positions, k_neighbors))
            print(f"  Created {self.edge_index.shape[1]} edges "
                  f"(precomputed, reused for all samples)")

        print(f"Dataset: {self.n_samples} samples, "
              f"{self.n_particles} particles")

    def _load_tensors(self, f) -> None:
        """Bulk-load last input states + targets, with an uncompressed .npz
        sidecar cache: the gzip'd production dataset takes minutes to
        decompress on one core per training launch; the sidecar loads in
        seconds.  Invalidated by source size+mtime."""
        import os

        src_stat = os.stat(self.data_path)
        cache_path = self.data_path + ".tensors.npz"
        tag = f"{src_stat.st_size}:{src_stat.st_mtime_ns}"
        if os.path.exists(cache_path):
            try:
                cached = np.load(cache_path)
                if str(cached["tag"]) == tag:
                    self.last_states = cached["last_states"]
                    self.targets = cached["targets"]
                    return
            except Exception:
                pass  # unreadable/stale cache -> rebuild

        self.last_states = np.empty(
            (self.n_samples, self.n_particles, 6), np.float32)
        self.targets = np.empty(
            (self.n_samples, self.n_particles, 6), np.float32)
        chunk = 2048
        for i in range(0, self.n_samples, chunk):
            j = min(i + chunk, self.n_samples)
            self.last_states[i:j] = f["inputs"][i:j, -1]
            self.targets[i:j] = f["targets"][i:j]
        try:
            np.savez(cache_path, tag=tag, last_states=self.last_states,
                     targets=self.targets)
        except Exception:
            pass  # cache write is best-effort (read-only dirs etc.)

    # -- reference item surface ---------------------------------------------

    def __len__(self) -> int:
        return self.n_samples

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        """Normalized sample (parity: ``train.py:140-168``): x = [norm_pos,
        norm_vel, mass/mean(mass)], pos = norm_pos, y = normalized target.
        Returned as a dict of numpy arrays (no torch/PyG)."""
        last = self.last_states[idx]
        norm = (last - self.state_mean) / self.state_std
        if self.include_mass:
            norm_mass = (self.masses / self.masses.mean()).reshape(-1, 1)
            x = np.concatenate([norm, norm_mass.astype(np.float32)], axis=1)
        else:
            x = norm
        y = (self.targets[idx] - self.state_mean) / self.state_std
        return {"x": x.astype(np.float32), "pos": norm[:, :3].copy(),
                "edge_index": self.edge_index, "y": y.astype(np.float32)}

    def get_normalization_stats(self) -> Dict[str, np.ndarray]:
        return {"state_mean": self.state_mean, "state_std": self.state_std}

    def get_masses_tensor(self) -> np.ndarray:
        """Masses as float32 array (name kept from train.py:177-179)."""
        return np.asarray(self.masses, np.float32)

    # -- TPU bulk path -------------------------------------------------------

    def device_arrays(self):
        """(last_states, targets) as device arrays — RAW (unnormalized)
        float32; normalization/noise happen inside the jitted train step so
        the stats stay fusable with the forward pass."""
        import jax.numpy as jnp

        return jnp.asarray(self.last_states), jnp.asarray(self.targets)


MANIFEST_NAME = "dataset_manifest.json"


def write_manifest(output_dir, train_sims, val_sims, sequence_length,
                   stride: int = 1, checkpoint_dir: str = "checkpoints"):
    """Record a ``--no-windows`` datagen run: which trajectory files form
    the train/val split and the window protocol to apply at load time.
    Replaces the 10x-redundant windowed HDF5 files (the dominant datagen
    wall-clock cost, RESULTS.md) with a few hundred bytes of JSON."""
    import json
    from pathlib import Path

    path = Path(output_dir) / MANIFEST_NAME
    with open(path, "w") as f:
        json.dump({
            "format": "nbody-gnn-trajectory-manifest",
            "version": 1,
            "checkpoint_dir": checkpoint_dir,
            "sequence_length": int(sequence_length),
            "stride": int(stride),
            "train_sims": list(train_sims),
            "val_sims": list(val_sims),
        }, f, indent=2)
    return str(path)


def datasets_from_manifest(manifest_path, k_neighbors: Optional[int] = None,
                           include_mass: bool = True, cache: bool = True):
    """(train_dataset, val_dataset) from a ``--no-windows`` manifest.

    Equivalent to loading ``train_dataset.h5``/``val_dataset.h5`` built
    from the same trajectories: the val set uses the train set's
    normalization stats, matching ``scripts/train_model.py``'s windowed
    path (reference ``train_model.py:94-100``).

    ``cache``: keep an uncompressed ``.tensors.npz`` sidecar next to the
    manifest — assembling the tensors from 300 lzf trajectory files costs
    ~1-3 minutes of single-core decompression per training launch; the
    sidecar reloads in seconds.  Invalidated by any change to the manifest
    spec or to the trajectory files' sizes/mtimes.  Norm stats and k-NN
    edges are recomputed from the cached tensors (seeded draws, identical
    either way).
    """
    import hashlib
    import json
    from pathlib import Path

    from nbody_gnn_hpc_tpu.io import CheckpointManager

    manifest_path = Path(manifest_path)
    with open(manifest_path) as f:
        spec = json.load(f)
    if spec.get("format") != "nbody-gnn-trajectory-manifest":
        raise ValueError(f"{manifest_path} is not a trajectory manifest")

    ckpt_dir = manifest_path.parent / spec["checkpoint_dir"]
    manager = CheckpointManager(str(ckpt_dir))
    seq_len, stride = spec["sequence_length"], spec.get("stride", 1)
    val_names = spec.get("val_sims") or []

    cache_path = Path(str(manifest_path) + ".tensors.npz")
    file_stats = []
    for name in list(spec["train_sims"]) + list(val_names):
        p = ckpt_dir / f"{name}_trajectory.h5"
        try:
            st = p.stat()
            file_stats.append((name, st.st_size, st.st_mtime_ns))
        except OSError:
            file_stats.append((name, -1, -1))
    tag = hashlib.sha256(json.dumps(
        {"train": list(spec["train_sims"]), "val": list(val_names),
         "seq": seq_len, "stride": stride, "files": file_stats},
        sort_keys=True).encode()).hexdigest()

    def _dataset(last, targets, masses, external=None):
        ds = GNNDataset.__new__(GNNDataset)
        ds.data_path = str(manifest_path)
        ds.sequence_length = seq_len
        ds.k_neighbors = k_neighbors
        ds.include_mass = include_mass
        ds.last_states = last
        ds.targets = targets
        ds.n_samples = int(last.shape[0])
        ds.n_particles = int(last.shape[1])
        ds.masses = masses
        ds._init_stats_and_edges(external)
        return ds

    if cache and cache_path.exists():
        try:
            cached = np.load(cache_path, allow_pickle=False)
            if str(cached["tag"]) == tag:
                print(f"  Loaded tensors from sidecar cache {cache_path.name}")
                train = _dataset(cached["train_states"], cached["train_targets"],
                                 cached["masses"])
                val = _dataset(cached["val_states"], cached["val_targets"],
                               cached["val_masses"],
                               external=train.get_normalization_stats()) \
                    if len(cached["val_states"]) else None
                return train, val
        except Exception:
            pass  # unreadable/stale cache -> rebuild

    def _load(names):
        return [manager.load_trajectory(n) for n in names]

    train = GNNDataset.from_trajectories(
        _load(spec["train_sims"]), sequence_length=seq_len, stride=stride,
        k_neighbors=k_neighbors, include_mass=include_mass)
    val = GNNDataset.from_trajectories(
        _load(val_names), sequence_length=seq_len, stride=stride,
        k_neighbors=k_neighbors, include_mass=include_mass,
        external_norm_stats=train.get_normalization_stats(),
    ) if val_names else None

    if cache:
        try:
            empty = np.zeros((0,) + train.last_states.shape[1:], np.float32)
            np.savez(cache_path, tag=tag,
                     train_states=train.last_states,
                     train_targets=train.targets,
                     val_states=val.last_states if val else empty,
                     val_targets=val.targets if val else empty,
                     masses=np.asarray(train.masses),
                     # val trajectories may carry their own masses
                     val_masses=np.asarray(val.masses) if val
                     else np.asarray(train.masses))
        except Exception as e:  # cache write is best-effort
            print(f"  ! sidecar cache write failed: {e}")
    return train, val
