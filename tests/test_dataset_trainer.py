"""GNNDataset + Trainer: normalization semantics, edge policy, tiny training
runs (loss decreases, early stopping, checkpoint cadence, resume)."""

import json

import numpy as np
import pytest

from nbody_gnn_hpc_tpu.io import create_training_dataset, load_checkpoint
from nbody_gnn_hpc_tpu.models import NBodyGNN
from nbody_gnn_hpc_tpu.train import GNNDataset, Trainer


@pytest.fixture(scope="module")
def dataset_paths(tmp_path_factory):
    """Two small windowed datasets (train/val) from synthetic trajectories."""
    tmp = tmp_path_factory.mktemp("ds")
    rng = np.random.RandomState(7)
    n_steps, n = 40, 8

    def mk(seed, path):
        r = np.random.RandomState(seed)
        trajs = []
        for _ in range(2):
            pos = np.cumsum(r.randn(n_steps, n, 3), axis=0)
            vel = r.randn(n_steps, n, 3)
            trajs.append({"positions": pos, "velocities": vel,
                          "n_steps": n_steps})
        masses = rng.uniform(1e10, 1e12, n).astype(np.float32)
        create_training_dataset(trajs, str(path), sequence_length=5,
                                masses=masses)
        return str(path)

    train = mk(1, tmp / "train.h5")
    val = mk(2, tmp / "val.h5")
    return train, val


def test_dataset_basic(dataset_paths):
    train, _ = dataset_paths
    ds = GNNDataset(train, k_neighbors=3)
    assert ds.n_samples == 2 * 35
    assert ds.n_particles == 8
    assert ds.edge_index.shape == (2, 8 * 3)
    assert len(ds) == ds.n_samples


def test_dataset_fully_connected_when_k_large(dataset_paths):
    train, _ = dataset_paths
    ds = GNNDataset(train, k_neighbors=None)
    assert ds.edge_index.shape == (2, 8 * 7)
    ds2 = GNNDataset(train, k_neighbors=7)  # k >= N-1
    assert ds2.edge_index.shape == (2, 8 * 7)


def test_getitem_normalization(dataset_paths):
    train, _ = dataset_paths
    ds = GNNDataset(train, k_neighbors=3)
    item = ds[5]
    assert item["x"].shape == (8, 7)
    assert item["y"].shape == (8, 6)
    want_x6 = (ds.last_states[5] - ds.state_mean) / ds.state_std
    np.testing.assert_allclose(item["x"][:, :6], want_x6, rtol=1e-5)
    np.testing.assert_allclose(item["x"][:, 6],
                               ds.masses / ds.masses.mean(), rtol=1e-6)
    np.testing.assert_allclose(item["pos"], want_x6[:, :3], rtol=1e-5)
    want_y = (ds.targets[5] - ds.state_mean) / ds.state_std
    np.testing.assert_allclose(item["y"], want_y, rtol=1e-5)


def test_external_norm_stats(dataset_paths):
    train, val = dataset_paths
    ds_train = GNNDataset(train, k_neighbors=3)
    ds_val = GNNDataset(val, k_neighbors=3,
                        external_norm_stats=ds_train.get_normalization_stats())
    np.testing.assert_array_equal(ds_val.state_mean, ds_train.state_mean)
    np.testing.assert_array_equal(ds_val.state_std, ds_train.state_std)


def test_stats_deterministic(dataset_paths):
    """The reference's unseeded stat sampling is fixed (SURVEY §7 quirks):
    two loads give identical stats."""
    train, _ = dataset_paths
    a = GNNDataset(train, k_neighbors=3)
    b = GNNDataset(train, k_neighbors=3)
    np.testing.assert_array_equal(a.state_mean, b.state_mean)
    np.testing.assert_array_equal(a.edge_index, b.edge_index)


@pytest.fixture(scope="module")
def tiny_trainer(dataset_paths, tmp_path_factory):
    train, val = dataset_paths
    ds_train = GNNDataset(train, k_neighbors=3)
    ds_val = GNNDataset(val, k_neighbors=3,
                        external_norm_stats=ds_train.get_normalization_stats())
    model = NBodyGNN(node_input_dim=7, hidden_dim=16, n_layers=2,
                     output_dim=6, dropout=0.1)
    model_dir = tmp_path_factory.mktemp("models")
    trainer = Trainer(model, ds_train, ds_val, model_dir=str(model_dir),
                      batch_size=16, n_epochs=5, seed=0)
    return trainer, model_dir


def test_training_decreases_loss(tiny_trainer):
    trainer, model_dir = tiny_trainer
    history = trainer.train(n_epochs=5, early_stopping_patience=30,
                            save_every=2, verbose=False)
    assert len(history["train_loss"]) == 5
    assert history["val_loss"][-1] < history["val_loss"][0]
    # reference keys (train.py:563-567) plus the documented additive
    # epoch_time_s (ignored by every schema-parity reader)
    assert set(history) == {"train_loss", "val_loss", "learning_rate",
                            "energy_loss", "momentum_loss", "epoch_time_s"}
    assert len(history["epoch_time_s"]) == 5
    assert all(t >= 0 for t in history["epoch_time_s"])
    # Checkpoint cadence: best + every-2 + final (train.py:519-533).
    assert (model_dir / "best_model.pt").exists()
    assert (model_dir / "checkpoint_epoch_2.pt").exists()
    assert (model_dir / "checkpoint_epoch_4.pt").exists()
    assert (model_dir / "final_model.pt").exists()
    assert (model_dir / "training_history.json").exists()
    with open(model_dir / "training_history.json") as f:
        saved = json.load(f)
    assert saved["train_loss"] == history["train_loss"]
    # Completed-run markers (advisor r4): stamped in the JSON only — never
    # in the in-memory history, so mid-run checkpoints (which embed the
    # history) can't carry a stale one. This run exhausted its budget
    # without tripping patience -> completed but NOT early_stopped.
    assert saved["completed"] is True
    assert saved["early_stopped"] is False
    assert "completed" not in history
    ckpt = load_checkpoint(model_dir / "final_model.pt")
    assert "completed" not in (ckpt.get("history") or {})
    # LR of epoch 0 is the base LR.
    assert history["learning_rate"][0] == pytest.approx(5e-4)


def test_checkpoint_contents_and_reload(tiny_trainer, dataset_paths):
    trainer, model_dir = tiny_trainer
    ckpt = load_checkpoint(model_dir / "best_model.pt")
    assert ckpt["norm_stats"] is not None
    assert ckpt["model_config"]["hidden_dim"] == 16
    assert ckpt["best_val_loss"] == trainer.best_val_loss

    # Reload into a fresh trainer: params identical, best_val_loss restored.
    train, val = dataset_paths
    ds_train = GNNDataset(train, k_neighbors=3)
    model = NBodyGNN(node_input_dim=7, hidden_dim=16, n_layers=2,
                     output_dim=6, dropout=0.1)
    t2 = Trainer(model, ds_train, model_dir=str(model_dir), batch_size=16)
    t2.load_model("best_model.pt")
    import jax

    leaves1 = jax.tree_util.tree_leaves(trainer.params)
    # trainer.params may have trained further since best; just check shapes
    # of reload match and best_val_loss round-trips.
    leaves2 = jax.tree_util.tree_leaves(t2.params)
    assert [l.shape for l in leaves1] == [l.shape for l in leaves2]
    assert t2.best_val_loss == trainer.best_val_loss


def test_early_stopping(dataset_paths, tmp_path):
    train, val = dataset_paths
    ds_train = GNNDataset(train, k_neighbors=3)
    ds_val = GNNDataset(val, k_neighbors=3,
                        external_norm_stats=ds_train.get_normalization_stats())
    model = NBodyGNN(node_input_dim=7, hidden_dim=8, n_layers=1,
                     output_dim=6, dropout=0.0)
    trainer = Trainer(model, ds_train, ds_val, model_dir=str(tmp_path),
                      batch_size=16, noise_std=0.0)
    # Stub validation to a constant: no improvement after epoch 1 ->
    # patience 2 stops at epoch 3 (train.py:519-528 logic).
    trainer.validate = lambda: (1.0, {"total": 1.0, "energy": 0.0,
                                      "momentum": 0.0})
    history = trainer.train(n_epochs=10, early_stopping_patience=2,
                            verbose=False)
    assert len(history["train_loss"]) == 3


def test_watchdog_covers_final_saves(dataset_paths, tmp_path):
    """The watchdog must stay armed through the end-of-training artifacts
    (final_model.pt numpy-ifies device params — a readback that can wedge
    on an outage exactly like a mid-epoch one) and be disarmed by the time
    train() returns."""
    train, val = dataset_paths
    ds_train = GNNDataset(train, k_neighbors=3)
    ds_val = GNNDataset(val, k_neighbors=3,
                        external_norm_stats=ds_train.get_normalization_stats())
    model = NBodyGNN(node_input_dim=7, hidden_dim=8, n_layers=1,
                     output_dim=6, dropout=0.0)
    trainer = Trainer(model, ds_train, ds_val, model_dir=str(tmp_path),
                      batch_size=16, noise_std=0.0)
    armed_at_final = []
    orig_save = trainer.save_model

    def spying_save(filename):
        if filename == "final_model.pt":
            armed_at_final.append(trainer._watchdog is not None)
        return orig_save(filename)

    trainer.save_model = spying_save
    trainer.train(n_epochs=1, verbose=False, watchdog_s=600.0)
    assert armed_at_final == [True]
    assert trainer._watchdog is None  # disarmed before returning
    # watchdog_s=0 is an explicit disable, not a ValueError
    trainer.train(n_epochs=1, verbose=False, watchdog_s=0)
    assert trainer._watchdog is None


def test_mse_only_mode(dataset_paths, tmp_path):
    train, _ = dataset_paths
    ds_train = GNNDataset(train, k_neighbors=3)
    model = NBodyGNN(node_input_dim=7, hidden_dim=8, n_layers=1, output_dim=6)
    trainer = Trainer(model, ds_train, model_dir=str(tmp_path), batch_size=16,
                      use_physics_loss=False)
    loss = trainer.train_epoch()
    assert np.isfinite(loss)


# -- trajectory-direct construction (--no-windows datagen) --------------------

def _synthetic_trajs(seed, n_trajs=3, n_steps=30, n=8):
    r = np.random.RandomState(seed)
    masses = r.uniform(1e10, 1e12, n).astype(np.float32)
    trajs = []
    for _ in range(n_trajs):
        trajs.append({
            "positions": np.cumsum(r.randn(n_steps, n, 3), axis=0),
            "velocities": r.randn(n_steps, n, 3),
            "masses": masses,
            "n_steps": n_steps,
        })
    return trajs, masses


def test_from_trajectories_matches_windowed_file(tmp_path):
    """The trajectory-direct path is tensor-identical to loading a windowed
    HDF5 file built from the same trajectories (same windows, ordering,
    masses, seeded stats, and edge set)."""
    trajs, masses = _synthetic_trajs(11)
    path = tmp_path / "win.h5"
    create_training_dataset(trajs, str(path), sequence_length=5, stride=1,
                            masses=masses)

    ds_file = GNNDataset(str(path), k_neighbors=3)
    ds_traj = GNNDataset.from_trajectories(trajs, sequence_length=5,
                                           stride=1, k_neighbors=3)

    assert ds_traj.n_samples == ds_file.n_samples
    np.testing.assert_array_equal(ds_traj.last_states, ds_file.last_states)
    np.testing.assert_array_equal(ds_traj.targets, ds_file.targets)
    np.testing.assert_array_equal(ds_traj.state_mean, ds_file.state_mean)
    np.testing.assert_array_equal(ds_traj.state_std, ds_file.state_std)
    np.testing.assert_array_equal(ds_traj.edge_index, ds_file.edge_index)
    np.testing.assert_array_equal(ds_traj.get_masses_tensor(),
                                  ds_file.get_masses_tensor())


def test_from_trajectories_stride_and_short_trajs():
    """Stride >1 subsamples windows; too-short trajectories contribute
    nothing (matching create_training_dataset's counting)."""
    trajs, _ = _synthetic_trajs(12, n_trajs=2, n_steps=20)
    short = {"positions": np.zeros((4, 8, 3)), "velocities": np.zeros((4, 8, 3)),
             "masses": trajs[0]["masses"], "n_steps": 4}
    ds = GNNDataset.from_trajectories(trajs + [short], sequence_length=5,
                                      stride=3, k_neighbors=3)
    # per traj: len(range(0, 20-5, 3)) = 5 windows; the short traj: 0
    assert ds.n_samples == 2 * 5


def test_manifest_roundtrip(tmp_path):
    """write_manifest + datasets_from_manifest reproduces the train/val
    split with the val set on the train set's stats."""
    from nbody_gnn_hpc_tpu.io import CheckpointManager
    from nbody_gnn_hpc_tpu.train import datasets_from_manifest, write_manifest

    trajs, _ = _synthetic_trajs(13, n_trajs=4, n_steps=25)
    ckpt_dir = tmp_path / "checkpoints"
    manager = CheckpointManager(str(ckpt_dir))
    names = []
    for i, t in enumerate(trajs):
        name = f"sim_{i:04d}"
        states = [{"positions": t["positions"][s],
                   "velocities": t["velocities"][s],
                   "accelerations": np.zeros_like(t["positions"][s]),
                   "masses": t["masses"], "time": 0.1 * s, "step": s}
                  for s in range(t["n_steps"])]
        manager.save_trajectory(states, name)
        names.append(name)

    write_manifest(tmp_path, names[:3], names[3:], sequence_length=5)
    train, val = datasets_from_manifest(tmp_path / "dataset_manifest.json",
                                        k_neighbors=3)
    assert train.n_samples == 3 * 20  # range(0, 25-5) per traj
    assert val.n_samples == 1 * 20
    np.testing.assert_array_equal(val.state_mean, train.state_mean)
    np.testing.assert_array_equal(val.state_std, train.state_std)

    # and it matches building directly from the in-memory trajectories
    direct = GNNDataset.from_trajectories(trajs[:3], sequence_length=5,
                                          k_neighbors=3)
    np.testing.assert_allclose(train.last_states, direct.last_states,
                               rtol=0, atol=0)


def test_manifest_sidecar_cache(tmp_path):
    """Second datasets_from_manifest load hits the .tensors.npz sidecar and
    reproduces identical tensors/stats; touching a trajectory file
    invalidates it."""
    import os
    import time as _time

    from nbody_gnn_hpc_tpu.io import CheckpointManager
    from nbody_gnn_hpc_tpu.train import datasets_from_manifest, write_manifest

    trajs, _ = _synthetic_trajs(9, n_trajs=3, n_steps=15)
    ckpt_dir = tmp_path / "checkpoints"
    manager = CheckpointManager(str(ckpt_dir))
    names = []
    for i, t in enumerate(trajs):
        name = f"sim_{i:04d}"
        states = [{"positions": t["positions"][s],
                   "velocities": t["velocities"][s],
                   "accelerations": np.zeros_like(t["positions"][s]),
                   "masses": t["masses"], "time": 0.1 * s, "step": s}
                  for s in range(t["n_steps"])]
        manager.save_trajectory(states, name)
        names.append(name)
    write_manifest(tmp_path, names[:2], names[2:], sequence_length=5)
    manifest = tmp_path / "dataset_manifest.json"

    t1, v1 = datasets_from_manifest(manifest, k_neighbors=3)
    sidecar = tmp_path / "dataset_manifest.json.tensors.npz"
    assert sidecar.exists()

    t2, v2 = datasets_from_manifest(manifest, k_neighbors=3)
    np.testing.assert_array_equal(t2.last_states, t1.last_states)
    np.testing.assert_array_equal(t2.targets, t1.targets)
    np.testing.assert_array_equal(v2.last_states, v1.last_states)
    np.testing.assert_array_equal(t2.state_mean, t1.state_mean)
    np.testing.assert_array_equal(np.asarray(t2.edge_index),
                                  np.asarray(t1.edge_index))
    np.testing.assert_array_equal(np.asarray(t2.get_masses_tensor()),
                                  np.asarray(t1.get_masses_tensor()))

    # invalidation: bump a trajectory file's mtime
    f = ckpt_dir / f"{names[0]}_trajectory.h5"
    os.utime(f, (f.stat().st_atime, f.stat().st_mtime + 10))
    t3, _ = datasets_from_manifest(manifest, k_neighbors=3)  # rebuilds
    np.testing.assert_array_equal(t3.last_states, t1.last_states)

    # cache=False bypasses entirely
    t4, _ = datasets_from_manifest(manifest, k_neighbors=3, cache=False)
    np.testing.assert_array_equal(t4.last_states, t1.last_states)
