"""Persistence layer: HDF5 schema parity, round-trips, windowed dataset
semantics, model checkpoint round-trip."""

import h5py
import numpy as np
import pytest

from nbody_gnn_hpc_tpu.io import (CheckpointManager, create_training_dataset,
                                  load_checkpoint, save_checkpoint)


@pytest.fixture
def manager(tmp_path):
    return CheckpointManager(str(tmp_path / "ckpts"))


def fake_state(rng, n=10, t=1.5, step=3):
    return {
        "positions": rng.rand(n, 3),
        "velocities": rng.rand(n, 3),
        "accelerations": rng.rand(n, 3),
        "masses": rng.rand(n),
        "time": t,
        "step": step,
    }


def fake_trajectory_states(rng, n_steps=12, n=6):
    return [fake_state(rng, n, t=0.001 * t, step=t) for t in range(n_steps)]


def test_state_hdf5_roundtrip(manager, rng):
    state = fake_state(rng)
    path = manager.save_state(state, "s1", metadata={"note": "x", "cfg": {"a": 1}})
    assert path.endswith("s1.h5")
    loaded = manager.load_state("s1")
    np.testing.assert_allclose(loaded["positions"], state["positions"])
    assert loaded["time"] == state["time"]
    assert loaded["metadata"]["cfg"] == {"a": 1}


def test_state_npz_roundtrip(tmp_path, rng):
    m = CheckpointManager(str(tmp_path), format="npz")
    state = fake_state(rng)
    path = m.save_state(state, "s1", metadata={"b": 2})
    assert path.endswith("s1.npz")
    loaded = m.load_state("s1")
    np.testing.assert_allclose(loaded["velocities"], state["velocities"])
    assert loaded["step"] == 3
    assert loaded["metadata"] == {"b": 2}


def test_trajectory_schema_matches_reference(manager, rng):
    """Exact schema of checkpoint.py:187-236: float64 pos/vel/acc, times,
    steps, masses datasets, n_steps attr, metadata group."""
    states = fake_trajectory_states(rng)
    path = manager.save_trajectory(states, "sim_0000",
                                   metadata={"n_particles": 6, "seed": 42})
    with h5py.File(path, "r") as f:
        assert f.attrs["n_steps"] == 12
        assert f["positions"].dtype == np.float64
        assert f["positions"].shape == (12, 6, 3)
        assert f["velocities"].dtype == np.float64
        assert f["accelerations"].dtype == np.float64
        assert set(f.keys()) >= {"positions", "velocities", "accelerations",
                                 "times", "steps", "masses"}
        assert f["metadata"].attrs["seed"] == 42
        assert "created_at" in f.attrs


def test_trajectory_roundtrip_and_exists(manager, rng):
    states = fake_trajectory_states(rng)
    assert not manager.trajectory_exists("sim_0001")
    manager.save_trajectory(states, "sim_0001")
    assert manager.trajectory_exists("sim_0001")
    traj = manager.load_trajectory("sim_0001")
    assert traj["n_steps"] == 12
    np.testing.assert_allclose(traj["positions"][3], states[3]["positions"])
    np.testing.assert_allclose(traj["masses"], states[0]["masses"])


def test_save_trajectory_accepts_device_trajectory(manager, rng):
    """Fast path: a stacked sim.Trajectory writes the identical schema."""
    import jax.numpy as jnp

    from nbody_gnn_hpc_tpu.sim import Trajectory

    n_steps, n = 5, 4
    traj = Trajectory(
        positions=jnp.asarray(rng.rand(n_steps, n, 3), jnp.float32),
        velocities=jnp.asarray(rng.rand(n_steps, n, 3), jnp.float32),
        accelerations=jnp.asarray(rng.rand(n_steps, n, 3), jnp.float32),
        masses=jnp.asarray(rng.rand(n), jnp.float32),
        times=jnp.arange(n_steps, dtype=jnp.float32) * 0.001,
        steps=jnp.arange(n_steps, dtype=jnp.int32),
    )
    path = manager.save_trajectory(traj, "sim_0002")
    with h5py.File(path, "r") as f:
        assert f["positions"].dtype == np.float64
        assert f.attrs["n_steps"] == n_steps


def test_list_and_delete(manager, rng):
    manager.save_state(fake_state(rng), "a")
    manager.save_trajectory(fake_trajectory_states(rng), "b")
    listed = manager.list_checkpoints()
    assert "a" in listed and "b (trajectory)" in listed
    assert manager.delete_checkpoint("a")
    assert not manager.delete_checkpoint("nonexistent")


def test_load_missing_raises(manager):
    with pytest.raises(FileNotFoundError):
        manager.load_state("nope")
    with pytest.raises(FileNotFoundError):
        manager.load_trajectory("nope")


def test_create_training_dataset_schema_and_windows(tmp_path, rng):
    """Window semantics parity (checkpoint.py:365-387): S = n_steps - L
    samples per trajectory at stride 1; input window [i, i+L), target i+L."""
    n_steps, n, L = 20, 5, 4
    trajs = []
    for _ in range(3):
        trajs.append({
            "positions": rng.rand(n_steps, n, 3),
            "velocities": rng.rand(n_steps, n, 3),
            "n_steps": n_steps,
        })
    masses = rng.rand(n).astype(np.float32)
    out = create_training_dataset(trajs, str(tmp_path / "ds.h5"),
                                  sequence_length=L, stride=1, masses=masses)
    with h5py.File(out, "r") as f:
        S = 3 * (n_steps - L)
        assert f.attrs["n_samples"] == S
        assert f.attrs["sequence_length"] == L
        assert f["inputs"].shape == (S, L, n, 6)
        assert f["inputs"].dtype == np.float32
        assert f["targets"].shape == (S, n, 6)
        np.testing.assert_array_equal(f["masses"][:], masses)
        # Check window content for trajectory 0, window 2.
        want_in = np.concatenate([trajs[0]["positions"][2:2 + L],
                                  trajs[0]["velocities"][2:2 + L]],
                                 axis=-1).astype(np.float32)
        np.testing.assert_array_equal(f["inputs"][2], want_in)
        want_tgt = np.concatenate([trajs[0]["positions"][2 + L],
                                   trajs[0]["velocities"][2 + L]],
                                  axis=-1).astype(np.float32)
        np.testing.assert_array_equal(f["targets"][2], want_tgt)


def test_create_training_dataset_empty_raises(tmp_path, rng):
    trajs = [{"positions": rng.rand(3, 4, 3), "velocities": rng.rand(3, 4, 3),
              "n_steps": 3}]
    with pytest.raises(ValueError):
        create_training_dataset(trajs, str(tmp_path / "ds.h5"),
                                sequence_length=10)


def test_model_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    params = {"dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros(3)}}
    norm = {"state_mean": np.zeros(6, np.float32),
            "state_std": np.ones(6, np.float32)}
    path = save_checkpoint(tmp_path / "best_model.pt", params=params,
                           best_val_loss=1.25, history={"train_loss": [2, 1]},
                           norm_stats=norm, model_config={"hidden_dim": 4})
    ckpt = load_checkpoint(path)
    np.testing.assert_array_equal(ckpt["model_state_dict"]["dense"]["kernel"],
                                  np.ones((3, 3)))
    assert ckpt["best_val_loss"] == 1.25
    assert ckpt["model_config"]["hidden_dim"] == 4
    np.testing.assert_array_equal(ckpt["norm_stats"]["state_std"], np.ones(6))


def _write_ckpt(path, epoch):
    save_checkpoint(path, params={"w": np.ones(2)},
                    scheduler_state={"epoch": epoch})


def test_save_trajectory_is_atomic(manager, rng):
    """Writes go to a temp name and land via os.replace: no .tmp residue
    after a successful save, and a stale .tmp from a crashed run is simply
    overwritten — `trajectory_exists` (the datagen resume check) can trust
    that an existing final path is a complete file."""
    from pathlib import Path

    ckpt_dir = Path(manager.checkpoint_dir)
    # stale temp from a previous crash must not break or survive the save
    (ckpt_dir / "t1_trajectory.h5.tmp").write_bytes(b"torn-by-crash")
    manager.save_trajectory(fake_trajectory_states(rng), "t1")
    assert not list(ckpt_dir.glob("*.tmp"))
    assert manager.trajectory_exists("t1")
    traj = manager.load_trajectory("t1")
    assert traj["positions"].shape == (12, 6, 3)
    # the temp name must never satisfy the resume existence check
    (ckpt_dir / "t2_trajectory.h5.tmp").write_bytes(b"in-flight")
    assert not manager.trajectory_exists("t2")


def test_save_checkpoint_is_atomic(tmp_path):
    """Model checkpoints land via os.replace too (evaluate/serve load these
    by name; a torn best_model.pt must be impossible)."""
    path = tmp_path / "best_model.pt"
    (tmp_path / "best_model.pt.tmp").write_bytes(b"stale")
    save_checkpoint(path, params={"w": np.ones(3)})
    assert not list(tmp_path.glob("*.tmp"))
    assert load_checkpoint(path)["model_state_dict"]["w"].shape == (3,)


def test_latest_checkpoint_picks_highest_epoch(tmp_path):
    from nbody_gnn_hpc_tpu.io.model_io import latest_checkpoint

    assert latest_checkpoint(tmp_path) is None
    _write_ckpt(tmp_path / "best_model.pt", 17)
    _write_ckpt(tmp_path / "checkpoint_epoch_10.pt", 10)
    assert latest_checkpoint(tmp_path) == "best_model.pt"
    _write_ckpt(tmp_path / "checkpoint_epoch_20.pt", 20)
    assert latest_checkpoint(tmp_path) == "checkpoint_epoch_20.pt"
    _write_ckpt(tmp_path / "final_model.pt", 20)  # tie -> final wins
    assert latest_checkpoint(tmp_path) == "final_model.pt"


def test_latest_checkpoint_ignores_foreign_and_corrupt_files(tmp_path):
    """Post-training promotions and half-written files from the crash must
    not be offered as resume points."""
    from nbody_gnn_hpc_tpu.io.model_io import latest_checkpoint

    _write_ckpt(tmp_path / "selected_model.pt", 99)
    _write_ckpt(tmp_path / "best_rollout_model.pt", 99)
    assert latest_checkpoint(tmp_path) is None
    _write_ckpt(tmp_path / "best_model.pt", 5)
    (tmp_path / "final_model.pt").write_bytes(b"truncated-by-crash")
    assert latest_checkpoint(tmp_path) == "best_model.pt"


def _finalize_orbax_step(model_dir, step):
    """Mimic a durable Orbax step on disk: a bare-number dir containing the
    _CHECKPOINT_METADATA marker Orbax writes at finalization."""
    d = model_dir / "orbax" / str(step)
    d.mkdir(parents=True, exist_ok=True)
    (d / "_CHECKPOINT_METADATA").write_text("{}")


def test_latest_checkpoint_orbax_backend(tmp_path):
    """Orbax keeps metadata in the sidecar index; resume reads epochs from
    there (same filename surface as the pickle backend)."""
    import json

    from nbody_gnn_hpc_tpu.io.model_io import latest_checkpoint

    assert latest_checkpoint(tmp_path, backend="orbax") is None
    index = {"best_model.pt": {"step": 1,
                               "scheduler_state_dict": {"epoch": 7}},
             "checkpoint_epoch_10.pt": {"step": 2,
                                        "scheduler_state_dict": {"epoch": 10}},
             "selected_model.pt": {"step": 3,
                                   "scheduler_state_dict": {"epoch": 99}}}
    (tmp_path / "orbax_index.json").write_text(json.dumps(index))
    for step in (1, 2, 3):
        _finalize_orbax_step(tmp_path, step)
    assert latest_checkpoint(tmp_path, backend="orbax") == \
        "checkpoint_epoch_10.pt"


def test_latest_checkpoint_orbax_skips_nondurable_steps(tmp_path):
    """The sidecar index is written synchronously but the tensor save it
    points at is ASYNC: a crash between the two leaves an index entry whose
    step never finalized on disk. Resume must fall back to the newest
    DURABLE step instead of crashing in restore."""
    import json

    from nbody_gnn_hpc_tpu.io.model_io import latest_checkpoint

    index = {"best_model.pt": {"step": 1,
                               "scheduler_state_dict": {"epoch": 7}},
             "final_model.pt": {"step": 2,
                                "scheduler_state_dict": {"epoch": 12}}}
    (tmp_path / "orbax_index.json").write_text(json.dumps(index))
    _finalize_orbax_step(tmp_path, 1)
    # step 2: in-flight temp dir only (no _CHECKPOINT_METADATA) — the state
    # the watchdog's os._exit leaves behind mid-async-write.
    (tmp_path / "orbax" / "2.orbax-checkpoint-tmp-123").mkdir(parents=True)
    assert latest_checkpoint(tmp_path, backend="orbax") == "best_model.pt"
    # torn sidecar: no usable entries, not an exception
    (tmp_path / "orbax_index.json").write_text("{torn")
    assert latest_checkpoint(tmp_path, backend="orbax") is None
