"""Trainer Orbax checkpoint backend: save/resume equivalence with the
pickle backend (VERDICT round 1, item 6).

The orbax backend must be a drop-in: same ``save_model``/``load_model``
filename surface, bit-identical params and optimizer state after a restore,
and identical training continuation.
"""

import jax
import numpy as np
import pytest

from nbody_gnn_hpc_tpu.models import NBodyGNN
from nbody_gnn_hpc_tpu.train import GNNDataset, Trainer
from tests.test_dataset_trainer import dataset_paths  # noqa: F401 (fixture)


def make_trainer(dataset_paths, model_dir, backend):  # noqa: F811
    train, val = dataset_paths
    ds_train = GNNDataset(train, k_neighbors=3)
    ds_val = GNNDataset(val, k_neighbors=3,
                        external_norm_stats=ds_train.get_normalization_stats())
    model = NBodyGNN(node_input_dim=7, hidden_dim=8, n_layers=1,
                     output_dim=6, dropout=0.0, remat=False)
    return Trainer(model, ds_train, ds_val, model_dir=str(model_dir),
                   batch_size=16, noise_std=0.0, seed=3,
                   ckpt_backend=backend)


def tree_equal(a, b):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_orbax_resume_matches_pickle(dataset_paths, tmp_path):  # noqa: F811
    # Train the same tiny model under both backends.
    t_pickle = make_trainer(dataset_paths, tmp_path / "pkl", "pickle")
    t_orbax = make_trainer(dataset_paths, tmp_path / "obx", "orbax")
    tree_equal(t_pickle.params, t_orbax.params)  # same init (same seed)

    h1 = t_pickle.train(n_epochs=2, early_stopping_patience=10, save_every=10)
    h2 = t_orbax.train(n_epochs=2, early_stopping_patience=10, save_every=10)
    np.testing.assert_allclose(h1["train_loss"], h2["train_loss"], rtol=1e-6)
    tree_equal(t_pickle.params, t_orbax.params)

    # Fresh trainers resume from each backend's final checkpoint:
    # bit-identical params, optimizer state, and metadata.
    r_pickle = make_trainer(dataset_paths, tmp_path / "pkl", "pickle")
    r_pickle.load_model("final_model.pt")
    r_orbax = make_trainer(dataset_paths, tmp_path / "obx", "orbax")
    r_orbax.load_model("final_model.pt")

    tree_equal(r_pickle.params, r_orbax.params)
    tree_equal(r_pickle.opt_state, r_orbax.opt_state)
    assert r_pickle.current_epoch == r_orbax.current_epoch == 2
    assert np.isclose(r_pickle.best_val_loss, r_orbax.best_val_loss)
    np.testing.assert_allclose(
        np.asarray(r_pickle.norm_stats["state_mean"]),
        np.asarray(r_orbax.norm_stats["state_mean"]), rtol=0, atol=0)

    # Continuation from the restore is identical too.
    l1 = r_pickle.train_epoch()
    l2 = r_orbax.train_epoch()
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


@pytest.mark.slow
def test_orbax_best_and_final_labels(dataset_paths, tmp_path):  # noqa: F811
    t = make_trainer(dataset_paths, tmp_path / "m", "orbax")
    t.train(n_epochs=2, early_stopping_patience=10, save_every=1)
    index_path = tmp_path / "m" / "orbax_index.json"
    assert index_path.exists()
    import json

    index = json.loads(index_path.read_text())
    for label in ("best_model.pt", "final_model.pt", "checkpoint_epoch_1.pt",
                  "checkpoint_epoch_2.pt"):
        assert label in index, label
    # Labels point at distinct durable steps; best != final step is allowed
    # to coincide only if the last epoch improved — just check resolvability.
    t2 = make_trainer(dataset_paths, tmp_path / "m", "orbax")
    t2.load_model("best_model.pt")
    assert np.isfinite(t2.best_val_loss)
