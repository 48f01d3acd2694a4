"""Mesh-aware Trainer: data-parallel epochs match single-device exactly
(same seed -> same permutation/noise/dropout -> same numerics)."""

import numpy as np
import pytest

from nbody_gnn_hpc_tpu.io import create_training_dataset
from nbody_gnn_hpc_tpu.models import NBodyGNN
from nbody_gnn_hpc_tpu.parallel import make_mesh
from nbody_gnn_hpc_tpu.train import GNNDataset, Trainer


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("meshds")
    r = np.random.RandomState(3)
    n_steps, n = 40, 8
    trajs = [{"positions": np.cumsum(r.randn(n_steps, n, 3), 0),
              "velocities": r.randn(n_steps, n, 3), "n_steps": n_steps}
             for _ in range(2)]
    path = tmp / "train.h5"
    create_training_dataset(trajs, str(path), sequence_length=5,
                            masses=r.rand(n).astype(np.float32))
    return str(path)


def make_trainer(ds_path, tmp, mesh):
    model = NBodyGNN(node_input_dim=7, hidden_dim=8, n_layers=1, output_dim=6,
                     dropout=0.1)
    return Trainer(model, GNNDataset(ds_path, k_neighbors=3),
                   model_dir=str(tmp), batch_size=16, seed=0, mesh=mesh)


@pytest.mark.slow  # fast-mode budget (r5): certified variants of equalities a fast sibling still pins
def test_mesh_epoch_matches_single_device(ds, tmp_path):
    t1 = make_trainer(ds, tmp_path / "a", mesh=None)
    t8 = make_trainer(ds, tmp_path / "b", mesh=make_mesh(8))
    l1 = t1.train_epoch()
    l8 = t8.train_epoch()
    np.testing.assert_allclose(l8, l1, rtol=1e-4)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(t8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-6)


@pytest.mark.slow  # fast-mode budget (r5): certified variants of equalities a fast sibling still pins
def test_mesh_trainer_multiple_epochs(ds, tmp_path):
    t = make_trainer(ds, tmp_path / "c", mesh=make_mesh(4))
    losses = [t.train_epoch() for _ in range(3)]
    assert all(np.isfinite(l) for l in losses)


def test_hybrid_mesh_trainer_epoch_matches_single_device(ds, tmp_path):
    """The Trainer's mesh path also accepts the 2-D (dcn, data) hybrid mesh
    (emulated 2-slice pod) with identical numerics."""
    from nbody_gnn_hpc_tpu.parallel import make_hybrid_mesh

    t1 = make_trainer(ds, tmp_path / "h1", mesh=None)
    th = make_trainer(ds, tmp_path / "h2", mesh=make_hybrid_mesh(n_slices=2))
    l1 = t1.train_epoch()
    lh = th.train_epoch()
    np.testing.assert_allclose(lh, l1, rtol=1e-4)
