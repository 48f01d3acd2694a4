"""Predictor: zero-init identity rollouts, normalization round-trip,
checkpoint loading, compare_with_hpc contract."""

import jax
import numpy as np
import pytest

from nbody_gnn_hpc_tpu.io import save_checkpoint
from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
from nbody_gnn_hpc_tpu.predict import Predictor, compare_with_hpc


@pytest.fixture
def zero_predictor():
    """Predictor with freshly-initialized (zero-delta) params and nontrivial
    norm stats — rollout must be exactly stationary."""
    model = NBodyGNN(node_input_dim=7, hidden_dim=16, n_layers=2,
                     output_dim=6, dropout=0.1)
    params = init_model(model, jax.random.PRNGKey(0), 10, 10 * 4)
    pred = Predictor(model, k_neighbors=4, params=params)
    pred.norm_stats = {
        "state_mean": np.asarray([1.0, -2.0, 0.5, 0.1, 0.2, -0.1], np.float32),
        "state_std": np.asarray([2.0, 3.0, 1.0, 0.5, 0.4, 0.8], np.float32),
    }
    return pred


def test_zero_init_rollout_is_stationary(zero_predictor, rng):
    """Zero-init decoder => pred == input in NORMALIZED space; denormalizing
    returns the raw input, so the rollout never moves (SURVEY §4f)."""
    pos = rng.randn(10, 3).astype(np.float32) * 5
    vel = rng.randn(10, 3).astype(np.float32)
    masses = rng.uniform(1e10, 1e12, 10).astype(np.float32)
    out = zero_predictor.predict_rollout(pos, vel, masses, n_steps=7)
    assert out["positions"].shape == (8, 10, 3)
    assert out["velocities"].shape == (8, 10, 3)
    np.testing.assert_allclose(out["positions"][-1], pos, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(out["velocities"][-1], vel, rtol=1e-3,
                               atol=1e-4)


def test_predict_single_matches_rollout_first_step(zero_predictor, rng):
    pos = rng.randn(10, 3).astype(np.float32)
    vel = rng.randn(10, 3).astype(np.float32)
    masses = rng.uniform(1e10, 1e12, 10).astype(np.float32)
    p1, v1 = zero_predictor.predict_single(pos, vel, masses)
    out = zero_predictor.predict_rollout(pos, vel, masses, n_steps=1)
    np.testing.assert_allclose(p1, out["positions"][1], rtol=1e-6)
    np.testing.assert_allclose(v1, out["velocities"][1], rtol=1e-6)


def test_fully_connected_when_k_none(rng):
    model = NBodyGNN(node_input_dim=7, hidden_dim=8, n_layers=1, output_dim=6)
    params = init_model(model, jax.random.PRNGKey(0), 6, 30)
    pred = Predictor(model, k_neighbors=None, params=params)
    pos = rng.randn(6, 3).astype(np.float32)
    vel = rng.randn(6, 3).astype(np.float32)
    masses = np.ones(6, np.float32)
    p1, v1 = pred.predict_single(pos, vel, masses)
    assert p1.shape == (6, 3)


def test_load_model_from_checkpoint(tmp_path, rng):
    model = NBodyGNN(node_input_dim=7, hidden_dim=16, n_layers=2,
                     output_dim=6)
    params = init_model(model, jax.random.PRNGKey(3), 10, 40)
    norm = {"state_mean": np.zeros(6, np.float32),
            "state_std": np.ones(6, np.float32)}
    path = save_checkpoint(tmp_path / "best_model.pt", params=params,
                           norm_stats=norm)
    pred = Predictor(model, model_path=str(path), k_neighbors=4)
    assert pred.norm_stats is not None
    pos = rng.randn(10, 3).astype(np.float32)
    vel = rng.randn(10, 3).astype(np.float32)
    p1, _ = pred.predict_single(pos, vel, np.ones(10, np.float32))
    np.testing.assert_allclose(p1, pos, atol=1e-5)  # zero-init identity


def test_compare_with_hpc_contract(zero_predictor, rng):
    t, n = 15, 10
    traj = {
        "positions": np.cumsum(rng.randn(t, n, 3), axis=0),
        "velocities": rng.randn(t, n, 3),
        "masses": rng.uniform(1e10, 1e12, n).astype(np.float32),
    }
    result = compare_with_hpc(zero_predictor, traj, start_step=5,
                              n_prediction_steps=8)
    assert result["position_rmse"].shape == (9,)  # start state + 8 steps
    assert result["position_rmse"][0] == pytest.approx(0.0, abs=1e-5)
    assert "mean_position_rmse" in result
    assert "final_velocity_rmse" in result
    # Stationary prediction vs moving truth: error grows.
    assert result["position_rmse"][-1] > result["position_rmse"][1] * 0.5


@pytest.mark.slow
def test_rollout_at_bh_regime_n():
    """Predictor works at BH-regime N (k-NN takes the row-blocked path:
    O(block*N) memory, not the 16+ MB-per-step dense matrix at N=2048) —
    zero-init params make the rollout exactly stationary, which pins
    correctness of the large-N graph build inside the scanned rollout.
    The reference's any-N equivalent is a host cKDTree per step
    (predict.py:54-91)."""
    import nbody_gnn_hpc_tpu.ops.knn as knn_mod

    n, k, steps = 2048 + 37, 8, 3  # odd N: ragged final k-NN block
    assert n > knn_mod.KNN_DENSE_MAX  # the test exercises the blocked path
    model = NBodyGNN(node_input_dim=7, hidden_dim=8, n_layers=1,
                     output_dim=6, dropout=0.0, remat=False)
    params = init_model(model, jax.random.PRNGKey(0), n, n * k)
    pred = Predictor(model, k_neighbors=k, params=params)
    pred.norm_stats = {"state_mean": np.zeros(6, np.float32),
                       "state_std": np.ones(6, np.float32)}
    rng = np.random.RandomState(11)
    pos = rng.randn(n, 3).astype(np.float32) * 5.0
    vel = rng.randn(n, 3).astype(np.float32)
    masses = rng.uniform(1e10, 1e12, n).astype(np.float32)
    out = pred.predict_rollout(pos, vel, masses, n_steps=steps)
    assert out["positions"].shape == (steps + 1, n, 3)  # initial + steps
    np.testing.assert_allclose(out["positions"][-1], pos, atol=1e-5)
    np.testing.assert_allclose(out["velocities"][-1], vel, atol=1e-5)
