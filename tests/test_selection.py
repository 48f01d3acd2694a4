"""Rollout-aware checkpoint selection: ranking correctness, cache reuse,
NaN handling (predict/selection.py — beyond-reference capability motivated
by the measured val-loss/rollout anticorrelation, RESULTS.md)."""

import jax
import numpy as np
import pytest

from nbody_gnn_hpc_tpu.io import save_checkpoint
from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
from nbody_gnn_hpc_tpu.predict import (discover_checkpoints,
                                       score_checkpoints, select_checkpoint)

N, K, HID = 10, 4, 16


@pytest.fixture(scope="module")
def model():
    return NBodyGNN(node_input_dim=7, hidden_dim=HID, n_layers=2,
                    output_dim=6, dropout=0.0)


@pytest.fixture(scope="module")
def ckpts(model, tmp_path_factory):
    """Two checkpoints sharing norm stats: zero-init (identity rollout) and
    a noise-perturbed copy (nonzero deltas), plus one with different stats."""
    d = tmp_path_factory.mktemp("sel_ckpts")
    stats = {"state_mean": np.zeros(6, np.float32),
             "state_std": np.ones(6, np.float32)}
    params = init_model(model, jax.random.PRNGKey(0), N, N * K)
    noisy = jax.tree_util.tree_map(
        lambda l: l + 0.1 * np.random.RandomState(7).randn(
            *l.shape).astype(np.asarray(l).dtype), params)
    paths = [d / "checkpoint_epoch_10.pt", d / "best_model.pt"]
    save_checkpoint(paths[0], params=params, norm_stats=stats)
    save_checkpoint(paths[1], params=noisy, norm_stats=stats)
    other_stats = {"state_mean": np.full(6, 0.5, np.float32),
                   "state_std": np.full(6, 2.0, np.float32)}
    save_checkpoint(d / "final_model.pt", params=params,
                    norm_stats=other_stats)
    return d, paths


@pytest.fixture(scope="module")
def val_states(rng_module):
    """(S=2, T=12, N, 6) trajectories constant in time — the identity
    (zero-init) model scores ~0 rollout error on them."""
    state = rng_module.randn(2, 1, N, 6).astype(np.float32)
    return np.repeat(state, 12, axis=1)


@pytest.fixture(scope="module")
def rng_module():
    return np.random.RandomState(3)


def test_identity_beats_perturbed(model, ckpts, val_states):
    _, paths = ckpts
    masses = np.random.RandomState(1).uniform(1e10, 1e12, N).astype(
        np.float32)
    beats = []
    scores = score_checkpoints(model, paths, val_states, masses,
                               k_neighbors=K, horizon=5, start_step=2,
                               progress_cb=lambda: beats.append(1))
    # one stall-watchdog beat per fully-scored checkpoint
    assert len(beats) == len(paths)
    assert [s["path"] for s in scores] == [str(p) for p in paths]
    assert scores[0]["position_rmse"] < 1e-3          # identity: ~exact
    assert scores[1]["position_rmse"] > scores[0]["position_rmse"]
    best = select_checkpoint(scores)
    assert best["path"] == str(paths[0])


def test_different_norm_stats_rescore_cleanly(model, ckpts, val_states):
    """A checkpoint with different norm stats invalidates the compiled
    cache and still scores finite (the jitted step closes over mean/std)."""
    d, paths = ckpts
    masses = np.full(N, 1e11, np.float32)
    scores = score_checkpoints(model, [paths[0], d / "final_model.pt"],
                               val_states, masses, k_neighbors=K,
                               horizon=4, start_step=0)
    assert all(np.isfinite(s["position_rmse"]) for s in scores)


def test_mixed_quantized_checkpoints_rescore_cleanly(model, ckpts,
                                                     val_states, tmp_path):
    """An int8 serving checkpoint interleaved with f32 ones invalidates the
    compiled cache (the jitted step specializes on the quantization mode)
    and scores close to its f32 source."""
    from nbody_gnn_hpc_tpu.predict import quantize_checkpoint

    _, paths = ckpts
    q = tmp_path / "best_model.int8.pt"
    quantize_checkpoint(str(paths[1]), str(q), "int8")
    masses = np.full(N, 1e11, np.float32)
    scores = score_checkpoints(model, [paths[1], q, paths[0]], val_states,
                               masses, k_neighbors=K, horizon=4,
                               start_step=0)
    assert all(np.isfinite(s["position_rmse"]) for s in scores)
    # int8 tracks its f32 source, not the identity checkpoint
    f32, int8, ident = (s["position_rmse"] for s in scores)
    assert abs(int8 - f32) < 0.5 * abs(f32 - ident) + 1e-6


def test_discover_orders_epochs_then_named(ckpts):
    d, _ = ckpts
    found = [p.name for p in discover_checkpoints(d)]
    assert found == ["checkpoint_epoch_10.pt", "best_model.pt",
                     "final_model.pt"]


def test_select_rejects_nan():
    scores = [{"path": "a", "position_rmse": float("nan")},
              {"path": "b", "position_rmse": 5.0}]
    assert select_checkpoint(scores)["path"] == "b"


def test_horizon_bounds_checked(model, ckpts, val_states):
    _, paths = ckpts
    masses = np.full(N, 1e11, np.float32)
    with pytest.raises(ValueError, match="horizon"):
        score_checkpoints(model, paths, val_states, masses, k_neighbors=K,
                          horizon=50, start_step=5)


def test_default_horizon_is_full(model, ckpts, val_states):
    """horizon=None scores at T - start_step - 1 (the measured-honest
    default: short horizons mispredict full-horizon ranking)."""
    _, paths = ckpts
    masses = np.full(N, 1e11, np.float32)
    full = score_checkpoints(model, [paths[0]], val_states, masses,
                             k_neighbors=K, start_step=2)
    explicit = score_checkpoints(model, [paths[0]], val_states, masses,
                                 k_neighbors=K,
                                 horizon=val_states.shape[1] - 3,
                                 start_step=2)
    assert full[0]["position_rmse"] == explicit[0]["position_rmse"]
