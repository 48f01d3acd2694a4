"""Metrics parity: independent manual computations of each formula."""

import numpy as np
import pytest

from nbody_gnn_hpc_tpu.utils import (compute_all_metrics, compute_energy_error,
                                     compute_mae, compute_momentum_error,
                                     compute_rmse,
                                     compute_trajectory_divergence,
                                     format_metrics_report)


@pytest.fixture
def traj_pair(rng):
    t, n = 12, 6
    target_pos = np.cumsum(rng.randn(t, n, 3), axis=0)
    target_vel = rng.randn(t, n, 3)
    pred_pos = target_pos + 0.1 * rng.randn(t, n, 3)
    pred_vel = target_vel + 0.1 * rng.randn(t, n, 3)
    masses = rng.uniform(1e10, 1e12, n)
    return pred_pos, pred_vel, target_pos, target_vel, masses


def test_rmse_mae(traj_pair):
    p, _, t, _, _ = traj_pair
    np.testing.assert_allclose(compute_rmse(p, t),
                               np.sqrt(np.mean((p - t) ** 2)))
    np.testing.assert_allclose(compute_mae(p, t), np.mean(np.abs(p - t)))
    per = compute_rmse(p, t, per_particle=True)
    assert per.shape == (p.shape[1],)
    np.testing.assert_allclose(per[0],
                               np.sqrt(np.mean((p[:, 0] - t[:, 0]) ** 2)))


def test_energy_error_manual(traj_pair):
    p, v, _, _, m = traj_pair
    G, soft = 6.67430e-11, 1e-9
    energies, err = compute_energy_error(p, v, m)
    # Manual energy at t=0.
    ke = 0.5 * np.sum(m * np.sum(v[0] ** 2, axis=1))
    pe = 0.0
    n = len(m)
    for i in range(n):
        for j in range(i + 1, n):
            r = np.sqrt(np.sum((p[0, j] - p[0, i]) ** 2) + soft ** 2)
            pe -= G * m[i] * m[j] / r
    np.testing.assert_allclose(energies[0], ke + pe, rtol=1e-10)
    want_err = np.max(np.abs((energies - energies[0]) / energies[0]))
    assert err == pytest.approx(want_err)


def test_momentum_error_manual(traj_pair):
    _, v, _, _, m = traj_pair
    mags, err = compute_momentum_error(v, m)
    want0 = np.linalg.norm((m[:, None] * v[0]).sum(0))
    np.testing.assert_allclose(mags[0], want0, rtol=1e-10)
    assert mags.shape == (v.shape[0],)
    assert err >= 0


def test_trajectory_divergence(traj_pair):
    p, _, t, _, _ = traj_pair
    d = compute_trajectory_divergence(p, t)
    assert set(d) == {"mean_rmse", "final_rmse", "mean_distance",
                      "max_distance", "divergence_rate",
                      "distances_per_step"}
    assert len(d["distances_per_step"]) == p.shape[0]
    dist_last = np.sqrt(np.sum((p[-1] - t[-1]) ** 2, axis=-1))
    np.testing.assert_allclose(d["final_rmse"],
                               np.sqrt(np.mean(dist_last ** 2)))


def test_all_metrics_and_report(traj_pair):
    metrics = compute_all_metrics(*traj_pair)
    for key in ["position_rmse", "position_mae", "velocity_rmse",
                "velocity_mae", "trajectory_final_rmse",
                "predicted_energy_error", "target_energy_error",
                "predicted_momentum_error", "target_momentum_error"]:
        assert key in metrics, key
    report = format_metrics_report(metrics)
    assert "N-BODY PREDICTION ACCURACY REPORT" in report
    assert "PHYSICS CONSERVATION" in report


def test_all_metrics_nan_fallback(rng):
    """Zero masses make energy normalization blow up -> NaN fallback path
    must not raise (parity: metrics.py:215-236)."""
    t, n = 4, 3
    p = rng.randn(t, n, 3)
    v = rng.randn(t, n, 3)
    metrics = compute_all_metrics(p, v, p, v, np.zeros(n))
    assert "position_rmse" in metrics
