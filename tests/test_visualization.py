"""Visualizer smoke tests: every plot type renders to a file (Agg)."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg", force=True)

from nbody_gnn_hpc_tpu.utils.visualization import Visualizer  # noqa: E402


@pytest.fixture
def viz(tmp_path):
    return Visualizer(str(tmp_path))


@pytest.fixture
def traj(rng):
    return np.cumsum(rng.randn(20, 8, 3), axis=0)


def test_plot_trajectory_3d(viz, traj, tmp_path):
    viz.plot_trajectory_3d(traj, save_name="t.png", show=False)
    assert (tmp_path / "t.png").stat().st_size > 0


def test_plot_comparison(viz, traj, tmp_path):
    viz.plot_comparison(traj, traj + 0.1, save_name="c.png", show=False)
    assert (tmp_path / "c.png").exists()


def test_plot_error_over_time(viz, rng, tmp_path):
    viz.plot_error_over_time(np.abs(rng.randn(30)), np.abs(rng.randn(30)),
                             save_name="e.png", show=False)
    assert (tmp_path / "e.png").exists()


def test_plot_training_history(viz, tmp_path):
    history = {"train_loss": [3.0, 2.0, 1.5], "val_loss": [2.5, 2.0, 1.8],
               "learning_rate": [5e-4, 4e-4, 3e-4]}
    viz.plot_training_history(history, save_name="h.png", show=False)
    assert (tmp_path / "h.png").exists()


def test_plot_energy_conservation(viz, rng, tmp_path):
    e = 1e18 * (1 + 0.01 * rng.randn(40))
    viz.plot_energy_conservation(e, e * 1.01, save_name="en.png", show=False)
    assert (tmp_path / "en.png").exists()


def test_plot_particle_distribution(viz, traj, tmp_path):
    viz.plot_particle_distribution(traj, save_name="d.png", show=False)
    assert (tmp_path / "d.png").exists()


def test_create_animation(viz, traj, tmp_path):
    viz.create_animation(traj[:5], save_name="a.gif")
    assert (tmp_path / "a.gif").stat().st_size > 0
