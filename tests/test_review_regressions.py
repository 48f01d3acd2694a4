"""Regressions for code-review findings (round 1)."""

import pytest
import numpy as np

from nbody_gnn_hpc_tpu.sim import NBodySimulator, run_trajectory


def test_partial_save_interval_still_integrates_all_steps(rng):
    """run_trajectory(10, save_interval=3) must advance the full 10 steps
    (reference nbody.py:237-241 integrates every step, saves multiples)."""
    sim = NBodySimulator(n_particles=8, box_size=5.0, seed=1)
    traj = run_trajectory(sim.state, 1e-3, 10, save_interval=3)
    # Saves: initial + steps 3, 6, 9.
    assert list(np.asarray(traj.steps)) == [0, 3, 6, 9]
    # Final state advanced through step 10.
    assert int(traj.final.step) == 10
    np.testing.assert_allclose(float(traj.final.time), 0.010, rtol=1e-5)


def test_simulator_run_advances_with_large_save_interval():
    """Verbose run() with save_interval > n_steps//10 used to silently
    integrate zero steps per chunk."""
    a = NBodySimulator(n_particles=8, box_size=5.0, seed=2)
    b = NBodySimulator(n_particles=8, box_size=5.0, seed=2)
    states_v = a.run(100, save_interval=20, verbose=True)
    states_q = b.run(100, save_interval=20, verbose=False)
    assert a.step_count == 100
    assert b.step_count == 100
    assert len(states_v) == len(states_q) == 6
    np.testing.assert_allclose(a.positions, b.positions, rtol=1e-6)
    np.testing.assert_allclose(states_v[-1]["positions"],
                               states_q[-1]["positions"], rtol=1e-6)


def test_run_partial_tail_matches_stepwise():
    """run(10, save_interval=3) ends at the same state as 10 explicit
    step() calls."""
    a = NBodySimulator(n_particles=8, box_size=5.0, seed=3)
    b = NBodySimulator(n_particles=8, box_size=5.0, seed=3)
    a.run(10, save_interval=3, verbose=False)
    for _ in range(10):
        b.step()
    assert a.step_count == b.step_count == 10
    np.testing.assert_allclose(a.positions, b.positions, rtol=1e-5)


@pytest.mark.slow
def test_validation_covers_tail_samples(tmp_path, rng):
    """Val loss includes the final partial batch (reference's non-drop_last
    loader, train.py:448-467)."""
    from nbody_gnn_hpc_tpu.io import create_training_dataset
    from nbody_gnn_hpc_tpu.models import NBodyGNN
    from nbody_gnn_hpc_tpu.train import GNNDataset, Trainer

    n_steps, n = 32, 6
    def mk(seed, path):
        r = np.random.RandomState(seed)
        trajs = [{"positions": np.cumsum(r.randn(n_steps, n, 3), 0),
                  "velocities": r.randn(n_steps, n, 3), "n_steps": n_steps}]
        create_training_dataset(trajs, str(path), sequence_length=5,
                                masses=r.rand(n).astype(np.float32))
        return str(path)

    train = mk(1, tmp_path / "train.h5")
    val = mk(2, tmp_path / "val.h5")  # 27 samples; batch 16 -> 1 full + 11 tail
    ds_t = GNNDataset(train, k_neighbors=3)
    ds_v = GNNDataset(val, k_neighbors=3,
                      external_norm_stats=ds_t.get_normalization_stats())
    model = NBodyGNN(node_input_dim=7, hidden_dim=8, n_layers=1, output_dim=6)
    tr = Trainer(model, ds_t, ds_v, model_dir=str(tmp_path / "m"),
                 batch_size=16, noise_std=0.0)
    loss_with_tail, details = tr.validate()
    assert np.isfinite(loss_with_tail)

    # Manual: equal-weight mean of the full batch and the 11-sample tail.
    import jax.numpy as jnp

    cl = tr._step.compute_loss
    s = jnp.asarray(tr.val_states)
    t = jnp.asarray(tr.val_targets)
    d1 = cl(tr.params, s[:16], t[:16], None, deterministic=True)[1]
    d2 = cl(tr.params, s[16:], t[16:], None, deterministic=True)[1]
    want = (float(d1["total"]) + float(d2["total"])) / 2
    np.testing.assert_allclose(loss_with_tail, want, rtol=1e-5)


def test_from_trajectories_accepts_generator_and_skips_short_first():
    """from_trajectories must materialize iterator inputs (it reads them
    twice) and take masses from the first trajectory that CONTRIBUTED
    samples, not blindly from trajectories[0] (advisor round 2)."""
    from nbody_gnn_hpc_tpu.train import GNNDataset

    r = np.random.RandomState(0)
    short = {"positions": r.randn(3, 5, 3), "velocities": r.randn(3, 5, 3),
             "masses": np.full(5, 123.0)}  # T=3 <= seq_len -> skipped
    good_masses = r.uniform(1.0, 2.0, 5)
    good = {"positions": r.randn(12, 5, 3), "velocities": r.randn(12, 5, 3),
            "masses": good_masses}
    ds = GNNDataset.from_trajectories(
        (t for t in [short, good]), sequence_length=5, k_neighbors=3)
    assert ds.n_samples > 0
    np.testing.assert_array_equal(ds.masses, good_masses)


def test_run_parallel_simulations_large_n_gated_off_lanes(monkeypatch):
    """Seed-only config groups above LANES_MAX_N must NOT batch through the
    lanes integrator (its force kernel materializes O(N^2 * lanes) planes);
    they take the sequential path with large-N kernel dispatch (advisor
    round 2, medium)."""
    import nbody_gnn_hpc_tpu.sim.simulator as simulator_mod
    from nbody_gnn_hpc_tpu.parallel.datagen import LANES_MAX_N
    from nbody_gnn_hpc_tpu.sim.simulator import run_parallel_simulations

    def boom(*a, **k):
        raise AssertionError("lanes integrator called for large-N group")

    monkeypatch.setattr(simulator_mod, "run_trajectory_batch_lanes", boom)
    n = LANES_MAX_N + 8
    configs = [{"init": {"n_particles": n, "box_size": 10.0, "seed": s},
                "run": {"n_steps": 2}} for s in (1, 2)]
    results = run_parallel_simulations(configs)
    assert len(results) == 2
    for states in results:
        assert len(states) == 3  # initial + 2 saves
        assert states[-1]["positions"].shape == (n, 3)

    # and the small-N regime still batches via lanes
    monkeypatch.undo()
    called = {}
    real = simulator_mod.run_trajectory_batch_lanes

    def spy(*a, **k):
        called["yes"] = True
        return real(*a, **k)

    monkeypatch.setattr(simulator_mod, "run_trajectory_batch_lanes", spy)
    small = [{"init": {"n_particles": 8, "box_size": 10.0, "seed": s},
              "run": {"n_steps": 2}} for s in (1, 2)]
    assert len(run_parallel_simulations(small)) == 2
    assert called.get("yes")
