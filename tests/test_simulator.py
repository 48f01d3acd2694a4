"""NBodySimulator facade: API parity, RNG-stream parity with the reference's
NumPy draws, factory scenes, state round-trips."""

import numpy as np

from nbody_gnn_hpc_tpu.sim import NBodySimulator, shared_masses


def test_initial_conditions_match_reference_rng_stream():
    """The reference seeds the global RNG then draws positions, velocities,
    masses in order (nbody.py:174-181); our RandomState-based draw must
    produce the identical float64 stream."""
    seed, n, box = 43, 50, 10.0
    np.random.seed(seed)
    want_pos = (np.random.rand(n, 3) - 0.5) * box
    want_vel = (np.random.rand(n, 3) - 0.5) * 0.1 * box
    want_m = np.random.uniform(1e10, 1e12, n)

    sim = NBodySimulator(n_particles=n, box_size=box, seed=seed)
    np.testing.assert_allclose(sim.positions, want_pos.astype(np.float32),
                               rtol=1e-6)
    np.testing.assert_allclose(sim.velocities, want_vel.astype(np.float32),
                               rtol=1e-6)
    np.testing.assert_allclose(sim.masses, want_m.astype(np.float32), rtol=1e-6)


def test_shared_masses_seed42_stream():
    m = shared_masses(200, seed=42)
    rng = np.random.RandomState(42)
    want = rng.uniform(1e10, 1e12, 200).astype(np.float32)
    np.testing.assert_array_equal(m, want)
    assert m.dtype == np.float32


def test_get_set_state_roundtrip():
    sim = NBodySimulator(n_particles=10, box_size=5.0, seed=1)
    sim.run(3, verbose=False)
    state = sim.get_state()
    assert set(state) == {"positions", "velocities", "accelerations",
                          "masses", "time", "step"}
    assert state["step"] == 3

    sim2 = NBodySimulator(n_particles=10, box_size=5.0, seed=2)
    sim2.set_state(state)
    np.testing.assert_allclose(sim2.positions, state["positions"], rtol=1e-7)
    assert sim2.step_count == 3


def test_run_returns_states_and_history():
    sim = NBodySimulator(n_particles=8, box_size=5.0, seed=3)
    states = sim.run(10, save_interval=2, verbose=False)
    assert len(states) == 6  # initial + 5 saves
    assert sim.history is states
    assert states[-1]["step"] == 10


def test_step_equals_run_one(rng):
    a = NBodySimulator(n_particles=8, box_size=5.0, seed=7)
    b = NBodySimulator(n_particles=8, box_size=5.0, seed=7)
    a.step()
    b.run(1, verbose=False)
    np.testing.assert_allclose(a.positions, b.positions, rtol=1e-6)
    np.testing.assert_allclose(a.velocities, b.velocities, rtol=1e-6)


def test_mass_override_and_recompute():
    """Datagen overrides masses post-init and recomputes accelerations
    (generate_data.py:46-47)."""
    sim = NBodySimulator(n_particles=20, box_size=10.0, seed=5)
    m = shared_masses(20, seed=42)
    before = sim.accelerations.copy()
    sim.masses = m
    sim.accelerations = sim._compute_accelerations()
    assert not np.allclose(sim.accelerations, before)
    np.testing.assert_array_equal(sim.masses, m)


def test_solar_system_factory():
    sim = NBodySimulator.create_solar_system()
    assert sim.n_particles == 9
    assert sim.positions.shape == (9, 3)
    # Sun at origin with the dominant mass.
    assert sim.positions[0, 0] == 0.0
    assert sim.masses[0] == np.float32(1.989e30)
    # Earth at 1 AU.
    np.testing.assert_allclose(sim.positions[3, 0], 1.496e11, rtol=1e-5)


def test_galaxy_collision_factory():
    np.random.seed(0)
    sim = NBodySimulator.create_galaxy_collision(n_per_galaxy=50)
    assert sim.n_particles == 100
    # Two streams moving toward each other.
    assert np.all(sim.velocities[:50, 0] > 0)
    assert np.all(sim.velocities[50:, 0] == -2.0)


def test_energy_diagnostic_signs():
    sim = NBodySimulator(n_particles=16, box_size=10.0, seed=11)
    ke, pe, te = sim.get_energy()
    assert ke > 0 and pe < 0
    np.testing.assert_allclose(te, ke + pe, rtol=1e-6)
