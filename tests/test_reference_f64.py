"""Float64 reference-protocol oracle: self-consistency, invariants, and
bounded f32-vs-f64 drift (VERDICT round 1, items 1 and 10 context).

The oracle (`sim/reference_f64.py`) reproduces the reference's f64 KDK
semantics (nbody.py:179-218) so accuracy claims are apples-to-apples with
the published RMSE. These tests pin:
  * agreement with the independent per-step NumPy stepper used by the
    integrator tests (different code path, same math);
  * symplectic invariants (momentum exact, energy drift bounded);
  * the f32 device path tracking the f64 oracle within a drift envelope at
    short horizons (the chaotic system forbids long-horizon pointwise bounds);
  * protocol shape/seed contract of `protocol_ground_truth`.
"""

import jax.numpy as jnp
import numpy as np

from nbody_gnn_hpc_tpu.sim import (accelerations_f64, make_state,
                                   protocol_ground_truth,
                                   random_initial_conditions, run_trajectory,
                                   simulate_f64, total_energy_f64)
from tests.test_forces import numpy_reference_accels
from tests.test_integrator import numpy_kdk_run


def test_f64_accels_match_independent_formula(rng):
    pos = (rng.rand(24, 3) - 0.5) * 10.0
    m = rng.uniform(1e10, 1e12, 24)
    got = accelerations_f64(pos, m)
    want = numpy_reference_accels(pos, m)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_f64_sim_matches_stepwise_kdk(rng):
    pos, vel = (rng.rand(16, 3) - 0.5) * 10.0, (rng.rand(16, 3) - 0.5)
    m = rng.uniform(1e10, 1e12, 16)
    traj = simulate_f64(pos, vel, m, dt=1e-3, n_steps=25)
    ref = numpy_kdk_run(pos, vel, m, 1e-3, 25)
    for t in (0, 1, 10, 25):
        np.testing.assert_allclose(traj.positions[t], ref[t][0], rtol=1e-12)
        np.testing.assert_allclose(traj.velocities[t], ref[t][1], rtol=1e-12)


def test_f64_momentum_exactly_conserved(rng):
    """Newton's 3rd law holds to f64 roundoff over the whole trajectory."""
    pos, vel, m = random_initial_conditions(32, 10.0, seed=7)
    traj = simulate_f64(pos, vel, m, dt=1e-3, n_steps=50)
    p = np.einsum("n,tnk->tk", m, traj.velocities)
    p_scale = np.abs(m[:, None] * traj.velocities[0]).sum()
    drift = np.abs(p - p[0]).max() / p_scale
    assert drift < 1e-12, drift


def test_f64_energy_drift_bounded_well_separated(rng):
    """With well-separated particles (no close encounters) the symplectic
    integrator keeps relative energy drift tiny."""
    n = 12
    grid = np.asarray(np.meshgrid(*[np.arange(0.0, 60.0, 20.0)] * 3))
    pos = grid.reshape(3, -1).T[:n].copy()  # 27 lattice sites, take 12
    vel = (rng.rand(n, 3) - 0.5) * 0.01
    m = np.full(n, 1e10)
    traj = simulate_f64(pos, vel, m, dt=1e-3, n_steps=200)
    e0 = total_energy_f64(traj.positions[0], traj.velocities[0], m)[2]
    e1 = total_energy_f64(traj.positions[-1], traj.velocities[-1], m)[2]
    assert abs(e1 - e0) / abs(e0) < 1e-6


def test_f32_device_tracks_f64_oracle_short_horizon(rng):
    """Drift bound: the f32 path follows the f64 oracle at short horizons.

    This is the integrator-parity test VERDICT item 1 asks for: same ICs,
    same dt, 20 steps; relative position error must stay at the f32
    roundoff-accumulation level, far below the published RMSE scale.
    """
    pos, vel, m = random_initial_conditions(64, 10.0, seed=123)
    dt, n_steps = 1e-3, 20
    f64 = simulate_f64(pos, vel, m, dt, n_steps)

    state = make_state(pos, vel, m)
    state = state._replace(
        accelerations=jnp.asarray(accelerations_f64(pos, m), jnp.float32))
    f32 = run_trajectory(state, dt, n_steps)

    pos_scale = np.abs(f64.positions).max()
    rel = np.abs(np.asarray(f32.positions, np.float64)
                 - f64.positions).max() / pos_scale
    # f32 has ~1e-7 relative precision; 20 chaotic steps amplify a little.
    assert rel < 5e-4, rel


def test_protocol_ground_truth_contract():
    """Shapes, dtypes, determinism, and the seed→IC mapping of the
    published protocol (evaluate.py:76-99)."""
    pos, vel, masses = protocol_ground_truth(n_test_sims=2, n_particles=24,
                                             n_steps=8, seed=9999)
    assert pos.shape == (2, 9, 24, 3) and pos.dtype == np.float64
    assert vel.shape == (2, 9, 24, 3)
    assert masses.dtype == np.float32

    # Sim i starts from the seed-(9999+i) IC stream.
    ic_pos, ic_vel, _ = random_initial_conditions(24, 10.0, seed=10000)
    np.testing.assert_array_equal(pos[1, 0], ic_pos)
    np.testing.assert_array_equal(vel[1, 0], ic_vel)

    pos2, _, _ = protocol_ground_truth(n_test_sims=2, n_particles=24,
                                       n_steps=8, seed=9999)
    np.testing.assert_array_equal(pos, pos2)
