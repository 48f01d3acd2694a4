"""Leapfrog integrator: semantics vs an independent float64 stepper,
energy-drift bounds, momentum conservation, save-interval cadence.
"""

import jax.numpy as jnp
import numpy as np

from nbody_gnn_hpc_tpu.sim import (SOFTENING, leapfrog_step, make_state,
                                   run_trajectory, total_energy,
                                   total_momentum)
from tests.test_forces import numpy_reference_accels


def numpy_kdk_run(pos, vel, m, dt, n_steps):
    """Independent float64 KDK stepper (reference semantics nbody.py:202-218)."""
    pos, vel = pos.copy(), vel.copy()
    acc = numpy_reference_accels(pos, m)
    out = [(pos.copy(), vel.copy())]
    for _ in range(n_steps):
        vel += 0.5 * dt * acc
        pos += dt * vel
        acc = numpy_reference_accels(pos, m)
        vel += 0.5 * dt * acc
        out.append((pos.copy(), vel.copy()))
    return out


def small_system(rng, n=16):
    pos = (rng.rand(n, 3) - 0.5) * 10.0
    vel = (rng.rand(n, 3) - 0.5) * 1.0
    m = rng.uniform(1e10, 1e12, n)
    return pos, vel, m


def test_matches_numpy_kdk_short_horizon(rng):
    pos, vel, m = small_system(rng)
    dt, n_steps = 1e-3, 20
    ref = numpy_kdk_run(pos, vel, m, dt, n_steps)

    state = make_state(pos, vel, m)
    state = state._replace(accelerations=jnp.asarray(
        numpy_reference_accels(pos, m), jnp.float32))
    traj = run_trajectory(state, dt, n_steps)

    got_pos = np.asarray(traj.positions)
    got_vel = np.asarray(traj.velocities)
    for t in [0, 1, 5, n_steps]:
        np.testing.assert_allclose(got_pos[t], ref[t][0], rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(got_vel[t], ref[t][1], rtol=2e-3, atol=1e-3)


def test_energy_drift_bounded_softened(rng):
    """Symplectic leapfrog: bounded energy error over 400 steps (SURVEY §4a).

    Uses softening=0.1 so no unresolved hard scatterings occur — with the
    production softening of 1e-9 a random system undergoes close encounters
    that physically inject energy error at dt=1e-3 (the reference has the
    same behavior; its trajectories blow up to ~1e5, RESULTS_ANALYSIS.md:33-36).
    """
    pos, vel, m = small_system(rng, n=32)
    from nbody_gnn_hpc_tpu.sim import accelerations

    soft = 0.1
    state = make_state(pos, vel, m)
    state = state._replace(
        accelerations=accelerations(state.positions, state.masses, soft))
    traj = run_trajectory(state, 1e-3, 400, softening=soft)
    _, _, e = total_energy(traj.positions, traj.velocities,
                           traj.masses[None, :].repeat(traj.n_steps, 0),
                           softening=soft)
    e = np.asarray(e, dtype=np.float64)
    rel = np.abs((e - e[0]) / e[0])
    assert rel.max() < 0.01, f"energy drift {rel.max():.3%}"


def test_two_body_orbit_energy_and_closure():
    """Closed-form Kepler oracle: equal-mass circular binary conserves energy
    and returns near its start after one period."""
    from nbody_gnn_hpc_tpu.sim import G, accelerations

    m_each, r = 1e12, 2.0
    m = np.array([m_each, m_each])
    pos = np.array([[-r / 2, 0, 0], [r / 2, 0, 0]])
    # Circular speed for equal-mass binary of separation r: v = sqrt(G m / (2 r)).
    v = np.sqrt(G * m_each / (2 * r))
    vel = np.array([[0, -v, 0], [0, v, 0]])
    period = 2 * np.pi * (r / 2) / v
    n_steps = 2000
    dt = period / n_steps

    state = make_state(pos, vel, m)
    state = state._replace(
        accelerations=accelerations(state.positions, state.masses))
    traj = run_trajectory(state, dt, n_steps)

    _, _, e = total_energy(traj.positions, traj.velocities,
                           traj.masses[None, :].repeat(traj.n_steps, 0))
    e = np.asarray(e, dtype=np.float64)
    assert np.abs((e - e[0]) / e[0]).max() < 1e-3

    end = np.asarray(traj.positions[-1], dtype=np.float64)
    assert np.abs(end - pos).max() < 0.05 * r


def test_momentum_exactly_conserved(rng):
    pos, vel, m = small_system(rng, n=32)
    from nbody_gnn_hpc_tpu.sim import accelerations

    state = make_state(pos, vel, m)
    state = state._replace(
        accelerations=accelerations(state.positions, state.masses))
    traj = run_trajectory(state, 1e-3, 100)
    p = np.asarray(total_momentum(traj.velocities,
                                  traj.masses[None, :].repeat(traj.n_steps, 0)),
                   dtype=np.float64)
    p0_scale = np.abs(m[:, None] * vel).sum()
    drift = np.abs(p - p[0]).max()
    assert drift < 1e-4 * p0_scale


def test_save_interval_cadence(rng):
    """n_saves = 1 + n_steps // save_interval, and saved states equal the
    corresponding per-step states (reference nbody.py:232-241)."""
    pos, vel, m = small_system(rng, n=8)
    from nbody_gnn_hpc_tpu.sim import accelerations

    state = make_state(pos, vel, m)
    state = state._replace(
        accelerations=accelerations(state.positions, state.masses))

    dense = run_trajectory(state, 1e-3, 12, save_interval=1)
    sparse = run_trajectory(state, 1e-3, 12, save_interval=4)
    assert dense.positions.shape[0] == 13
    assert sparse.positions.shape[0] == 4  # initial + steps 4, 8, 12
    np.testing.assert_allclose(np.asarray(sparse.positions[1]),
                               np.asarray(dense.positions[4]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sparse.positions[3]),
                               np.asarray(dense.positions[12]), rtol=1e-6)
    assert list(np.asarray(sparse.steps)) == [0, 4, 8, 12]


def test_single_step_matches_scan(rng):
    pos, vel, m = small_system(rng, n=8)
    from nbody_gnn_hpc_tpu.sim import accelerations

    state = make_state(pos, vel, m)
    state = state._replace(
        accelerations=accelerations(state.positions, state.masses))
    s1 = leapfrog_step(state, 1e-3)
    traj = run_trajectory(state, 1e-3, 1)
    np.testing.assert_allclose(np.asarray(traj.positions[1]),
                               np.asarray(s1.positions), rtol=1e-7)
    assert int(s1.step) == 1
    np.testing.assert_allclose(float(s1.time), 1e-3, rtol=1e-6)
