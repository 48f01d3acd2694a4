"""Time-reversibility of the KDK leapfrog (sim/integrator.py).

A symplectic KDK step is exactly time-reversible in exact arithmetic:
integrating forward n steps, negating velocities, and integrating n more
steps with the SAME stepper must retrace the trajectory back to the
initial state (accelerations depend only on positions, so the reversed
run recomputes the identical force sequence in reverse). This pins the
integrator's structure independently of the energy-drift and
numpy-oracle tests (tests/test_integrator.py): a subtly wrong update
order (e.g. leapfrog variants that are stable but not reversible, or a
force evaluated at the wrong position) can pass bounded-drift checks yet
fail reversal. Reference stepper semantics: src/hpc/nbody.py:202-218.

Tolerances reflect f32 round-off accumulated over 2 x n steps — the
production dtype; the property itself is dtype-independent.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody_gnn_hpc_tpu.sim import accelerations, make_state, run_trajectory

SOFT = 0.1  # softened: no unresolved hard scatterings (test_integrator.py)


def _state(pos, vel, m):
    acc = accelerations(jnp.asarray(pos, jnp.float32),
                        jnp.asarray(m, jnp.float32), softening=SOFT)
    return make_state(pos, vel, m, accelerations=acc)


@pytest.mark.parametrize("n_steps", [8, 50])
def test_kdk_round_trip_recovers_initial_state(rng, n_steps):
    n = 16
    pos = ((rng.rand(n, 3) - 0.5) * 10.0).astype(np.float32)
    vel = ((rng.rand(n, 3) - 0.5) * 1.0).astype(np.float32)
    m = rng.uniform(1e10, 1e12, n).astype(np.float32)
    dt = 1e-3

    fwd = run_trajectory(_state(pos, vel, m), dt, n_steps, softening=SOFT)
    fin = fwd.final

    back = run_trajectory(
        make_state(fin.positions, -fin.velocities, m,
                   accelerations=fin.accelerations),
        dt, n_steps, softening=SOFT)
    bpos = np.asarray(back.final.positions)
    bvel = np.asarray(back.final.velocities)

    scale_p = np.abs(pos).max()
    scale_v = np.abs(vel).max()
    np.testing.assert_allclose(bpos, pos, atol=5e-4 * scale_p, rtol=0)
    np.testing.assert_allclose(-bvel, vel, atol=5e-3 * scale_v, rtol=0)
