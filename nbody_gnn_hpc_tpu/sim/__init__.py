"""Physics engine layer (reference parity: ``src/hpc/__init__.py:2-4``)."""

from nbody_gnn_hpc_tpu.sim.energy import (kinetic_energy, potential_energy,
                                          total_energy, total_momentum)
from nbody_gnn_hpc_tpu.sim.forces import (G, SOFTENING, accelerations,
                                          blocked_accelerations,
                                          pairwise_accelerations)
from nbody_gnn_hpc_tpu.sim.initial_conditions import (random_initial_conditions,
                                                      shared_masses)
from nbody_gnn_hpc_tpu.sim.integrator import (Trajectory, leapfrog_step,
                                              rollout_steps, run_trajectory,
                                              run_trajectory_batch)
from nbody_gnn_hpc_tpu.sim.lanes import (lanes_accelerations,
                                         run_trajectory_batch_lanes)
from nbody_gnn_hpc_tpu.sim.reference_f64 import (TrajectoryF64,
                                                 accelerations_f64,
                                                 measure_numpy_baseline,
                                                 protocol_ground_truth,
                                                 simulate_f64,
                                                 total_energy_f64)
from nbody_gnn_hpc_tpu.sim.simulator import (NBodySimulator,
                                             run_parallel_simulations,
                                             trajectory_to_states)
from nbody_gnn_hpc_tpu.sim.state import SimState, make_state


def compute_accelerations_direct(positions, masses, softening=SOFTENING):
    """Reference-named alias (``src/hpc/nbody.py:22-66``) for the dispatching
    force kernel; accepts/returns numpy or jax arrays."""
    import jax.numpy as jnp

    return accelerations(jnp.asarray(positions), jnp.asarray(masses), softening)


def compute_total_energy(positions, velocities, masses, softening=SOFTENING):
    """Reference-named alias (``src/hpc/nbody.py:101-130``): returns
    (kinetic, potential, total) floats."""
    import jax.numpy as jnp

    ke, pe, te = total_energy(jnp.asarray(positions), jnp.asarray(velocities),
                              jnp.asarray(masses), softening)
    return float(ke), float(pe), float(te)


__all__ = [
    "G", "SOFTENING", "SimState", "Trajectory", "NBodySimulator",
    "accelerations", "pairwise_accelerations", "blocked_accelerations",
    "compute_accelerations_direct", "compute_total_energy",
    "kinetic_energy", "potential_energy", "total_energy", "total_momentum",
    "leapfrog_step", "run_trajectory", "run_trajectory_batch", "rollout_steps",
    "lanes_accelerations", "run_trajectory_batch_lanes",
    "random_initial_conditions", "shared_masses", "make_state",
    "trajectory_to_states", "run_parallel_simulations",
    "TrajectoryF64", "accelerations_f64", "simulate_f64", "total_energy_f64",
    "protocol_ground_truth", "measure_numpy_baseline",
]
