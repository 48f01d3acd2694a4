"""Mesh-sharded ensemble simulation (the datagen hot path).

Replaces the reference's process-pool fan-out (``generate_data.py:143-147``,
one OS process per simulation with thread-pinning guards) with a single
device program: ICs are built host-side with exact RNG parity, stacked into
a (B, N, ...) batch, sharded over the mesh's ``data`` axis, and the whole
ensemble integrates inside one ``vmap``-of-``lax.scan`` jit.  On a v5e-8 the
300-sim production batch is ~38 sims/chip with zero inter-chip traffic
(embarrassingly parallel — no collectives are emitted).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nbody_gnn_hpc_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                             pad_to_multiple)
from nbody_gnn_hpc_tpu.sim.forces import SOFTENING, accelerations
from nbody_gnn_hpc_tpu.sim.initial_conditions import random_initial_conditions
from nbody_gnn_hpc_tpu.sim.integrator import Trajectory, run_trajectory_batch
from nbody_gnn_hpc_tpu.sim.lanes import run_trajectory_batch_lanes
from nbody_gnn_hpc_tpu.sim.state import make_state

# Above this particle count the lanes integrator's (N, N, lanes) force
# planes outgrow HBM-friendly sizes (5 planes x N^2 x 128 lanes x 4 B
# ~= 1.7 GB at N=1024); the vmap path with its large-N kernel dispatch
# takes over.  The production datagen regime (N=200) sits well under it.
LANES_MAX_N = 512


def build_ensemble_state(seeds: Sequence[int], n_particles: int,
                         box_size: float,
                         shared_masses: Optional[np.ndarray] = None,
                         dtype=jnp.float32):
    """Stacked SimState for one sim per seed, reproducing the reference's
    per-sim draws (``generate_data.py:36-47``): ICs from seed, then the
    shared-mass override + acceleration recompute."""
    ps, vs, ms = [], [], []
    for seed in seeds:
        p, v, m = random_initial_conditions(n_particles, box_size=box_size,
                                            seed=int(seed))
        ps.append(p)
        vs.append(v)
        ms.append(shared_masses if shared_masses is not None else m)
    state = make_state(np.stack(ps), np.stack(vs), np.stack(ms), dtype=dtype)
    return state._replace(
        accelerations=jax.vmap(lambda x, m: accelerations(x, m))(
            state.positions, state.masses))


def simulate_ensemble(seeds: Sequence[int],
                      n_particles: int,
                      n_steps: int,
                      box_size: float = 10.0,
                      dt: float = 0.001,
                      save_interval: int = 1,
                      shared_masses: Optional[np.ndarray] = None,
                      softening: float = SOFTENING,
                      mesh=None) -> Trajectory:
    """Run len(seeds) independent sims as one sharded device program.

    Returns a Trajectory whose arrays lead with the sim axis:
    positions (B, n_saves, N, 3), masses (B, N), times/steps (B, n_saves).
    """
    n_sims = len(seeds)
    if mesh is None and len(jax.devices()) > 1:
        mesh = make_mesh()

    state = build_ensemble_state(seeds, n_particles, box_size, shared_masses)

    if mesh is None and n_particles <= LANES_MAX_N:
        # Single device, small-N regime: the sims-in-lanes integrator
        # (sim/lanes.py) is ~1.8x the vmap formulation at the production
        # batch shape.  Large N stays on the vmap path, whose force kernel
        # dispatches to the blocked/Pallas large-N kernels — the lanes
        # force materializes O(N^2 * lanes) planes and would OOM there.
        return run_trajectory_batch_lanes(state, dt, n_steps, save_interval,
                                          softening)

    if mesh is not None:
        n_dev = mesh.devices.size
        pad = pad_to_multiple(n_sims, n_dev) - n_sims
        if pad:
            state = jax.tree_util.tree_map(
                lambda x: jnp.concatenate(
                    [x, jnp.repeat(x[-1:], pad, axis=0)]), state)
        sharding = batch_sharding(mesh)
        state = jax.device_put(state, sharding)

    traj = run_trajectory_batch(state, dt, n_steps, save_interval, softening)

    if mesh is not None and pad:
        traj = jax.tree_util.tree_map(lambda x: x[:n_sims], traj)
    return traj


def trajectory_slice(traj: Trajectory, i: int) -> Trajectory:
    """Per-sim view of an ensemble Trajectory (for persistence)."""
    return Trajectory(
        positions=traj.positions[i], velocities=traj.velocities[i],
        accelerations=traj.accelerations[i], masses=traj.masses[i],
        times=traj.times[i], steps=traj.steps[i],
        final=None if traj.final is None else jax.tree_util.tree_map(
            lambda x: x[i], traj.final))
