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
from nbody_gnn_hpc_tpu.sim.lanes import (planes_to_host, prepare_planes,
                                         run_planes, run_trajectory_batch_lanes,
                                         strip_lane_padding, _pad_lanes)
from nbody_gnn_hpc_tpu.sim.state import SimState, make_state

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


class PlanesEnsemble:
    """Device-resident planes-layout ensemble trajectory.

    The planes-native half of the datagen consumer path: holds the raw
    (n_saves+1, 3N, L) planes stacks straight out of
    :func:`nbody_gnn_hpc_tpu.sim.lanes.run_planes` — no device-side layout
    conversion was paid — plus the per-sim bookkeeping needed to
    reconstruct a standard host Trajectory during the readback.
    """

    def __init__(self, saved, final, initial, state: SimState, dt: float,
                 n_steps: int, save_interval: int, n_sims: int, gm=None):
        self.saved = saved          # (pos, vel, acc) planes stacks, no init
        self.final = final          # (fin_p, fin_v, fin_a) planes
        self.initial = initial      # (p0, v0, a0) planes (the run's inputs)
        self.state = state          # initial batched SimState (bookkeeping)
        self.dt = dt
        self.n_steps = n_steps
        self.save_interval = save_interval
        self.n_sims = n_sims
        self.gm = gm                # (N, L) G*masses planes, for chaining

    def to_host(self) -> Trajectory:
        """Fetch + host-side transpose -> standard NumPy Trajectory.

        Padding lanes are sliced off ON DEVICE (contiguous slice) so dead
        lanes never cross the host link; the from_planes transpose AND the
        initial-state prepend run in NumPy on data the writer already paid
        to read back.
        """
        b = self.n_sims

        def fetch(arr):
            return np.asarray(jax.device_get(strip_lane_padding(arr, b)))

        masses = np.asarray(jax.device_get(self.state.masses))
        t0 = np.asarray(jax.device_get(self.state.time))
        k0 = np.asarray(jax.device_get(self.state.step))
        n_saves = self.n_steps // self.save_interval
        # Keep the standard path's dtypes (times f32, steps i32 — the HDF5
        # schema is a parity surface): arange in the device step dtype and
        # cast the float products back to the device time dtype.
        ks = np.arange(0, n_saves + 1, dtype=k0.dtype) * self.save_interval
        fin = SimState(
            *(planes_to_host(fetch(arr[None]), b)[:, 0]
              for arr in self.final),
            masses=masses,
            time=np.asarray(t0 + self.dt * self.n_steps, t0.dtype),
            step=np.asarray(k0 + self.n_steps, k0.dtype))
        return Trajectory(
            positions=planes_to_host(fetch(self.saved[0]), b,
                                     init=fetch(self.initial[0])),
            velocities=planes_to_host(fetch(self.saved[1]), b,
                                      init=fetch(self.initial[1])),
            accelerations=planes_to_host(fetch(self.saved[2]), b,
                                         init=fetch(self.initial[2])),
            masses=masses,
            times=(t0[:, None]
                   + (self.dt * ks[None, :]).astype(t0.dtype)),
            steps=k0[:, None] + ks[None, :],
            final=fin,
        )


def simulate_ensemble(seeds: Sequence[int],
                      n_particles: int,
                      n_steps: int,
                      box_size: float = 10.0,
                      dt: float = 0.001,
                      save_interval: int = 1,
                      shared_masses: Optional[np.ndarray] = None,
                      softening: float = SOFTENING,
                      mesh=None,
                      layout: str = "standard"):
    """Run len(seeds) independent sims as one sharded device program.

    Returns a Trajectory whose arrays lead with the sim axis:
    positions (B, n_saves, N, 3), masses (B, N), times/steps (B, n_saves).

    ``layout="planes"``: when the single-chip lanes path is taken, return a
    :class:`PlanesEnsemble` instead — the saved trajectory stays in planes
    layout on device (skipping the from_planes transposes, the measured
    ~17% of integrator time) and converts host-side in ``.to_host()``.
    Paths that don't use lanes (mesh-sharded, large N) still return a
    standard Trajectory; use :func:`fetch_host_trajectory` to consume
    either uniformly.
    """
    if layout not in ("standard", "planes"):
        raise ValueError(f"unknown layout {layout!r}")
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
        if layout == "planes":
            planes_in = prepare_planes(state, _pad_lanes(n_sims))
            saved, final = run_planes(*planes_in, dt, n_steps, save_interval,
                                      softening)
            return PlanesEnsemble(saved, final, planes_in[:3], state, dt,
                                  n_steps, save_interval, n_sims,
                                  gm=planes_in[3])
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


def fetch_host_trajectory(obj) -> Trajectory:
    """Uniform host fetch for ``simulate_ensemble`` results: a
    :class:`PlanesEnsemble` converts during the readback; a standard
    Trajectory is simply device_get."""
    if isinstance(obj, PlanesEnsemble):
        return obj.to_host()
    return jax.device_get(obj)


def trajectory_slice(traj: Trajectory, i: int) -> Trajectory:
    """Per-sim view of an ensemble Trajectory (for persistence)."""
    return Trajectory(
        positions=traj.positions[i], velocities=traj.velocities[i],
        accelerations=traj.accelerations[i], masses=traj.masses[i],
        times=traj.times[i], steps=traj.steps[i],
        final=None if traj.final is None else jax.tree_util.tree_map(
            lambda x: x[i], traj.final))
