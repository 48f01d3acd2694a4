"""KDK leapfrog integration inside ``lax.scan``.

The reference advances one step per Python call (``NBodySimulator.step``,
``src/hpc/nbody.py:202-218``) and accumulates a Python list of state dicts
(``run``, ``nbody.py:220-248``).  Here the entire trajectory is a single
compiled device program: kick-drift-kick fused with the force kernel inside
``lax.scan``, returning stacked ``(n_saves, N, 3)`` arrays.  ``vmap`` over the
leading axis batches independent simulations; sharding the batch axis over a
mesh spreads them across chips (see :mod:`nbody_gnn_hpc_tpu.parallel`).
"""

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from nbody_gnn_hpc_tpu.sim.forces import SOFTENING, accelerations
from nbody_gnn_hpc_tpu.sim.state import SimState


class Trajectory(NamedTuple):
    """Stacked saved states: arrays lead with the save axis ``(n_saves, ...)``.

    Mirrors the per-sim dict produced by the reference datagen worker
    (``generate_data.py:51-58``): positions, velocities, accelerations,
    masses (static), times, steps.
    """

    positions: jnp.ndarray      # (n_saves, N, 3)
    velocities: jnp.ndarray     # (n_saves, N, 3)
    accelerations: jnp.ndarray  # (n_saves, N, 3)
    masses: jnp.ndarray         # (N,)
    times: jnp.ndarray          # (n_saves,)
    steps: jnp.ndarray          # (n_saves,)
    # Simulator state after ALL n_steps, including the trailing partial
    # save interval that is integrated but not saved (reference semantics:
    # nbody.py:237-241 advances every step, saving only multiples).
    final: SimState = None

    @property
    def n_steps(self) -> int:
        """Number of saved states (the reference stores len(states) under the
        slightly misleading key ``n_steps`` — ``generate_data.py:57``)."""
        return self.positions.shape[0]


def leapfrog_step(state: SimState, dt: float,
                  accel_fn: Callable = accelerations,
                  softening: float = SOFTENING) -> SimState:
    """One KDK step, matching ``NBodySimulator.step`` (``nbody.py:202-218``):
    v += dt/2 a;  x += dt v;  a = F(x)/m;  v += dt/2 a."""
    dt = jnp.asarray(dt, state.positions.dtype)
    v_half = state.velocities + 0.5 * dt * state.accelerations
    x_new = state.positions + dt * v_half
    a_new = accel_fn(x_new, state.masses, softening)
    v_new = v_half + 0.5 * dt * a_new
    return SimState(
        positions=x_new,
        velocities=v_new,
        accelerations=a_new,
        masses=state.masses,
        time=state.time + dt,
        step=state.step + 1,
    )


@partial(jax.jit, static_argnames=("n_steps", "save_interval", "softening"))
def run_trajectory(state: SimState, dt, n_steps: int,
                   save_interval: int = 1,
                   softening: float = SOFTENING) -> Trajectory:
    """Run ``n_steps`` leapfrog steps, saving every ``save_interval`` steps.

    Save cadence matches ``NBodySimulator.run`` (``nbody.py:232-241``): the
    initial state is saved, then every state whose 1-based step index is a
    multiple of ``save_interval`` — trailing partial intervals are dropped,
    so n_saves = 1 + n_steps // save_interval.

    The trailing ``n_steps % save_interval`` steps are integrated but not
    saved (reference semantics nbody.py:237-241); the fully-advanced state
    is returned as ``Trajectory.final``.

    Structure: an outer ``lax.scan`` over save points, each iteration
    running ``save_interval`` fused steps via an inner ``lax.scan``, plus a
    tail scan.  The whole trajectory compiles to one device program.
    """
    n_saves = n_steps // save_interval
    tail = n_steps - n_saves * save_interval

    def inner(carry, _):
        return leapfrog_step(carry, dt, softening=softening), None

    def outer(carry, _):
        carry, _ = jax.lax.scan(inner, carry, None, length=save_interval)
        return carry, (carry.positions, carry.velocities, carry.accelerations,
                       carry.time, carry.step)

    final, (xs, vs, accs, ts, ks) = jax.lax.scan(outer, state, None, length=n_saves)
    if tail:
        final, _ = jax.lax.scan(inner, final, None, length=tail)
    # Prepend the initial state (reference saves it before stepping).
    return Trajectory(
        positions=jnp.concatenate([state.positions[None], xs], axis=0),
        velocities=jnp.concatenate([state.velocities[None], vs], axis=0),
        accelerations=jnp.concatenate([state.accelerations[None], accs], axis=0),
        masses=state.masses,
        times=jnp.concatenate([state.time[None], ts], axis=0),
        steps=jnp.concatenate([state.step[None], ks], axis=0),
        final=final,
    )


# Batched form: vmap over a leading simulation axis on every SimState field.
run_trajectory_batch = jax.jit(
    jax.vmap(run_trajectory, in_axes=(0, None, None, None, None)),
    static_argnames=("n_steps", "save_interval", "softening"),
)


@partial(jax.jit, static_argnames=("n_steps", "softening"))
def rollout_steps(state: SimState, dt, n_steps: int,
                  softening: float = SOFTENING) -> SimState:
    """Advance ``n_steps`` without saving intermediates (fast-forward)."""
    def body(carry, _):
        return leapfrog_step(carry, dt, softening=softening), None

    final, _ = jax.lax.scan(body, state, None, length=n_steps)
    return final
