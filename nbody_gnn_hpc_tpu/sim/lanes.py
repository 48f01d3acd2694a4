"""Sims-in-lanes ensemble integrator — the datagen hot path, 1.8x faster.

The production datagen regime is many small sims (300 x N=200).  The vmap
formulation (`run_trajectory_batch`) puts particles on both sublanes and
lanes of each (N, N) force plane: N=200 pads to 256 lanes (28% waste) and
the per-sim planes are small.  This module instead transposes the ensemble
so that SIMS live on the 128-wide lane axis and particles on sublanes:

    positions (B, N, 3)  ->  planes (3N, B_pad)   [x-block; y-block; z-block]

Every pairwise term is then one (N, B_pad) elementwise plane shared by all
sims — the VPU sees a single large, perfectly-tiled computation regardless
of per-sim N, and the force reduction is a sublane-axis sum XLA keeps in
registers.  Measured on v5e (bench.py harness, 300x400x200): 1.48M ->
2.68M sim-steps/s including the conversion back to standard layout, 3.15M
when consumers take planes directly.

Semantics match `run_trajectory` / `run_trajectory_batch` exactly (same KDK
step as the reference's ``NBodySimulator.step``, ``src/hpc/nbody.py:202-218``,
and the same save cadence as ``run``, ``nbody.py:220-248``); only the f32
summation order differs (per-pair math is identical; reductions associate
differently), which is within the reference's own fastmath tolerance.

Lane padding is exact, not approximate: lanes are fully independent (no
cross-lane arithmetic), so padded sims are dead lanes that cost nothing to
correctness.

Why the MESH path stays on the vmap formulation (parallel/datagen.py): a
sharded lanes layout would give each of 8 chips a 128-lane block holding
only ~38 real sims (300/8), a 3.4x lane-padding waste that cancels the
layout's ~1.8x win (the vmap form wastes only 1.28x on its 200->256 lane
pad). Lanes wins when real sims >= ~0.7 * 128 per device; the production
batch on one chip (300 sims -> 384 lanes, 78% occupancy) is exactly that
regime, a v5e-8 shard (38/128 = 30%) is not.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nbody_gnn_hpc_tpu.sim.forces import G, SOFTENING
from nbody_gnn_hpc_tpu.sim.integrator import Trajectory
from nbody_gnn_hpc_tpu.sim.state import SimState

LANE = 128


def _pad_lanes(b: int) -> int:
    return -(-b // LANE) * LANE


def to_planes(arr: jnp.ndarray, b_pad: int) -> jnp.ndarray:
    """(B, N, 3) -> (3N, b_pad): coordinate blocks stacked on sublanes."""
    b = arr.shape[0]
    t = jnp.moveaxis(arr, 0, 2)                       # (N, 3, B)
    t = jnp.pad(t, ((0, 0), (0, 0), (0, b_pad - b)))
    return jnp.concatenate([t[:, 0], t[:, 1], t[:, 2]], axis=0)


def from_planes(planes: jnp.ndarray, b: int) -> jnp.ndarray:
    """(..., 3N, b_pad) -> (B, ..., N, 3): sims out front, coords last."""
    n = planes.shape[-2] // 3
    lead = planes.ndim - 2
    r = planes.reshape(planes.shape[:-2] + (3, n, planes.shape[-1]))[..., :b]
    # (..., 3, N, B) -> (B, ..., N, 3)
    perm = (r.ndim - 1,) + tuple(range(lead)) + (r.ndim - 2, r.ndim - 3)
    return jnp.transpose(r, perm)


def lanes_accelerations(pos_planes: jnp.ndarray, gm_planes: jnp.ndarray,
                        softening: float = SOFTENING) -> jnp.ndarray:
    """Softened-gravity forces in planes layout.

    Same math as :func:`nbody_gnn_hpc_tpu.sim.forces.pairwise_accelerations`
    (reference kernel ``src/hpc/nbody.py:22-66``), with the pair plane
    spanning (particle, sim) instead of (particle, particle).

    Args:
        pos_planes: (3N, L) position planes.
        gm_planes:  (N, L) pre-multiplied G * masses.
    Returns:
        (3N, L) acceleration planes.
    """
    dtype = pos_planes.dtype
    n = gm_planes.shape[-2]
    soft2 = jnp.asarray(softening, dtype) ** 2
    x, y, z = pos_planes[0:n], pos_planes[n:2 * n], pos_planes[2 * n:]
    # d*[i, j, l] = coord[j, l] - coord[i, l] within each lane l.
    dx = x[None, :, :] - x[:, None, :]
    dy = y[None, :, :] - y[:, None, :]
    dz = z[None, :, :] - z[:, None, :]
    d2 = dx * dx + dy * dy + dz * dz
    inv_r = jax.lax.rsqrt(d2 + soft2)
    f = gm_planes[None, :, :] * (inv_r * inv_r * inv_r)
    # Coincident/self pairs exert zero force; d2>0 is overflow-safe
    # (see forces.pairwise_accelerations).
    f = jnp.where(d2 > 0, f, jnp.zeros((), dtype))
    return jnp.concatenate([jnp.sum(f * dx, axis=1),
                            jnp.sum(f * dy, axis=1),
                            jnp.sum(f * dz, axis=1)], axis=0)


def _integrate_planes(p0, v0, a0, gm, dt, n_steps: int, save_interval: int,
                      softening: float):
    """Traced scan core shared by the standard-layout and planes-native
    entry points: KDK leapfrog in planes layout, reference save cadence
    (initial NOT included in the returned stacks; trailing partial interval
    integrated into ``fin`` but unsaved)."""
    n_saves = n_steps // save_interval
    tail = n_steps - n_saves * save_interval

    def step(carry, _):
        p, v, a = carry
        v_half = v + 0.5 * dt * a
        p_new = p + dt * v_half
        a_new = lanes_accelerations(p_new, gm, softening)
        v_new = v_half + 0.5 * dt * a_new
        return (p_new, v_new, a_new), None

    def outer(carry, _):
        carry, _ = jax.lax.scan(step, carry, None, length=save_interval)
        return carry, carry

    fin, saved = jax.lax.scan(outer, (p0, v0, a0), None, length=n_saves)
    if tail:
        fin, _ = jax.lax.scan(step, fin, None, length=tail)
    return fin, saved


def _state_to_planes(state: SimState, b_pad: int, dtype):
    """(p0, v0, a0, gm) planes for a batched SimState."""
    gm = jnp.pad(jnp.asarray(G, dtype) * state.masses.T.astype(dtype),
                 ((0, 0), (0, b_pad - state.positions.shape[0])))
    return (to_planes(state.positions.astype(dtype), b_pad),
            to_planes(state.velocities.astype(dtype), b_pad),
            to_planes(state.accelerations.astype(dtype), b_pad),
            gm)


@partial(jax.jit, static_argnames=("n_steps", "save_interval", "softening"))
def run_planes(p0, v0, a0, gm, dt, n_steps: int, save_interval: int = 1,
               softening: float = SOFTENING):
    """Planes-NATIVE ensemble integration: no layout conversion anywhere.

    The 3.15M-sim-steps/s path (module docstring): consumers that can take
    planes directly — the chained bench harness, and the datagen writer,
    which transposes host-side during the readback it already pays — skip
    the from_planes transposes entirely.

    Args are planes-layout: p0/v0/a0 (3N, L), gm (N, L); returns
    ``((pos, vel, acc), (fin_p, fin_v, fin_a))`` where the saved stacks are
    (n_saves, 3N, L) WITHOUT the initial state — the caller already holds
    the initial planes (they are the inputs), and prepending on device
    would cost three full-trajectory copies (~2.2 GB of HBM traffic at the
    production shape, a measured ~7% of integrator throughput).  The host
    conversion (:func:`planes_to_host` with ``init=``) prepends during the
    readback instead.  The final triple is the fully-advanced state for
    chaining.
    """
    dt = jnp.asarray(dt, p0.dtype)
    fin, saved = _integrate_planes(p0, v0, a0, gm, dt, n_steps,
                                   save_interval, softening)
    return saved, fin


@partial(jax.jit, static_argnames=("b_pad",))
def prepare_planes(state: SimState, b_pad: int):
    """One-dispatch conversion of a batched SimState to planes inputs."""
    return _state_to_planes(state, b_pad, state.positions.dtype)


@partial(jax.jit, static_argnames=("b",))
def strip_lane_padding(planes: jnp.ndarray, b: int) -> jnp.ndarray:
    """Drop dead padding lanes before a host fetch: (..., 3N, L) ->
    (..., 3N, b).  A contiguous device slice — far cheaper than the full
    from_planes transpose, and it keeps padded lanes off the host link."""
    return planes[..., :b]


def planes_to_host(planes: np.ndarray, b: int,
                   init: np.ndarray = None) -> np.ndarray:
    """NumPy from_planes for fetched arrays: (T, 3N, b') -> (B, T, N, 3),
    or (B, T+1, N, 3) when ``init`` (3N, b') is given — the initial state
    is prepended here, host-side, instead of paying device concat copies.

    The host-side half of the planes-native consumer path: called on data
    the writer has already paid to read back, where the transpose cost
    disappears into the (dominant) HDF5 write."""
    t, three_n = planes.shape[-3], planes.shape[-2]
    n = three_n // 3
    r = planes.reshape(t, 3, n, planes.shape[-1])[..., :b]  # view
    if init is None:
        return np.ascontiguousarray(np.transpose(r, (3, 0, 2, 1)))
    out = np.empty((b, t + 1, n, 3), planes.dtype)
    out[:, 1:] = np.transpose(r, (3, 0, 2, 1))
    ri = init.reshape(3, n, -1)[..., :b]
    out[:, 0] = np.transpose(ri, (2, 1, 0))
    return out


@partial(jax.jit, static_argnames=("n_steps", "save_interval", "softening"))
def run_trajectory_batch_lanes(state: SimState, dt, n_steps: int,
                               save_interval: int = 1,
                               softening: float = SOFTENING) -> Trajectory:
    """Drop-in replacement for ``run_trajectory_batch`` on a batched SimState.

    Converts to planes layout, integrates the whole ensemble in one scan,
    and converts back — identical contract: arrays lead with the sim axis,
    initial state prepended, trailing partial interval integrated but not
    saved, fully-advanced state in ``Trajectory.final``.
    """
    b, n, _ = state.positions.shape
    dtype = state.positions.dtype
    b_pad = _pad_lanes(b)
    dt = jnp.asarray(dt, dtype)

    p0, v0, a0, gm = _state_to_planes(state, b_pad, dtype)
    fin, (ps, vs, accs) = _integrate_planes(p0, v0, a0, gm, dt, n_steps,
                                            save_interval, softening)
    n_saves = n_steps // save_interval

    # Save-axis bookkeeping (times/steps are per-sim scalars, not planes).
    ks = jnp.arange(1, n_saves + 1, dtype=state.step.dtype) * save_interval
    steps = state.step[:, None] + ks[None, :]
    times = state.time[:, None] + dt * ks[None, :].astype(dtype)

    def stack_initial(init_planes, saved):  # (3N,L) + (T,3N,L) -> (B,T+1,N,3)
        # Concatenate in planes space (same layout, contiguous copy), then
        # ONE conversion — concatenating after the transpose measured ~2x
        # slower end-to-end on v5e (layout-mismatched concat).
        return from_planes(
            jnp.concatenate([init_planes[None], saved], axis=0), b)

    fin_state = SimState(
        positions=from_planes(fin[0], b), velocities=from_planes(fin[1], b),
        accelerations=from_planes(fin[2], b), masses=state.masses,
        time=state.time + dt * n_steps, step=state.step + n_steps)
    return Trajectory(
        positions=stack_initial(p0, ps),
        velocities=stack_initial(v0, vs),
        accelerations=stack_initial(a0, accs),
        masses=state.masses,
        times=jnp.concatenate([state.time[:, None], times], axis=1),
        steps=jnp.concatenate([state.step[:, None], steps], axis=1),
        final=fin_state,
    )
