"""Sims-in-lanes ensemble integrator (sim/lanes.py): layout round-trip,
force equivalence, trajectory parity with run_trajectory_batch (same save
cadence, same KDK semantics — reference nbody.py:202-248), pad neutrality."""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody_gnn_hpc_tpu.sim import (G, accelerations, lanes_accelerations,
                                   pairwise_accelerations,
                                   run_trajectory_batch,
                                   run_trajectory_batch_lanes, shared_masses)
from nbody_gnn_hpc_tpu.sim.lanes import _pad_lanes, from_planes, to_planes
from nbody_gnn_hpc_tpu.sim.state import make_state


def _batch_state(b=5, n=12, seed=0):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(-5, 5, (b, n, 3)).astype(np.float32)
    vel = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)
    m = rng.uniform(1e10, 1e12, (b, n)).astype(np.float32)
    state = make_state(pos, vel, m)
    import jax
    return state._replace(accelerations=jax.vmap(
        lambda x, mm: accelerations(x, mm))(state.positions, state.masses))


def test_planes_round_trip():
    rng = np.random.RandomState(1)
    arr = jnp.asarray(rng.randn(7, 10, 3), jnp.float32)
    planes = to_planes(arr, _pad_lanes(7))
    assert planes.shape == (30, 128)
    back = from_planes(planes, 7)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(arr))
    # leading (save) axis variant
    stacked = jnp.stack([planes, planes * 2])
    back2 = from_planes(stacked, 7)
    assert back2.shape == (7, 2, 10, 3)
    np.testing.assert_array_equal(np.asarray(back2[:, 0]), np.asarray(arr))
    np.testing.assert_array_equal(np.asarray(back2[:, 1]), 2 * np.asarray(arr))


def test_lanes_force_matches_pairwise():
    rng = np.random.RandomState(2)
    b, n = 6, 16
    pos = jnp.asarray(rng.uniform(-5, 5, (b, n, 3)), jnp.float32)
    m = jnp.asarray(rng.uniform(1e10, 1e12, (b, n)), jnp.float32)
    a_ref = np.asarray(pairwise_accelerations(pos, m))

    b_pad = _pad_lanes(b)
    gm = jnp.pad(jnp.float32(G) * m.T, ((0, 0), (0, b_pad - b)))
    a_planes = lanes_accelerations(to_planes(pos, b_pad), gm)
    a = np.asarray(from_planes(a_planes, b))
    np.testing.assert_allclose(a, a_ref, rtol=1e-5,
                               atol=np.abs(a_ref).max() * 1e-6)
    # padded lanes stay exactly zero (dead lanes)
    pad_region = np.asarray(a_planes)[:, b:]
    np.testing.assert_array_equal(pad_region, 0.0)


@pytest.mark.parametrize("save_interval,n_steps", [(1, 12), (3, 10), (4, 11)])
def test_lanes_trajectory_matches_vmap(save_interval, n_steps):
    state = _batch_state()
    ref = run_trajectory_batch(state, 1e-3, n_steps, save_interval, 1e-9)
    got = run_trajectory_batch_lanes(state, 1e-3, n_steps, save_interval,
                                     1e-9)
    assert got.positions.shape == ref.positions.shape
    for field in ("positions", "velocities", "accelerations"):
        r = np.asarray(getattr(ref, field))
        g = np.asarray(getattr(got, field))
        np.testing.assert_allclose(g, r, rtol=3e-5,
                                   atol=np.abs(r).max() * 3e-6, err_msg=field)
    np.testing.assert_array_equal(np.asarray(got.steps), np.asarray(ref.steps))
    np.testing.assert_allclose(np.asarray(got.times), np.asarray(ref.times),
                               rtol=1e-5, atol=1e-7)
    # fully-advanced final state (includes the unsaved tail)
    np.testing.assert_allclose(np.asarray(got.final.positions),
                               np.asarray(ref.final.positions),
                               rtol=3e-5,
                               atol=np.abs(np.asarray(
                                   ref.final.positions)).max() * 3e-6)
    assert int(got.final.step[0]) == n_steps


def test_lanes_momentum_conservation():
    state = _batch_state(b=3, n=20, seed=3)
    traj = run_trajectory_batch_lanes(state, 1e-3, 30, 1, 1e-9)
    p = (np.asarray(traj.velocities, np.float64)
         * np.asarray(traj.masses, np.float64)[:, None, :, None])
    total = p.sum(axis=2)                      # (B, T, 3)
    drift = np.abs(total - total[:, :1]).max()  # vs the initial momentum
    scale = np.abs(p).sum(axis=2).max()
    assert drift / scale < 5e-4


def test_simulate_ensemble_uses_lanes_single_device():
    """Public datagen entry point (mesh=None) produces reference-shaped
    output through the lanes path and matches the per-sim simulator."""
    from nbody_gnn_hpc_tpu.parallel import simulate_ensemble
    from nbody_gnn_hpc_tpu.sim import NBodySimulator

    masses = shared_masses(10, seed=42)
    traj = simulate_ensemble([42, 43], 10, 8, box_size=5.0, dt=1e-3,
                             shared_masses=masses, mesh=None)
    assert traj.positions.shape == (2, 9, 10, 3)

    sim = NBodySimulator(n_particles=10, box_size=5.0, dt=1e-3, seed=42)
    sim.masses = masses
    sim.recompute_accelerations()
    states = sim.run(8, save_interval=1, verbose=False)
    want = np.stack([s["positions"] for s in states])
    np.testing.assert_allclose(np.asarray(traj.positions[0]), want,
                               rtol=3e-5, atol=1e-5)


def test_run_parallel_simulations_batches_homogeneous():
    """Configs differing only in seed run as one lanes program; the odd one
    out falls back to sequential — results match per-config runs, in order."""
    from nbody_gnn_hpc_tpu.sim import NBodySimulator, run_parallel_simulations

    configs = [
        {"init": {"n_particles": 8, "box_size": 5.0, "dt": 1e-3, "seed": 1},
         "run": {"n_steps": 6}},
        {"init": {"n_particles": 12, "box_size": 5.0, "dt": 1e-3, "seed": 9},
         "run": {"n_steps": 6}},  # different N -> sequential path
        {"init": {"n_particles": 8, "box_size": 5.0, "dt": 1e-3, "seed": 2},
         "run": {"n_steps": 6}},
    ]
    results = run_parallel_simulations(configs)
    assert len(results) == 3
    for cfg, got in zip(configs, results):
        sim = NBodySimulator(**cfg["init"])
        want = sim.run(**cfg["run"], verbose=False)
        assert len(got) == len(want)
        for gs, ws in zip(got, want):
            np.testing.assert_allclose(gs["positions"], ws["positions"],
                                       rtol=3e-5, atol=1e-6)
            assert gs["step"] == ws["step"]


def test_large_n_ensemble_uses_vmap_path():
    """Above LANES_MAX_N the ensemble must route to the vmap integrator
    (the lanes force plane is O(N^2 * lanes) and would OOM at large N);
    results still match the per-sim path."""
    from nbody_gnn_hpc_tpu.parallel import datagen, simulate_ensemble

    assert datagen.LANES_MAX_N == 512
    n = datagen.LANES_MAX_N + 8  # just over the gate (small enough for CPU)
    masses = shared_masses(n, seed=42)
    traj = simulate_ensemble([42, 43], n, 2, box_size=10.0, dt=1e-3,
                             shared_masses=masses, mesh=None)
    assert traj.positions.shape == (2, 3, n, 3)
    assert np.isfinite(np.asarray(traj.positions)).all()


def test_planes_native_matches_standard_lanes():
    """run_planes + host-side planes_to_host must reproduce the standard
    run_trajectory_batch_lanes output: the two entry points share one
    traced integration core; only where the layout conversion happens
    (device vs host) differs."""
    import jax

    from nbody_gnn_hpc_tpu.sim.lanes import (planes_to_host, prepare_planes,
                                             run_planes)

    state = _batch_state(b=5, n=12, seed=4)
    b = state.positions.shape[0]
    ref = run_trajectory_batch_lanes(state, 1e-3, 10, 3, 1e-9)

    planes_in = prepare_planes(state, _pad_lanes(b))
    saved, fin = run_planes(*planes_in, 1e-3, 10, 3, 1e-9)
    # saved excludes the initial state; planes_to_host prepends it host-side
    got_pos = planes_to_host(np.asarray(jax.device_get(saved[0])), b,
                             init=np.asarray(jax.device_get(planes_in[0])))
    got_vel = planes_to_host(np.asarray(jax.device_get(saved[1])), b,
                             init=np.asarray(jax.device_get(planes_in[1])))
    got_acc = planes_to_host(np.asarray(jax.device_get(saved[2])), b,
                             init=np.asarray(jax.device_get(planes_in[2])))

    np.testing.assert_allclose(got_pos, np.asarray(ref.positions),
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(got_vel, np.asarray(ref.velocities),
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(got_acc, np.asarray(ref.accelerations),
                               rtol=1e-6,
                               atol=np.abs(np.asarray(
                                   ref.accelerations)).max() * 1e-7)
    # final planes state chains: matches ref.final
    fin_pos = planes_to_host(np.asarray(jax.device_get(fin[0]))[None], b)[:, 0]
    np.testing.assert_allclose(fin_pos, np.asarray(ref.final.positions),
                               rtol=1e-6, atol=0)


def test_planes_ensemble_to_host_matches_standard(monkeypatch):
    """simulate_ensemble(layout='planes').to_host() is a drop-in for the
    standard Trajectory: same arrays, same times/steps bookkeeping, same
    final state — the writer consumes either identically."""
    from nbody_gnn_hpc_tpu.parallel import (PlanesEnsemble, datagen,
                                            fetch_host_trajectory,
                                            simulate_ensemble)

    # Pin the single-device lanes path (the 8-virtual-device test env
    # would otherwise auto-build a mesh and take the vmap path).
    monkeypatch.setattr(datagen, "make_mesh", lambda: None)
    masses = shared_masses(10, seed=42)
    kw = dict(n_particles=10, n_steps=8, box_size=5.0, dt=1e-3,
              save_interval=3, shared_masses=masses, mesh=None)
    ref = simulate_ensemble([42, 43, 44], **kw)
    res = simulate_ensemble([42, 43, 44], **kw, layout="planes")
    assert isinstance(res, PlanesEnsemble)
    got = fetch_host_trajectory(res)

    for field in ("positions", "velocities", "accelerations", "masses"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, field)),
            np.asarray(getattr(ref, field)), rtol=1e-6,
            atol=np.abs(np.asarray(getattr(ref, field))).max() * 1e-7,
            err_msg=field)
    np.testing.assert_array_equal(np.asarray(got.steps),
                                  np.asarray(ref.steps))
    np.testing.assert_allclose(np.asarray(got.times),
                               np.asarray(ref.times), rtol=1e-5, atol=1e-7)
    # dtype parity with the standard path: the HDF5 trajectory schema is a
    # parity surface (times f32, steps i32 — review r3 caught f64/i64 drift)
    assert np.asarray(got.times).dtype == np.asarray(ref.times).dtype
    assert np.asarray(got.steps).dtype == np.asarray(ref.steps).dtype
    assert np.asarray(got.final.time).dtype == \
        np.asarray(ref.final.time).dtype
    assert np.asarray(got.final.step).dtype == \
        np.asarray(ref.final.step).dtype
    np.testing.assert_allclose(np.asarray(got.final.positions),
                               np.asarray(ref.final.positions),
                               rtol=1e-6, atol=0)
    assert int(np.asarray(got.final.step)[0]) == 8
