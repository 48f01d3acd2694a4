"""Multi-chip readiness certification + smoke stages.

One place for everything that must be green before (and on the day) real
multi-chip hardware appears: the three self-certifying DP equivalence
stages (consumed by ``__graft_entry__.dryrun_multichip`` — the driver's
multi-chip artifact — and by ``scripts/multichip_smoke.py``, the one-command
runbook), a replica-pool serving exercise, and a DP scaling measurement.

The reference's entire distributed story is a 4-worker ``mp.Pool``
(/root/reference/scripts/generate_data.py:143-147); everything here is its
TPU-native replacement: XLA collectives over a 1-D data mesh (SURVEY §2.3).

All stages run on whatever mesh exists — 8 virtual CPU devices in CI, a
real v5e-8 the day it appears. Callers are responsible for platform
selection; nothing here initializes a backend other than the one already
configured.
"""

import time
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np


def certify_multichip(n_devices: int) -> Dict[str, float]:
    """The three self-certifying DP equivalence stages (all must pass):

    1. gspmd DP train step over ``n_devices`` == the 1-device step
       (same program, same threefry streams — sharding must not change
       the math; params compared to rtol 1e-4).
    2. shard_map DP step (per-device local steps + gradient psum — the
       formulation that keeps Pallas kernels per-device on real
       multichip) == the plain jitted step, noise/dropout off.
    3. Mesh-sharded ensemble datagen == unsharded trajectories
       (embarrassingly parallel — zero collectives).

    Returns the certified losses; raises AssertionError on any mismatch.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
    from nbody_gnn_hpc_tpu.ops import fully_connected_edge_index
    from nbody_gnn_hpc_tpu.parallel import make_dp_train_step, make_mesh
    from nbody_gnn_hpc_tpu.train.schedule import make_step_schedule

    mesh = make_mesh(n_devices)

    n_particles = 16
    batch = 2 * n_devices
    model = NBodyGNN(node_input_dim=7, hidden_dim=256, n_layers=6,
                     output_dim=6, dropout=0.1)
    edge_index = jnp.asarray(fully_connected_edge_index(n_particles))
    params = init_model(model, jax.random.PRNGKey(0), n_particles,
                        int(edge_index.shape[1]))

    # Production optimizer: clip 1.0 + AdamW with warm-restart schedule.
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(make_step_schedule(5e-4, steps_per_epoch=10),
                    weight_decay=1e-4))
    opt_state = tx.init(params)

    rng = np.random.RandomState(0)
    masses = jnp.asarray(rng.uniform(1e10, 1e12, n_particles), jnp.float32)
    states = jnp.asarray(rng.randn(batch, n_particles, 6), jnp.float32)
    targets = jnp.asarray(rng.randn(batch, n_particles, 6), jnp.float32)
    mean = jnp.asarray(states.reshape(-1, 6).mean(0))
    std = jnp.asarray(states.reshape(-1, 6).std(0) + 1e-6)

    mass_feat = (masses / masses.mean())[:, None]
    key = jax.random.PRNGKey(1)

    # -- Stage 1: gspmd DP step, bitwise-class equality vs 1 device.
    step_n = make_dp_train_step(model, tx, edge_index, mean, std, mass_feat,
                                mesh, noise_std=0.003, masses=masses)
    p_n, _, loss_n = step_n(params, opt_state, states, targets, key)
    step_1 = make_dp_train_step(model, tx, edge_index, mean, std, mass_feat,
                                make_mesh(1), noise_std=0.003, masses=masses)
    p_1, _, loss_1 = step_1(params, opt_state, states, targets, key)
    loss_n, loss_1 = float(loss_n), float(loss_1)
    assert np.isfinite(loss_n), f"non-finite loss: {loss_n}"
    assert abs(loss_n - loss_1) <= 1e-5 * abs(loss_1), \
        f"gspmd {n_devices}-dev loss {loss_n!r} != 1-dev loss {loss_1!r}"
    for a, b in zip(jax.tree_util.tree_leaves(p_n),
                    jax.tree_util.tree_leaves(p_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)
    print(f"certify({n_devices}): gspmd step ok, "
          f"loss {loss_n:.6f} == 1-dev {loss_1:.6f}, params match")

    # -- Stage 2: shard_map DP variant. Its per-device RNG folds differ
    # from gspmd's by design, so certify it deterministically (noise and
    # dropout off) against the plain jitted step.
    from nbody_gnn_hpc_tpu.train.steps import make_train_step

    model_det = NBodyGNN(node_input_dim=7, hidden_dim=256, n_layers=6,
                         output_dim=6, dropout=0.0)
    step_sm = make_dp_train_step(model_det, tx, edge_index, mean, std,
                                 mass_feat, mesh, noise_std=0.0,
                                 masses=masses, impl="shard_map")
    _, _, loss_sm = step_sm(params, opt_state, states, targets, key)
    base = jax.jit(make_train_step(model_det, tx, edge_index, mean, std,
                                   mass_feat, noise_std=0.0, masses=masses))
    _, _, loss_base = base(params, opt_state, states, targets, key)
    loss_sm, loss_base = float(loss_sm), float(loss_base)
    assert abs(loss_sm - loss_base) <= 1e-6 * abs(loss_base), \
        f"shard_map loss {loss_sm!r} != single-device {loss_base!r}"
    print(f"certify({n_devices}): shard_map step ok, "
          f"loss {loss_sm:.6f} == single-dev {loss_base:.6f}")

    # -- Stage 3: sharded ensemble datagen == unsharded.
    from nbody_gnn_hpc_tpu.parallel import simulate_ensemble
    from nbody_gnn_hpc_tpu.sim import shared_masses as mk_masses

    seeds = list(range(42, 42 + n_devices + 1))
    sm = mk_masses(8, seed=42)
    traj = simulate_ensemble(seeds, 8, 4, box_size=5.0, dt=1e-3,
                             shared_masses=sm, mesh=mesh)
    traj_1 = simulate_ensemble(seeds, 8, 4, box_size=5.0, dt=1e-3,
                               shared_masses=sm, mesh=make_mesh(1))
    assert np.isfinite(np.asarray(traj.positions)).all()
    np.testing.assert_allclose(np.asarray(traj.positions),
                               np.asarray(traj_1.positions),
                               rtol=2e-5, atol=1e-5)
    print(f"certify({n_devices}): sharded ensemble ok, "
          f"traj shape={tuple(traj.positions.shape)} == unsharded "
          f"({len(seeds)} sims)")

    return {"loss_gspmd": loss_n, "loss_1dev": loss_1,
            "loss_shard_map": loss_sm, "loss_base": loss_base,
            "n_ensemble_sims": float(len(seeds))}


def certify_hybrid(n_devices: int, n_slices: int = 2) -> Dict[str, float]:
    """Multi-slice readiness: a 2-D (dcn, data) hybrid mesh — an emulated
    ``n_slices``-slice pod over whatever devices exist (real slices are
    auto-detected by ``make_hybrid_mesh`` on multi-slice hardware) — must
    reproduce single-device math for gspmd DP, shard_map DP, and the
    sharded ensemble datagen.  Small model: this certifies the mesh
    plumbing, not kernel perf."""
    import jax
    import jax.numpy as jnp
    import optax

    from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
    from nbody_gnn_hpc_tpu.ops import fully_connected_edge_index
    from nbody_gnn_hpc_tpu.parallel import (make_dp_train_step,
                                            make_hybrid_mesh, make_mesh,
                                            simulate_ensemble)
    from nbody_gnn_hpc_tpu.sim import shared_masses as mk_masses
    from nbody_gnn_hpc_tpu.train.steps import make_train_step

    if n_devices % n_slices:
        raise ValueError(f"{n_devices} devices not divisible into "
                         f"{n_slices} emulated slices")
    mesh = make_hybrid_mesh(n_slices=n_slices)
    assert dict(mesh.shape) == {"dcn": n_slices, "data": n_devices // n_slices}

    n, b = 6, 2 * n_devices
    model = NBodyGNN(node_input_dim=7, hidden_dim=8, n_layers=1, output_dim=6,
                     dropout=0.0, remat=False)
    edge_index = jnp.asarray(fully_connected_edge_index(n))
    params = init_model(model, jax.random.PRNGKey(0), n,
                        int(edge_index.shape[1]))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    opt_state = tx.init(params)
    rng = np.random.RandomState(0)
    masses = jnp.asarray(rng.uniform(1e10, 1e12, n), jnp.float32)
    states = jnp.asarray(rng.randn(b, n, 6), jnp.float32)
    targets = jnp.asarray(rng.randn(b, n, 6), jnp.float32)
    common = dict(state_mean=jnp.zeros(6), state_std=jnp.ones(6),
                  mass_feat=(masses / masses.mean())[:, None],
                  noise_std=0.0, masses=masses)
    key = jax.random.PRNGKey(7)

    _, _, l_ref = make_dp_train_step(model, tx, edge_index,
                                     mesh=make_mesh(1), **common)(
        params, opt_state, states, targets, key)
    _, _, l_g = make_dp_train_step(model, tx, edge_index, mesh=mesh,
                                   **common)(
        params, opt_state, states, targets, key)
    l_ref, l_g = float(l_ref), float(l_g)
    assert abs(l_g - l_ref) <= 1e-5 * abs(l_ref), \
        f"hybrid gspmd loss {l_g!r} != 1-dev {l_ref!r}"

    _, _, l_sm = make_dp_train_step(model, tx, edge_index, mesh=mesh,
                                    impl="shard_map", **common)(
        params, opt_state, states, targets, key)
    _, _, l_b = jax.jit(make_train_step(
        model, tx, edge_index, common["state_mean"], common["state_std"],
        common["mass_feat"], noise_std=0.0, masses=masses))(
        params, opt_state, states, targets, key)
    l_sm, l_b = float(l_sm), float(l_b)
    assert abs(l_sm - l_b) <= 1e-6 * abs(l_b), \
        f"hybrid shard_map loss {l_sm!r} != single-device {l_b!r}"

    seeds = list(range(42, 42 + n_devices + 1))
    sm = mk_masses(8, seed=42)
    traj = simulate_ensemble(seeds, 8, 4, box_size=5.0, dt=1e-3,
                             shared_masses=sm, mesh=mesh)
    traj_1 = simulate_ensemble(seeds, 8, 4, box_size=5.0, dt=1e-3,
                               shared_masses=sm, mesh=make_mesh(1))
    np.testing.assert_allclose(np.asarray(traj.positions),
                               np.asarray(traj_1.positions),
                               rtol=2e-5, atol=1e-5)

    print(f"certify_hybrid({n_devices}): (dcn={n_slices}, "
          f"data={n_devices // n_slices}) mesh ok — gspmd {l_g:.6f} == "
          f"1-dev, shard_map {l_sm:.6f} == jit, sharded ensemble == "
          f"unsharded ({len(seeds)} sims)")
    return {"loss_gspmd": l_g, "loss_1dev": l_ref,
            "loss_shard_map": l_sm, "loss_base": l_b}


def replica_pool_exercise(n_devices: int, tmpdir: str) -> Dict[str, float]:
    """Serving DP smoke: one device-pinned replica per device, concurrent
    rollouts from distinct threads, every result identical to the
    single-service answer (replicas share params; rollouts are
    deterministic). Exercises warmup fan-out, the FIFO free-queue, and the
    device pinning that real multichip serving relies on."""
    import threading
    from pathlib import Path

    import jax

    from nbody_gnn_hpc_tpu.io.model_io import save_checkpoint
    from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
    from nbody_gnn_hpc_tpu.serve import build_replica_pool, build_service

    n_particles, k, steps = 12, 4, 6
    model = NBodyGNN(node_input_dim=7, hidden_dim=8, n_layers=1,
                     output_dim=6, dropout=0.0, remat=False)
    params = init_model(model, jax.random.PRNGKey(0), n_particles,
                        n_particles * k)
    ckpt = Path(tmpdir) / "model.pt"
    save_checkpoint(ckpt, params=params,
                    norm_stats={"state_mean": np.zeros(6, np.float32),
                                "state_std": np.ones(6, np.float32)})
    cfg = Path(tmpdir) / "config.json"
    cfg.write_text(
        '{"model_config": {"node_input_dim": 7, "hidden_dim": 8, '
        '"n_layers": 1, "output_dim": 6, "dropout": 0.0}, '
        '"training_config": {"k_neighbors": %d}}' % k)

    pool = build_replica_pool(str(ckpt), str(cfg), n_replicas=n_devices)
    assert pool.model_info["replicas"] == n_devices
    single = build_service(str(ckpt), str(cfg))

    rng = np.random.RandomState(7)
    pos = rng.randn(n_particles, 3).astype(np.float32)
    vel = rng.randn(n_particles, 3).astype(np.float32)
    masses = rng.uniform(1e10, 1e12, n_particles).astype(np.float32)
    want = single.rollout(pos, vel, masses, steps)

    results: List[Optional[Tuple]] = [None] * (2 * n_devices)
    errors: List[BaseException] = []

    def worker(i):
        try:
            results[i] = pool.rollout(pos, vel, masses, steps)
        except BaseException as e:  # noqa: BLE001 — re-raised below
            errors.append(e)

    t0 = time.time()
    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(results))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    if errors:
        raise errors[0]
    for got in results:
        for key in ("positions", "velocities"):
            np.testing.assert_allclose(np.asarray(got[key]),
                                       np.asarray(want[key]), rtol=1e-5,
                                       atol=1e-5)
    print(f"replica pool: {len(results)} concurrent rollouts over "
          f"{n_devices} replicas in {dt:.2f}s, all == single-service")
    return {"concurrent_rollouts": float(len(results)),
            "wall_s": dt}


def _sync(tree) -> None:
    """Force execution with a host readback (block_until_ready is not
    reliable on the tunneled axon platform — verify SKILL.md)."""
    import jax

    leaf = jax.tree_util.tree_leaves(tree)[0]
    float(np.asarray(leaf).ravel()[0])


def scaling_table(n_devices: int, reps: int = 3,
                  per_device_batch: int = 8) -> List[Dict[str, float]]:
    """Measure DP train-step throughput (gspmd AND shard_map) and sharded
    ensemble datagen throughput at 1, 2, 4, ... n_devices; print a table.

    On the virtual CPU mesh (1 host core) the absolute numbers only
    exercise the code path; on real multi-chip hardware this is the day-1
    measurement that picks the DP default and shows scaling efficiency.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
    from nbody_gnn_hpc_tpu.ops import fully_connected_edge_index
    from nbody_gnn_hpc_tpu.parallel import (make_dp_train_step, make_mesh,
                                            simulate_ensemble)
    from nbody_gnn_hpc_tpu.sim import shared_masses as mk_masses
    from nbody_gnn_hpc_tpu.train.schedule import make_step_schedule

    n_particles = 16
    model = NBodyGNN(node_input_dim=7, hidden_dim=256, n_layers=6,
                     output_dim=6, dropout=0.1)
    edge_index = jnp.asarray(fully_connected_edge_index(n_particles))
    params = init_model(model, jax.random.PRNGKey(0), n_particles,
                        int(edge_index.shape[1]))
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(make_step_schedule(5e-4, steps_per_epoch=10),
                    weight_decay=1e-4))
    opt_state = tx.init(params)
    rng = np.random.RandomState(0)
    masses = jnp.asarray(rng.uniform(1e10, 1e12, n_particles), jnp.float32)
    mean = jnp.zeros(6, jnp.float32)
    std = jnp.ones(6, jnp.float32)
    mass_feat = (masses / masses.mean())[:, None]
    key = jax.random.PRNGKey(1)

    def time_step(step: Callable, batch: int) -> float:
        states = jnp.asarray(rng.randn(batch, n_particles, 6), jnp.float32)
        targets = jnp.asarray(rng.randn(batch, n_particles, 6), jnp.float32)
        p, o, _ = step(params, opt_state, states, targets, key)  # compile
        _sync(p)
        t0 = time.time()
        for _ in range(reps):
            p, o, _ = step(p, o, states, targets, key)
        _sync(p)
        return (time.time() - t0) / reps

    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_devices]
    if counts[-1] != n_devices:
        counts.append(n_devices)
    rows = []
    for d in counts:
        mesh = make_mesh(d)
        batch = per_device_batch * d
        t_gspmd = time_step(
            make_dp_train_step(model, tx, edge_index, mean, std, mass_feat,
                               mesh, noise_std=0.003, masses=masses), batch)
        t_sm = time_step(
            make_dp_train_step(model, tx, edge_index, mean, std, mass_feat,
                               mesh, noise_std=0.003, masses=masses,
                               impl="shard_map"), batch)
        # Sharded ensemble datagen: 4 sims per device, 32 steps.
        seeds = list(range(42, 42 + 4 * d))
        sm_masses = mk_masses(n_particles, seed=42)
        traj = simulate_ensemble(seeds, n_particles, 32, box_size=5.0,
                                 dt=1e-3, shared_masses=sm_masses, mesh=mesh)
        _sync(traj.positions)
        t0 = time.time()
        traj = simulate_ensemble(seeds, n_particles, 32, box_size=5.0,
                                 dt=1e-3, shared_masses=sm_masses, mesh=mesh)
        _sync(traj.positions)
        t_gen = time.time() - t0
        rows.append({"devices": d, "global_batch": batch,
                     "gspmd_samples_s": batch / t_gspmd,
                     "shard_map_samples_s": batch / t_sm,
                     "datagen_sim_steps_s": len(seeds) * 32 / t_gen})

    print(f"\nDP scaling table (per-device batch {per_device_batch}, "
          f"{reps} timed reps, N={n_particles} toy shapes):")
    print(f"{'devs':>5} {'batch':>6} {'gspmd samp/s':>13} "
          f"{'shard_map samp/s':>17} {'datagen steps/s':>16}")
    for r in rows:
        print(f"{r['devices']:>5} {r['global_batch']:>6} "
              f"{r['gspmd_samples_s']:>13.1f} "
              f"{r['shard_map_samples_s']:>17.1f} "
              f"{r['datagen_sim_steps_s']:>16.1f}")
    full = rows[-1]
    pick = ("gspmd" if full["gspmd_samples_s"] >= full["shard_map_samples_s"]
            else "shard_map")
    print(f"faster DP impl at {full['devices']} devices: {pick} "
          f"(gspmd {full['gspmd_samples_s']:.1f} vs shard_map "
          f"{full['shard_map_samples_s']:.1f} samples/s)")
    return rows
