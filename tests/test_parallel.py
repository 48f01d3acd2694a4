"""Multi-device sharding on the 8-way virtual CPU mesh (SURVEY §4):
sharded ensemble datagen matches single-device results; data-parallel train
step matches the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
from nbody_gnn_hpc_tpu.ops import fully_connected_edge_index
from nbody_gnn_hpc_tpu.parallel import (make_dp_train_step, make_mesh,
                                        simulate_ensemble, trajectory_slice)
from nbody_gnn_hpc_tpu.sim import shared_masses


def test_virtual_device_count():
    assert len(jax.devices()) == 8


def test_mesh_creation():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh4 = make_mesh(4)
    assert mesh4.devices.size == 4
    with pytest.raises(ValueError):
        make_mesh(100)


def test_sharded_ensemble_matches_unsharded():
    seeds = list(range(42, 42 + 6))  # 6 sims over 8 devices -> padding path
    masses = shared_masses(12, seed=42)
    mesh = make_mesh()
    traj_sharded = simulate_ensemble(seeds, 12, 10, box_size=5.0, dt=1e-3,
                                     shared_masses=masses, mesh=mesh)
    traj_single = simulate_ensemble(seeds, 12, 10, box_size=5.0, dt=1e-3,
                                    shared_masses=masses, mesh=None)
    assert traj_sharded.positions.shape == (6, 11, 12, 3)
    np.testing.assert_allclose(np.asarray(traj_sharded.positions),
                               np.asarray(traj_single.positions),
                               rtol=2e-5, atol=1e-5)


def test_ensemble_matches_simulator():
    """One ensemble member reproduces the NBodySimulator run for that seed
    (same ICs + shared-mass override)."""
    from nbody_gnn_hpc_tpu.sim import NBodySimulator

    masses = shared_masses(10, seed=42)
    traj = simulate_ensemble([45], 10, 8, box_size=10.0, dt=1e-3,
                             shared_masses=masses, mesh=None)
    sim = NBodySimulator(n_particles=10, box_size=10.0, dt=1e-3, seed=45)
    sim.masses = masses
    sim.recompute_accelerations()
    t = sim.run_trajectory(8)
    one = trajectory_slice(traj, 0)
    np.testing.assert_allclose(np.asarray(one.positions),
                               np.asarray(t.positions), rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # fast-mode budget (r5): the 8-dev==1-dev equality is also
# certified by every dryrun_multichip run; test_gspmd_dp_pins_xla_for_fused_models
# keeps the DP step exercised in fast mode.
def test_dp_train_step_matches_single_device(rng):
    n, b = 6, 8
    model = NBodyGNN(node_input_dim=7, hidden_dim=8, n_layers=1, output_dim=6)
    edge_index = jnp.asarray(fully_connected_edge_index(n))
    params = init_model(model, jax.random.PRNGKey(0), n, edge_index.shape[1])
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    opt_state = tx.init(params)

    mean = jnp.zeros(6)
    std = jnp.ones(6)
    masses = jnp.asarray(rng.uniform(1e10, 1e12, n), jnp.float32)
    mass_feat = (masses / masses.mean())[:, None]
    states = jnp.asarray(rng.randn(b, n, 6), jnp.float32)
    targets = jnp.asarray(rng.randn(b, n, 6), jnp.float32)
    key = jax.random.PRNGKey(7)

    mesh8 = make_mesh(8)
    step8 = make_dp_train_step(model, tx, edge_index, mean, std, mass_feat,
                               mesh8, noise_std=0.0, masses=masses)
    p8, o8, l8 = step8(params, opt_state, states, targets, key)

    mesh1 = make_mesh(1)
    step1 = make_dp_train_step(model, tx, edge_index, mean, std, mass_feat,
                               mesh1, noise_std=0.0, masses=masses)
    p1, o1, l1 = step1(params, opt_state, states, targets, key)

    np.testing.assert_allclose(float(l8), float(l1), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(p8),
                     jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4,
                                   atol=1e-6)


@pytest.mark.slow
def test_dp_train_step_runs_multiple_steps(rng):
    """Loss decreases over a few DP steps on a fixed batch."""
    n, b = 5, 16
    model = NBodyGNN(node_input_dim=7, hidden_dim=8, n_layers=1, output_dim=6)
    edge_index = jnp.asarray(fully_connected_edge_index(n))
    params = init_model(model, jax.random.PRNGKey(0), n, edge_index.shape[1])
    tx = optax.adamw(1e-2)
    opt_state = tx.init(params)
    mesh = make_mesh()
    states = jnp.asarray(rng.randn(b, n, 6), jnp.float32)
    targets = states + 0.3
    step = make_dp_train_step(model, tx, edge_index, jnp.zeros(6),
                              jnp.ones(6), jnp.ones((n, 1)), mesh,
                              noise_std=0.0, masses=jnp.ones(n))
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(8):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, states, targets, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


@pytest.mark.slow  # fast-mode budget (r5): certified variants of equalities a fast sibling still pins
def test_shard_map_dp_matches_gspmd(rng):
    """impl='shard_map' (per-device local steps + grad pmean) matches the
    GSPMD formulation and the single-device step when deterministic, for
    BOTH edge implementations — the fused Pallas kernel runs per-device
    under shard_map (interpret mode on this CPU mesh)."""
    from nbody_gnn_hpc_tpu.ops import knn_edge_index
    from nbody_gnn_hpc_tpu.train.loss import PhysicsInformedLoss
    from nbody_gnn_hpc_tpu.train.steps import make_train_step

    n, k, b = 16, 4, 16
    edges = np.asarray(knn_edge_index(jnp.asarray(rng.randn(n, 3)), k))
    masses = jnp.asarray(rng.uniform(1e10, 1e12, n), jnp.float32)
    mesh = make_mesh()
    s = jnp.asarray(rng.randn(b, n, 6), jnp.float32)
    t = jnp.asarray(np.asarray(s) + 0.01, jnp.float32)
    key = jax.random.PRNGKey(3)

    for edge_impl in ("xla", "fused"):
        model = NBodyGNN(node_input_dim=7, hidden_dim=32, n_layers=2,
                         output_dim=6, dropout=0.0, remat=False,
                         dtype=jnp.float32, edge_impl=edge_impl)
        params = init_model(model, jax.random.PRNGKey(0), n, n * k)
        tx = optax.adamw(1e-3)
        opt_state = tx.init(params)
        common = dict(noise_std=0.0, masses=masses,
                      criterion=PhysicsInformedLoss())
        base = make_train_step(model, tx, edges, np.zeros(6, np.float32),
                               np.ones(6, np.float32),
                               (np.asarray(masses)
                                / np.asarray(masses).mean())[:, None],
                               **common)
        p_ref, o_ref, l_ref = jax.jit(base)(params, opt_state, s, t, key)

        from nbody_gnn_hpc_tpu.parallel import make_dp_train_step
        sh = make_dp_train_step(model, tx, edges, np.zeros(6, np.float32),
                                np.ones(6, np.float32),
                                (np.asarray(masses)
                                 / np.asarray(masses).mean())[:, None],
                                mesh, impl="shard_map", **common)
        p_sh, o_sh, l_sh = sh(params, opt_state, s, t, key)
        np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-6)
        for a, bb in zip(jax.tree_util.tree_leaves(p_ref),
                         jax.tree_util.tree_leaves(p_sh)):
            np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                       rtol=1e-6, atol=1e-8,
                                       err_msg=edge_impl)


def test_gspmd_dp_pins_xla_for_fused_models(rng):
    """impl='gspmd' with a fused-edge model must take the XLA-pin branch
    (GSPMD can't partition the Mosaic custom call) and still match the
    single-device XLA step exactly."""
    from nbody_gnn_hpc_tpu.ops import knn_edge_index
    from nbody_gnn_hpc_tpu.train.loss import PhysicsInformedLoss
    from nbody_gnn_hpc_tpu.train.steps import make_train_step

    n, k, b = 16, 4, 16
    edges = np.asarray(knn_edge_index(jnp.asarray(rng.randn(n, 3)), k))
    masses = jnp.asarray(rng.uniform(1e10, 1e12, n), jnp.float32)
    mesh = make_mesh()
    s = jnp.asarray(rng.randn(b, n, 6), jnp.float32)
    t = jnp.asarray(np.asarray(s) + 0.01, jnp.float32)
    key = jax.random.PRNGKey(5)
    mass_feat = (np.asarray(masses) / np.asarray(masses).mean())[:, None]
    common = dict(noise_std=0.0, masses=masses,
                  criterion=PhysicsInformedLoss())

    fused_model = NBodyGNN(node_input_dim=7, hidden_dim=32, n_layers=2,
                           output_dim=6, dropout=0.0, remat=False,
                           dtype=jnp.float32, edge_impl="fused")
    xla_model = NBodyGNN(node_input_dim=7, hidden_dim=32, n_layers=2,
                         output_dim=6, dropout=0.0, remat=False,
                         dtype=jnp.float32, edge_impl="xla")
    params = init_model(xla_model, jax.random.PRNGKey(0), n, n * k)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    base = make_train_step(xla_model, tx, edges, np.zeros(6, np.float32),
                           np.ones(6, np.float32), mass_feat, **common)
    p_ref, _, l_ref = jax.jit(base)(params, opt_state, s, t, key)

    from nbody_gnn_hpc_tpu.parallel import make_dp_train_step
    # pass the FUSED model: the gspmd builder must pin the XLA branch
    dp = make_dp_train_step(fused_model, tx, edges, np.zeros(6, np.float32),
                            np.ones(6, np.float32), mass_feat, mesh,
                            impl="gspmd", **common)
    p_dp, _, l_dp = dp(params, opt_state, s, t, key)
    np.testing.assert_allclose(float(l_dp), float(l_ref), rtol=1e-6)
    for a, bb in zip(jax.tree_util.tree_leaves(p_ref),
                     jax.tree_util.tree_leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=1e-6, atol=1e-8)
