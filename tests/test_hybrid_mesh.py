"""Multi-slice (DCN x ICI) hybrid-mesh support on the 8-way virtual CPU
mesh: a 2-D (dcn, data) mesh emulating a 2-slice x 4-chip pod must produce
the same math as a single device for DP training (gspmd AND shard_map) and
for sharded ensemble datagen — the multi-slice code path of SURVEY §2.3's
parallelism layer, runnable before multi-slice hardware exists."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
from nbody_gnn_hpc_tpu.ops import fully_connected_edge_index
from nbody_gnn_hpc_tpu.parallel import (batch_sharding, make_dp_train_step,
                                        make_hybrid_mesh, make_mesh,
                                        simulate_ensemble, slice_structure)
from nbody_gnn_hpc_tpu.sim import shared_masses


def test_hybrid_mesh_shape_and_axes():
    mesh = make_hybrid_mesh(n_slices=2)
    assert mesh.axis_names == ("dcn", "data")
    assert dict(mesh.shape) == {"dcn": 2, "data": 4}
    # every device appears exactly once
    ids = sorted(d.id for d in mesh.devices.ravel())
    assert ids == sorted(d.id for d in jax.devices())
    with pytest.raises(ValueError):
        make_hybrid_mesh(n_slices=3)  # 8 devices not divisible by 3


def test_hybrid_mesh_requires_slices_or_explicit_count():
    # CPU devices report no slice structure: auto-detection must refuse
    # rather than guess.
    assert slice_structure() is None
    with pytest.raises(ValueError):
        make_hybrid_mesh()


def test_batch_sharding_covers_all_axes():
    hybrid = make_hybrid_mesh(n_slices=2)
    spec = batch_sharding(hybrid).spec
    assert tuple(spec) == (("dcn", "data"),)
    # 1-D meshes keep their single-axis spec
    spec1 = batch_sharding(make_mesh()).spec
    assert tuple(spec1) in ((("data",),), ("data",))


def _toy_problem(rng, n=6, b=8):
    model = NBodyGNN(node_input_dim=7, hidden_dim=8, n_layers=1, output_dim=6,
                     dropout=0.0, remat=False)
    edge_index = jnp.asarray(fully_connected_edge_index(n))
    params = init_model(model, jax.random.PRNGKey(0), n, edge_index.shape[1])
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    masses = jnp.asarray(rng.uniform(1e10, 1e12, n), jnp.float32)
    states = jnp.asarray(rng.randn(b, n, 6), jnp.float32)
    targets = jnp.asarray(rng.randn(b, n, 6), jnp.float32)
    common = dict(state_mean=jnp.zeros(6), state_std=jnp.ones(6),
                  mass_feat=(masses / masses.mean())[:, None],
                  noise_std=0.0, masses=masses)
    return model, tx, edge_index, params, tx.init(params), states, targets, \
        common


@pytest.mark.slow  # fast-mode budget (r5): certified variants of equalities a fast sibling still pins
def test_hybrid_gspmd_dp_matches_single_device(rng):
    model, tx, edges, params, opt_state, s, t, common = _toy_problem(rng)
    key = jax.random.PRNGKey(7)

    hybrid = make_hybrid_mesh(n_slices=2)
    step_h = make_dp_train_step(model, tx, edges, mesh=hybrid, **common)
    p_h, _, l_h = step_h(params, opt_state, s, t, key)

    step_1 = make_dp_train_step(model, tx, edges, mesh=make_mesh(1), **common)
    p_1, _, l_1 = step_1(params, opt_state, s, t, key)

    np.testing.assert_allclose(float(l_h), float(l_1), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(p_h),
                     jax.tree_util.tree_leaves(p_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4,
                                   atol=1e-6)


@pytest.mark.slow  # fast-mode budget (r5): certified variants of equalities a fast sibling still pins
def test_hybrid_shard_map_dp_matches_single_device(rng):
    from nbody_gnn_hpc_tpu.train.steps import make_train_step

    model, tx, edges, params, opt_state, s, t, common = _toy_problem(rng)
    key = jax.random.PRNGKey(9)

    hybrid = make_hybrid_mesh(n_slices=2)
    step_h = make_dp_train_step(model, tx, edges, mesh=hybrid,
                                impl="shard_map", **common)
    p_h, _, l_h = step_h(params, opt_state, s, t, key)

    base = jax.jit(make_train_step(
        model, tx, edges, common["state_mean"], common["state_std"],
        common["mass_feat"], noise_std=0.0, masses=common["masses"]))
    p_b, _, l_b = base(params, opt_state, s, t, key)

    np.testing.assert_allclose(float(l_h), float(l_b), rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(p_h),
                     jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6,
                                   atol=1e-8)


def test_hybrid_sharded_ensemble_matches_unsharded():
    seeds = list(range(42, 42 + 6))  # 6 sims over 8 devices -> padding path
    masses = shared_masses(12, seed=42)
    hybrid = make_hybrid_mesh(n_slices=2)
    traj_h = simulate_ensemble(seeds, 12, 10, box_size=5.0, dt=1e-3,
                               shared_masses=masses, mesh=hybrid)
    traj_1 = simulate_ensemble(seeds, 12, 10, box_size=5.0, dt=1e-3,
                               shared_masses=masses, mesh=None)
    assert traj_h.positions.shape == (6, 11, 12, 3)
    np.testing.assert_allclose(np.asarray(traj_h.positions),
                               np.asarray(traj_1.positions),
                               rtol=2e-5, atol=1e-5)
