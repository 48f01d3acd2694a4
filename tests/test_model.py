"""NBodyGNN: parameter-count parity, zero-init identity property, dropout
rng behavior, batching consistency."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nbody_gnn_hpc_tpu.models import (NBodyGNN, count_parameters,
                                      forward_batch, init_model)
from nbody_gnn_hpc_tpu.ops import fully_connected_edge_index


def make_model(hidden=32, layers=2):
    return NBodyGNN(node_input_dim=7, hidden_dim=hidden, n_layers=layers,
                    output_dim=6, dropout=0.1)


def test_parameter_count_matches_reference():
    """2,550,150 parameters at the production config (METHODOLOGY.md:238)."""
    model = NBodyGNN(node_input_dim=7, hidden_dim=256, n_layers=6,
                     output_dim=6, dropout=0.1)
    params = init_model(model, jax.random.PRNGKey(0), n_particles=8, n_edges=16)
    assert count_parameters(params) == 2_550_150


def test_zero_init_predicts_identity(rng):
    """Freshly initialized model returns exactly the current state
    (zero-init final decoder layer, model.py:121-122) — SURVEY §4f oracle."""
    model = make_model()
    n = 12
    params = init_model(model, jax.random.PRNGKey(0), n, n * (n - 1))
    x = jnp.asarray(rng.randn(n, 7), jnp.float32)
    e = jnp.asarray(fully_connected_edge_index(n))
    out = model.apply({"params": params}, x, e, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x[:, :6]),
                               rtol=0, atol=0)


def test_forward_shapes_and_finiteness(rng):
    model = make_model()
    n, k = 20, 5
    params = init_model(model, jax.random.PRNGKey(1), n, n * k)
    x = jnp.asarray(rng.randn(n, 7), jnp.float32)
    from nbody_gnn_hpc_tpu.ops import knn_edge_index

    e = knn_edge_index(x[:, :3], k)
    out = model.apply({"params": params}, x, e, deterministic=True)
    assert out.shape == (n, 6)
    assert bool(jnp.isfinite(out).all())


def test_dropout_stochastic_and_reproducible(rng):
    model = make_model()
    n = 10
    params = init_model(model, jax.random.PRNGKey(0), n, n * (n - 1))
    # Perturb decoder_out so outputs differ from identity.
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * jnp.ones_like(p), params)
    x = jnp.asarray(rng.randn(n, 7), jnp.float32)
    e = jnp.asarray(fully_connected_edge_index(n))

    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    o1 = model.apply({"params": params}, x, e, deterministic=False,
                     rngs={"dropout": k1})
    o1b = model.apply({"params": params}, x, e, deterministic=False,
                      rngs={"dropout": k1})
    o2 = model.apply({"params": params}, x, e, deterministic=False,
                     rngs={"dropout": k2})
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o1b))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


@pytest.mark.slow
def test_batched_forward_matches_loop(rng):
    model = make_model()
    n, b = 8, 4
    e = jnp.asarray(fully_connected_edge_index(n))
    params = init_model(model, jax.random.PRNGKey(0), n, e.shape[1])
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * jnp.ones_like(p), params)
    x = jnp.asarray(rng.randn(b, n, 7), jnp.float32)
    out = forward_batch(model, params, x, e)
    assert out.shape == (b, n, 6)
    for i in range(b):
        single = model.apply({"params": params}, x[i], e, deterministic=True)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(single),
                                   rtol=1e-6, atol=1e-6)


def test_pos_argument_controls_edge_features(rng):
    """Edge features come from `pos` when given (model.py:153-156) — noised
    training inputs resync pos (train.py:409-415)."""
    model = make_model()
    n = 8
    e = jnp.asarray(fully_connected_edge_index(n))
    params = init_model(model, jax.random.PRNGKey(0), n, e.shape[1])
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * jnp.ones_like(p), params)
    x = jnp.asarray(rng.randn(n, 7), jnp.float32)
    pos_other = jnp.asarray(rng.randn(n, 3), jnp.float32)
    o_default = model.apply({"params": params}, x, e, deterministic=True)
    o_posx = model.apply({"params": params}, x, e, x[:, :3],
                         deterministic=True)
    o_other = model.apply({"params": params}, x, e, pos_other,
                          deterministic=True)
    np.testing.assert_array_equal(np.asarray(o_default), np.asarray(o_posx))
    assert not np.allclose(np.asarray(o_default), np.asarray(o_other))
