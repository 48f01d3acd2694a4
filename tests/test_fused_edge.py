"""Fused edge-stream kernel (ops/fused_edge.py) vs the XLA branch: forward,
parameter tree, and gradients (params AND inputs — the rollout-tune path
differentiates through positions).  Runs in Pallas interpreter mode on CPU;
real-TPU behavior (incl. in-kernel dropout) is covered by scripts/smoke_tpu.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
from nbody_gnn_hpc_tpu.models.gnn import target_adjacency
from nbody_gnn_hpc_tpu.ops.fused_edge import fused_edge_layer
from nbody_gnn_hpc_tpu.ops.knn import knn_edge_index

N, K, H, LAYERS = 16, 4, 32, 2
E = N * K


def _setup(seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(N, 7), jnp.float32)
    pos = jnp.asarray(rng.randn(N, 3), jnp.float32)
    edges = knn_edge_index(pos, K)
    return x, pos, edges


def _models():
    kw = dict(node_input_dim=7, hidden_dim=H, n_layers=LAYERS, output_dim=6,
              dropout=0.1, remat=False, dtype=jnp.float32)
    return (NBodyGNN(edge_impl="xla", **kw), NBodyGNN(edge_impl="fused", **kw))


def test_param_trees_identical():
    xla_m, fused_m = _models()
    p1 = init_model(xla_m, jax.random.PRNGKey(0), N, E)
    p2 = init_model(fused_m, jax.random.PRNGKey(0), N, E)
    t1 = jax.tree_util.tree_structure(p1)
    t2 = jax.tree_util.tree_structure(p2)
    assert t1 == t2
    shapes1 = jax.tree_util.tree_map(lambda a: a.shape, p1)
    shapes2 = jax.tree_util.tree_map(lambda a: a.shape, p2)
    assert shapes1 == shapes2


def test_forward_matches_xla_branch():
    x, pos, edges = _setup()
    xla_m, fused_m = _models()
    params = init_model(xla_m, jax.random.PRNGKey(1), N, E)
    out_x = xla_m.apply({"params": params}, x, edges, pos,
                        deterministic=True)
    out_f = fused_m.apply({"params": params}, x, edges, pos,
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # fast-mode budget (r5): interpret-mode grad tracing is the
# cost; fast siblings keep forward equality (test_forward_matches_xla_branch)
# and fused grad consistency (test_fused_with_remat) pinned.
def test_grads_match_xla_branch():
    x, pos, edges = _setup(3)
    xla_m, fused_m = _models()
    params = init_model(xla_m, jax.random.PRNGKey(2), N, E)
    tgt = jnp.asarray(np.random.RandomState(9).randn(N, 6), jnp.float32)

    def loss(model, p, xx):
        out = model.apply({"params": p}, xx, edges, xx[:, :3],
                          deterministic=True)
        return jnp.sum((out - tgt) ** 2)

    gp_x, gx_x = jax.grad(lambda p, xx: loss(xla_m, p, xx),
                          argnums=(0, 1))(params, x)
    gp_f, gx_f = jax.grad(lambda p, xx: loss(fused_m, p, xx),
                          argnums=(0, 1))(params, x)

    flat_x, _ = jax.tree_util.tree_flatten_with_path(gp_x)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(gp_f)
    for (path, a), (_, b) in zip(flat_x, flat_f):
        scale = np.abs(np.asarray(a)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5 * scale,
            err_msg=jax.tree_util.keystr(path))
    # input grads carry the rollout-tune path (positions -> edge features)
    scale = np.abs(np.asarray(gx_x)).max()
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x),
                               rtol=5e-4, atol=5e-5 * scale)


def test_fused_op_matches_reference_math():
    """Direct op-level check against a plain jnp transcription."""
    rng = np.random.RandomState(7)
    tp = jnp.asarray(rng.randn(N, H), jnp.float32)
    sp = jnp.asarray(rng.randn(N, H), jnp.float32)
    ea = jnp.asarray(rng.randn(E, 5), jnp.float32)
    we = jnp.asarray(rng.randn(5, H), jnp.float32)
    gamma = jnp.asarray(rng.randn(H), jnp.float32)
    beta = jnp.asarray(rng.randn(H), jnp.float32)
    pos = jnp.asarray(rng.randn(N, 3), jnp.float32)
    edges = knn_edge_index(pos, K)
    adj, _ = target_adjacency(edges, N, jnp.float32)

    got = fused_edge_layer(tp, sp, ea, we, gamma, beta, adj.T,
                           jnp.zeros((1, 1), jnp.int32), k=K,
                           deterministic=True, interpret=True)

    z = (jnp.take(tp, edges[1], axis=0)
         + jnp.repeat(sp, K, axis=0) + ea @ we)
    mu = z.mean(axis=1, keepdims=True)
    var = (z * z).mean(axis=1, keepdims=True) - mu * mu
    y = (z - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta
    a = y * jax.nn.sigmoid(y)
    want = adj @ a
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_rejects_non_row_regular_counts():
    tp = jnp.zeros((16, H))
    with pytest.raises(ValueError, match="row-regular"):
        fused_edge_layer(tp, tp, jnp.zeros((40, 5)), jnp.zeros((5, H)),
                         jnp.zeros(H), jnp.zeros(H),
                         jnp.zeros((40, 16)), jnp.zeros((1, 1), jnp.int32),
                         k=4, deterministic=True, interpret=True)


def _odd_n_setup():
    n, k = 10, 3
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(n, 7), jnp.float32)
    pos = jnp.asarray(rng.randn(n, 3), jnp.float32)
    edges = knn_edge_index(pos, k)
    kw = dict(node_input_dim=7, hidden_dim=H, n_layers=2, output_dim=6,
              dropout=0.1, remat=False, dtype=jnp.float32)
    xla_m = NBodyGNN(edge_impl="xla", **kw)
    fused_m = NBodyGNN(edge_impl="fused", **kw)
    params = init_model(xla_m, jax.random.PRNGKey(1), n, n * k)
    return x, pos, edges, xla_m, fused_m, params


def test_fused_odd_n_pads_transparently():
    """N not divisible by 8 (e.g. the CLI-default 500 particles) pads nodes
    + dummy edges internally; forward results match the XLA branch (grads:
    test_fused_odd_n_grads below, slow-marked)."""
    x, pos, edges, xla_m, fused_m, params = _odd_n_setup()
    out_x = xla_m.apply({"params": params}, x, edges, pos,
                        deterministic=True)
    out_f = fused_m.apply({"params": params}, x, edges, pos,
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # fast-mode budget (r5): interpret-mode grad tracing; the
# forward half of the odd-N padding property stays fast above.
def test_fused_odd_n_grads():
    x, pos, edges, xla_m, fused_m, params = _odd_n_setup()

    def loss(m, p):
        return jnp.sum(m.apply({"params": p}, x, edges, pos,
                               deterministic=True) ** 2)

    g_x = jax.grad(lambda p: loss(xla_m, p))(params)
    g_f = jax.grad(lambda p: loss(fused_m, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_x),
                    jax.tree_util.tree_leaves(g_f)):
        scale = np.abs(np.asarray(a)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5 * scale)


def test_auto_resolves_to_xla_on_cpu():
    """edge_impl='auto' must not pick the fused TPU path on CPU."""
    kw = dict(node_input_dim=7, hidden_dim=H, n_layers=1, output_dim=6,
              dropout=0.0, remat=False, dtype=jnp.float32)
    x, pos, edges = _setup(1)
    m = NBodyGNN(edge_impl="auto", **kw)
    params = init_model(m, jax.random.PRNGKey(0), N, E)
    out = m.apply({"params": params}, x, edges, pos, deterministic=True)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_with_remat():
    x, pos, edges = _setup(5)
    kw = dict(node_input_dim=7, hidden_dim=H, n_layers=LAYERS, output_dim=6,
              dropout=0.1, dtype=jnp.float32)
    m_plain = NBodyGNN(edge_impl="fused", remat=False, **kw)
    m_remat = NBodyGNN(edge_impl="fused", remat=True, **kw)
    params = init_model(m_plain, jax.random.PRNGKey(3), N, E)

    def loss(m, p):
        out = m.apply({"params": p}, x, edges, pos, deterministic=True)
        return jnp.sum(out ** 2)

    g1 = jax.grad(lambda p: loss(m_plain, p))(params)
    g2 = jax.grad(lambda p: loss(m_remat, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
