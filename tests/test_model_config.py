"""model_from_config: dtype/remat round-trip through config.json dicts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_gnn_hpc_tpu.models import (count_parameters, init_model,
                                      model_from_config)
from nbody_gnn_hpc_tpu.ops import fully_connected_edge_index

CFG = {"node_input_dim": 7, "hidden_dim": 16, "n_layers": 2, "output_dim": 6,
       "dropout": 0.1, "dtype": "bfloat16", "remat": False}


def test_dtype_roundtrip():
    m = model_from_config(CFG)
    assert m.dtype == jnp.bfloat16
    assert m.remat is False
    assert m.hidden_dim == 16


def test_dtype_override_for_inference():
    m = model_from_config(CFG, dtype_override="float32")
    assert m.dtype == jnp.float32


def test_bf16_and_f32_share_checkpoints(rng):
    """Params are float32 regardless of compute dtype: a bf16-trained
    checkpoint loads into an f32 inference model unchanged."""
    n = 8
    e = jnp.asarray(fully_connected_edge_index(n))
    m16 = model_from_config(CFG)
    params = init_model(m16, jax.random.PRNGKey(0), n, int(e.shape[1]))
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(params))

    m32 = model_from_config(CFG, dtype_override="float32")
    x = jnp.asarray(rng.randn(n, 7), jnp.float32)
    out16 = m16.apply({"params": params}, x, e, deterministic=True)
    out32 = m32.apply({"params": params}, x, e, deterministic=True)
    assert out32.dtype == jnp.float32
    # Zero-init head: both exactly identity regardless of compute dtype.
    np.testing.assert_array_equal(np.asarray(out16), np.asarray(x[:, :6]))
    np.testing.assert_array_equal(np.asarray(out32), np.asarray(x[:, :6]))


@pytest.mark.slow  # fast-mode budget (r5): inits the model at three dtypes;
# test_bf16_and_f32_share_checkpoints keeps dtype/checkpoint parity fast.
def test_param_count_independent_of_dtype():
    cfg = dict(CFG, hidden_dim=256, n_layers=6)
    m = model_from_config(cfg)
    params = init_model(m, jax.random.PRNGKey(0), 8, 16)
    assert count_parameters(params) == 2_550_150
