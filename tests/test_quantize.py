"""Weight-only serving quantization (predict/quantize.py): round-trip error
bounds, tree hygiene, Predictor integration, checkpoint round-trip, CLI."""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_gnn_hpc_tpu.io import save_checkpoint
from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
from nbody_gnn_hpc_tpu.predict import (Predictor, dequantize_params,
                                       quantize_checkpoint, quantize_params)

REPO = Path(__file__).parent.parent


def _noisy_predictor(rng, hidden=32, layers=2, n=12, k=5):
    """Predictor whose params are perturbed away from the zero-init head so
    rollouts actually move (quantization deltas become observable)."""
    model = NBodyGNN(node_input_dim=7, hidden_dim=hidden, n_layers=layers,
                     output_dim=6, dropout=0.1)
    params = init_model(model, jax.random.PRNGKey(0), n, n * k)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(key, l.shape, l.dtype)
              for l, key in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    pred = Predictor(model, k_neighbors=k, params=params)
    pred.norm_stats = {
        "state_mean": np.zeros(6, np.float32),
        "state_std": np.ones(6, np.float32),
    }
    return pred


def _inputs(rng, n=12):
    return (rng.randn(n, 3).astype(np.float32),
            rng.randn(n, 3).astype(np.float32) * 0.1,
            rng.uniform(1e10, 1e12, n).astype(np.float32))


def test_int8_roundtrip_error_bounded(rng):
    w = {"kernel": rng.randn(64, 32).astype(np.float32) * 0.3,
         "bias": rng.randn(32).astype(np.float32)}
    q = quantize_params(w, "int8")
    assert set(q["kernel"]) == {"q", "scale"}
    assert q["kernel"]["q"].dtype == np.int8
    assert q["kernel"]["scale"].shape == (32,)
    # bias (1D) untouched
    np.testing.assert_array_equal(np.asarray(q["bias"]), w["bias"])
    deq = dequantize_params(q)
    # symmetric rounding: per-element error <= scale/2
    err = np.abs(np.asarray(deq["kernel"]) - w["kernel"])
    assert np.all(err <= np.asarray(q["kernel"]["scale"]) / 2 + 1e-7)


def test_bf16_casts_kernels_only(rng):
    w = {"kernel": rng.randn(16, 8).astype(np.float32),
         "bias": rng.randn(8).astype(np.float32)}
    q = quantize_params(w, "bf16")
    assert np.asarray(q["kernel"]).dtype == jnp.bfloat16
    assert np.asarray(q["bias"]).dtype == np.float32
    deq = dequantize_params(q)
    assert np.asarray(deq["kernel"]).dtype == np.float32
    np.testing.assert_allclose(np.asarray(deq["kernel"]), w["kernel"],
                               rtol=1e-2, atol=1e-2)


def test_dequantize_plain_tree_is_cast_noop(rng):
    w = {"a": rng.randn(4, 4).astype(np.float32), "step": 3}
    out = dequantize_params(w)
    np.testing.assert_array_equal(np.asarray(out["a"]), w["a"])
    assert out["step"] == 3


def test_bad_mode_raises():
    with pytest.raises(ValueError, match="mode"):
        quantize_params({}, "fp4")


@pytest.mark.parametrize(
    "mode,rtol",
    [  # fast-mode budget (r5): one rollout-equality mode (int8, the tighter
       # quantization) stays fast; bf16 runs in full mode.
     pytest.param("bf16", 2e-2, marks=pytest.mark.slow),
     ("int8", 5e-2)])
def test_predictor_quantized_close_to_f32(rng, mode, rtol):
    pred = _noisy_predictor(rng)
    pos, vel, masses = _inputs(rng)
    base = pred.predict_rollout(pos, vel, masses, n_steps=5)
    pred.quantize(mode)
    assert pred.quantization == mode
    quant = pred.predict_rollout(pos, vel, masses, n_steps=5)
    scale = np.abs(base["positions"]).max()
    np.testing.assert_allclose(quant["positions"], base["positions"],
                               rtol=rtol, atol=rtol * scale)
    with pytest.raises(ValueError, match="already"):
        pred.quantize(mode)


def test_quantized_checkpoint_roundtrip(rng, tmp_path):
    pred = _noisy_predictor(rng)
    src = tmp_path / "best_model.pt"
    save_checkpoint(src, params=pred.params, norm_stats=pred.norm_stats,
                    model_config={"node_input_dim": 7, "hidden_dim": 32,
                                  "n_layers": 2, "output_dim": 6,
                                  "dropout": 0.1})
    dst = tmp_path / "best_model.int8.pt"
    info = quantize_checkpoint(str(src), str(dst), "int8")
    assert dst.stat().st_size < src.stat().st_size
    assert info["mode"] == "int8"

    loaded = Predictor(pred.model, str(dst), k_neighbors=pred.k_neighbors)
    assert loaded.quantization == "int8"
    pos, vel, masses = _inputs(rng)
    base = pred.predict_single(pos, vel, masses)
    quant = loaded.predict_single(pos, vel, masses)
    scale = np.abs(base[0]).max()
    np.testing.assert_allclose(quant[0], base[0], atol=5e-2 * scale)


def test_requantize_rejected(rng, tmp_path):
    """Quantizing an already-quantized serving checkpoint is refused
    (review r3: bf16->int8 would silently compound precision loss and
    int8->bf16 would mislabel the mode)."""
    pred = _noisy_predictor(rng)
    src = tmp_path / "m.pt"
    save_checkpoint(src, params=pred.params, norm_stats=pred.norm_stats)
    dst = tmp_path / "m.bf16.pt"
    quantize_checkpoint(str(src), str(dst), "bf16")
    with pytest.raises(ValueError, match="already"):
        quantize_checkpoint(str(dst), str(tmp_path / "m2.pt"), "int8")


def test_quantize_cli(rng, tmp_path):
    model = NBodyGNN(node_input_dim=7, hidden_dim=16, n_layers=1,
                     output_dim=6)
    params = init_model(model, jax.random.PRNGKey(0), 8, 8 * 3)
    src = tmp_path / "m.pt"
    save_checkpoint(src, params=params)
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts/quantize_model.py"),
         "-m", str(src), "--mode", "int8"],
        capture_output=True, text=True, timeout=240)
    assert out.returncode == 0, out.stderr
    assert (tmp_path / "m.int8.pt").exists()
    assert "smaller" in out.stdout
