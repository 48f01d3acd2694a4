"""Weight quantization for serving: bf16 / int8 checkpoint compression.

Beyond-reference feature (ROADMAP round-3 stretch; the reference serves the
full-precision torch ``.pt`` only).  Two modes, both *weight-only* — compute
stays in the model's dtype, weights are dequantized on the fly inside the
jitted program so the quantized tree is what lives in HBM/on disk:

- ``bf16``: 2D kernels cast to bfloat16 (1D biases / LayerNorm params stay
  f32 — they are tiny and load-bearing for normalization numerics).
- ``int8``: 2D kernels stored as int8 with a per-output-channel symmetric
  scale (``q = round(w / s)``, ``s = max|w| / 127`` over input rows).  At
  2.55M params this cuts the serving checkpoint ~4x and bounds the per-leaf
  dequantization error at s/2 ~ 0.4% of each channel's max weight.

Quantized checkpoints keep the reference's dict keys (``model_state_dict``,
``norm_stats``, ``model_config`` — ``src/ai/train.py:537-549``) plus a
``"quantization"`` marker, and drop optimizer/scheduler state (serving
artifacts don't resume training).  ``Predictor.load_model`` detects the
marker and dequantizes inside the jitted step, so every downstream surface
(rollouts, serving, evaluation) works unchanged.

XLA note: dequantization is loop-invariant, so inside a scanned rollout the
compiler hoists it out of the loop — the cost is one (params-sized)
elementwise pass per program execution, negligible against the forward.
"""

from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

MODES = ("bf16", "int8")


def _is_kernel(leaf: Any) -> bool:
    """Quantization eligibility: float arrays with ndim >= 2 (Dense/matmul
    kernels).  1D leaves (biases, LayerNorm scale/shift) stay f32."""
    return (hasattr(leaf, "ndim") and leaf.ndim >= 2
            and np.issubdtype(np.asarray(leaf).dtype, np.floating))


def _quant_int8_leaf(w: np.ndarray) -> Dict[str, Any]:
    w = np.asarray(w, np.float32)
    scale = np.max(np.abs(w), axis=tuple(range(w.ndim - 1))) / 127.0
    scale = np.maximum(scale, 1e-12).astype(np.float32)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return {"q": q, "scale": scale}


def _is_quant_leaf(x: Any) -> bool:
    # Structural detection (no marker string — the tree must stay a valid
    # jit argument): an int8 kernel leaf is exactly {"q", "scale"}.  No
    # flax module in this model can collide (params are kernel/bias/
    # scale-shift named); the checkpoint-level "quantization" key is the
    # authoritative marker.
    return isinstance(x, dict) and set(x) == {"q", "scale"}


def quantize_params(params: Any, mode: str) -> Any:
    """Quantize a params pytree. int8 kernel leaves become
    ``{"q": int8, "scale": f32-per-out-channel}``;
    bf16 kernel leaves are cast in place. Non-kernel leaves pass through."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
    if mode == "bf16":
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x).astype(jnp.bfloat16)
            if _is_kernel(x) else x, params)
    return jax.tree_util.tree_map(
        lambda x: _quant_int8_leaf(x) if _is_kernel(x) else x, params)


def dequantize_params(params: Any, dtype=jnp.float32) -> Any:
    """Inverse of :func:`quantize_params`: every leaf back to ``dtype``.
    Safe to call inside jit (and on unquantized trees — it is then a cast).
    Returning ``dtype`` (not bf16) keeps the CPU backend usable, which
    rejects pure-bf16 dots (see CLAUDE.md)."""

    def deq(x):
        if _is_quant_leaf(x):
            return (jnp.asarray(x["q"]).astype(dtype)
                    * jnp.asarray(x["scale"]).astype(dtype))
        if hasattr(x, "ndim") and jnp.issubdtype(
                jnp.asarray(x).dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree_util.tree_map(deq, params, is_leaf=_is_quant_leaf)


def quantize_checkpoint(src: str, dst: str, mode: str) -> Dict[str, Any]:
    """Rewrite a training checkpoint as a quantized SERVING checkpoint:
    same dict keys/filename conventions, ``"quantization"`` marker added,
    optimizer/scheduler state dropped.  Returns ``{"src_bytes", "dst_bytes",
    "ratio", "mode"}``."""
    from nbody_gnn_hpc_tpu.io.model_io import load_checkpoint, save_checkpoint

    ckpt = load_checkpoint(src)
    if ckpt.get("quantization") is not None:
        raise ValueError(
            f"{src} is already a {ckpt['quantization']!r}-quantized serving "
            "checkpoint; quantize the original training checkpoint instead")
    state = ckpt.get("model_state_dict", ckpt)
    save_checkpoint(
        dst,
        params=quantize_params(state, mode),
        best_val_loss=ckpt.get("best_val_loss"),
        history=ckpt.get("history"),
        norm_stats=ckpt.get("norm_stats"),
        model_config=ckpt.get("model_config"),
        extra={"quantization": mode},
    )
    src_b, dst_b = Path(src).stat().st_size, Path(dst).stat().st_size
    return {"src_bytes": src_b, "dst_bytes": dst_b,
            "ratio": round(src_b / max(dst_b, 1), 2), "mode": mode}
