"""Fused edge-stream kernel for the ParticleInteractionLayer (Pallas/TPU).

The GNN's per-layer hot path is the (E, H) edge stream (E = N*k = 8000,
H = 256 in production): target-gather -> add source/edge projections ->
LayerNorm -> SiLU -> dropout -> sum-aggregate at targets.  The XLA
formulation (models/gnn.py, gather_mode="matmul") runs the two one-hot
matmuls on the MXU but round-trips several (E, H) tensors through HBM per
layer; measured ~2.2 ms of each 2.8 ms layer step is this non-matmul
traffic (v5e, b24).

This module fuses the whole stream into one Pallas kernel: edge tiles of
E_t = 8*k rows live in VMEM end-to-end, dropout masks are generated
in-kernel (``pltpu.prng_random_bits``), and the only HBM traffic per layer
is the (N, H) projections in and the (N, H) aggregate out.  A hand-written
custom VJP recomputes the tile stream in the backward pass (the fused
analogue of remat) and emits cotangents for every differentiable input —
including the edge features, so gradient flows through positions for the
K-step rollout-tuning objective (train/rollout_tune.py).

Semantics (parity with the XLA branch, reference ``src/ai/model.py:38-61``):

    z    = adj^T @ t_proj + repeat(s_proj, k) + e_attr @ W_e      (E, H)
    y    = LayerNorm(z) * gamma + beta        (fast variance, eps 1e-6)
    a    = silu(y)
    a    = dropout(a, p)                      (train mode only)
    out  = adj @ a                            (N, H), f32 accumulation

Differences from the XLA branch are precision-level only: the fused stream
accumulates in f32 where the bf16 XLA branch stores bf16 intermediates, and
dropout draws from the TPU core PRNG instead of the jax threefry/rbg stream
(identical Bernoulli(1-p) semantics, different bits).

Layout requirements: row-regular edges (row == repeat(arange(N), k) — every
builder in ops/knn.py) and N % 8 == 0.  The layer falls back to the XLA
branch otherwise.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6  # flax.linen.LayerNorm default


def _tile_sources(n: int, k: int, cap: int = 2048) -> int:
    """Sources per tile: the largest multiple-of-8 divisor of n with
    g*k <= cap (bigger tiles amortize grid-step overhead; 8 always works
    for n % 8 == 0)."""
    best = 8
    for g in range(8, n + 1, 8):
        if n % g == 0 and g * k <= cap:
            best = g
    return best


def _threshold(p: float) -> int:
    """uint32 threshold with P(bits < threshold) ~= p (exact to 2^-32)."""
    return min(int(round(p * 4294967296.0)), 4294967295)


def _ln_silu(zpre, gamma, beta):
    """f32 LayerNorm (fast variance) + SiLU; returns (act, xhat, y, sig)."""
    mu = jnp.mean(zpre, axis=1, keepdims=True)
    var = jnp.mean(zpre * zpre, axis=1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + EPS)
    xhat = (zpre - mu) * rstd
    y = xhat * gamma + beta
    sig = jax.nn.sigmoid(y)
    return y * sig, xhat, y, sig, rstd


def _tile_zpre(t, tp_ref, sp_ref, ea_ref, we_ref, adjT_ref, g, k):
    """Recompute the pre-LN tile stream (E_t, H) for grid step t."""
    e_t = g * k
    adjT = adjT_ref[...]                                     # (E_t, N) bf16
    zt = jnp.dot(adjT, tp_ref[...],
                 preferred_element_type=jnp.float32)          # (E_t, H)
    sb = sp_ref[pl.ds(t * g, g), :].astype(jnp.float32)       # (g, H)
    h = sb.shape[-1]
    zsrc = jnp.broadcast_to(sb[:, None, :], (g, k, h)).reshape(e_t, h)
    ze = jnp.dot(ea_ref[...], we_ref[...],
                 preferred_element_type=jnp.float32)          # (E_t, H)
    return adjT, zt + zsrc + ze


def _fwd_kernel(seed_ref, tp_ref, sp_ref, ea_ref, we_ref, g_ref, b_ref,
                adjT_ref, out_ref, acc, *, g, k, thr, inv_keep, training, cd):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    adjT, zpre = _tile_zpre(t, tp_ref, sp_ref, ea_ref, we_ref, adjT_ref, g, k)
    act, _, _, _, _ = _ln_silu(zpre, g_ref[...], b_ref[...])
    if training:
        pltpu.prng_seed(seed_ref[0, 0] + t)
        bits = pltpu.bitcast(pltpu.prng_random_bits(act.shape), jnp.uint32)
        act = jnp.where(bits >= jnp.uint32(thr), act * inv_keep, 0.0)
    acc[...] += jax.lax.dot_general(
        adjT, act.astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = acc[...]


def _bwd_kernel(seed_ref, tp_ref, sp_ref, ea_ref, we_ref, g_ref, b_ref,
                adjT_ref, gout_ref,
                dtp_ref, dsp_ref, dea_ref, dwe_ref, dg_ref, db_ref,
                acc_dtp, acc_dwe, acc_dg, acc_db,
                *, g, k, thr, inv_keep, training, cd):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc_dtp[...] = jnp.zeros_like(acc_dtp)
        acc_dwe[...] = jnp.zeros_like(acc_dwe)
        acc_dg[...] = jnp.zeros_like(acc_dg)
        acc_db[...] = jnp.zeros_like(acc_db)

    gamma = g_ref[...]
    adjT, zpre = _tile_zpre(t, tp_ref, sp_ref, ea_ref, we_ref, adjT_ref, g, k)
    _, xhat, y, sig, rstd = _ln_silu(zpre, gamma, b_ref[...])

    # d(out)/d(act): out = adj @ act  =>  d_act = adj^T @ g_out
    d_act = jnp.dot(adjT, gout_ref[...].astype(cd),
                    preferred_element_type=jnp.float32)       # (E_t, H)
    if training:
        pltpu.prng_seed(seed_ref[0, 0] + t)
        bits = pltpu.bitcast(pltpu.prng_random_bits(d_act.shape), jnp.uint32)
        d_act = jnp.where(bits >= jnp.uint32(thr), d_act * inv_keep, 0.0)
    # silu'(y) = sig * (1 + y * (1 - sig))
    d_y = d_act * (sig * (1.0 + y * (1.0 - sig)))
    acc_dg[...] += jnp.sum(d_y * xhat, axis=0, keepdims=True)
    acc_db[...] += jnp.sum(d_y, axis=0, keepdims=True)
    d_xhat = d_y * gamma
    m1 = jnp.mean(d_xhat, axis=1, keepdims=True)
    m2 = jnp.mean(d_xhat * xhat, axis=1, keepdims=True)
    d_zpre = rstd * (d_xhat - m1 - xhat * m2)                 # (E_t, H) f32

    d_zpre_bf = d_zpre.astype(cd)
    acc_dtp[...] += jax.lax.dot_general(
        adjT, d_zpre_bf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (N, H)
    h = d_zpre.shape[-1]
    dsp_ref[...] = jnp.sum(d_zpre.reshape(g, k, h), axis=1
                           ).astype(dsp_ref.dtype)            # (G, H)
    dea_ref[...] = jax.lax.dot_general(
        d_zpre, we_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (E_t, 8)
    acc_dwe[...] += jax.lax.dot_general(
        ea_ref[...], d_zpre, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (8, H)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        dtp_ref[...] = acc_dtp[...].astype(dtp_ref.dtype)
        dwe_ref[...] = acc_dwe[...]
        dg_ref[...] = acc_dg[...]
        db_ref[...] = acc_db[...]


@functools.lru_cache(maxsize=None)
def _build(n: int, e: int, h: int, k: int, p: float, training: bool,
           interpret: bool, bf16_stream: bool):
    """Specialized custom-vjp fused layer for one (n, e, h, k, p, mode)."""
    g = _tile_sources(n, k)
    e_t = g * k
    n_tiles = n // g
    thr = _threshold(p) if training else 0
    inv_keep = 1.0 / (1.0 - p) if training else 1.0
    # The stream cast dtype follows the model's compute dtype: bf16 models
    # aggregate in bf16 (MXU fast path), f32 models stay f32 end-to-end —
    # evaluate.py/serve.py deliberately rebuild models at f32 for inference
    # and must not silently lose precision here.  Interpreter mode is
    # always f32 (pure-bf16 dots are rejected by the jax-0.9 CPU thunks).
    cd = jnp.bfloat16 if (bf16_stream and not interpret) else jnp.float32
    common = dict(g=g, k=k, thr=thr, inv_keep=inv_keep, training=training, cd=cd)

    def fwd_call(tp, sp, ea, we, ga, be, adjT, seed):
        return pl.pallas_call(
            functools.partial(_fwd_kernel, **common),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # seed
                pl.BlockSpec((n, h), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # t_proj
                pl.BlockSpec((n, h), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # s_proj
                pl.BlockSpec((e_t, 8), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),          # e_attr8
                pl.BlockSpec((8, h), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # w_e8
                pl.BlockSpec((1, h), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # gamma
                pl.BlockSpec((1, h), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # beta
                pl.BlockSpec((e_t, n), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),          # adjT
            ],
            out_specs=pl.BlockSpec((n, h), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, h), jnp.float32),
            scratch_shapes=[pltpu.VMEM((n, h), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * e * h * (2 * n + 8) + 40 * e * h,
                bytes_accessed=(2 * n * h * 2 + e * 8 * 4 + e * n * 2
                                + n * h * 4),
                transcendentals=2 * e * h),
        )(seed, tp, sp, ea, we, ga, be, adjT)

    def bwd_call(tp, sp, ea, we, ga, be, adjT, seed, gout):
        return pl.pallas_call(
            functools.partial(_bwd_kernel, **common),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # seed
                pl.BlockSpec((n, h), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # t_proj
                pl.BlockSpec((n, h), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # s_proj
                pl.BlockSpec((e_t, 8), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),          # e_attr8
                pl.BlockSpec((8, h), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # w_e8
                pl.BlockSpec((1, h), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # gamma
                pl.BlockSpec((1, h), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # beta
                pl.BlockSpec((e_t, n), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),          # adjT
                pl.BlockSpec((n, h), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # g_out
            ],
            out_specs=[
                pl.BlockSpec((n, h), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # d_tp
                pl.BlockSpec((g, h), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),          # d_sp
                pl.BlockSpec((e_t, 8), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),          # d_ea
                pl.BlockSpec((8, h), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # d_we
                pl.BlockSpec((1, h), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # d_gamma
                pl.BlockSpec((1, h), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),          # d_beta
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, h), tp.dtype),
                jax.ShapeDtypeStruct((n, h), sp.dtype),
                jax.ShapeDtypeStruct((e, 8), jnp.float32),
                jax.ShapeDtypeStruct((8, h), jnp.float32),
                jax.ShapeDtypeStruct((1, h), jnp.float32),
                jax.ShapeDtypeStruct((1, h), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((n, h), jnp.float32),
                            pltpu.VMEM((8, h), jnp.float32),
                            pltpu.VMEM((1, h), jnp.float32),
                            pltpu.VMEM((1, h), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(seed, tp, sp, ea, we, ga, be, adjT, gout)

    @jax.custom_vjp
    def fused(tp, sp, ea, we, ga, be, adjT, seed):
        return fwd_call(tp, sp, ea, we, ga, be, adjT, seed)

    def fused_fwd(tp, sp, ea, we, ga, be, adjT, seed):
        out = fwd_call(tp, sp, ea, we, ga, be, adjT, seed)
        return out, (tp, sp, ea, we, ga, be, adjT, seed)

    def fused_bwd(res, gout):
        tp, sp, ea, we, ga, be, adjT, seed = res
        d_tp, d_sp, d_ea, d_we, d_ga, d_be = bwd_call(
            tp, sp, ea, we, ga, be, adjT, seed, gout)
        return (d_tp, d_sp, d_ea, d_we, d_ga, d_be,
                jnp.zeros_like(adjT),
                np.zeros(seed.shape, dtype=jax.dtypes.float0))

    fused.defvjp(fused_fwd, fused_bwd)
    # Building blocks for the fully-fused layer (ops/fused_edge_full.py):
    # its backward pass reuses this bwd kernel verbatim (the tile-stream
    # math and dropout seeding are identical).
    fused.fwd_call = fwd_call
    fused.bwd_call = bwd_call
    return fused


def fused_edge_layer(t_proj: jnp.ndarray, s_proj: jnp.ndarray,
                     edge_attr: jnp.ndarray, w_e: jnp.ndarray,
                     gamma: jnp.ndarray, beta: jnp.ndarray,
                     adjT: jnp.ndarray, seed: jnp.ndarray,
                     *, k: int, dropout_p: float = 0.0,
                     deterministic: bool = True,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused edge stream: (N, H) projections -> (N, H) target aggregate.

    Args:
        t_proj:    (N, H) target-node projection (bias included).
        s_proj:    (N, H) source-node projection.
        edge_attr: (E, D) edge features, D <= 8 (production D = 5).
        w_e:       (D, H) edge-feature projection kernel.
        gamma/beta:(H,) LayerNorm scale/bias.
        adjT:      (E, N) one-hot edge->target matrix (bfloat16).
        seed:      (1, 1) int32 dropout seed (ignored when deterministic).
        k:         edges per source row (row-regular layout).
        dropout_p: dropout rate.
        deterministic: disables dropout.
        interpret: run the kernel in interpreter mode (CPU tests).

    Returns:
        (N, H) float32 per-target sums of the processed edge messages.

    N need not be a multiple of 8: the wrapper pads nodes (and their k
    dummy edges) up to the next multiple.  Padded edges have all-zero adjT
    rows, so they aggregate nothing; the pad/slice ops live OUTSIDE the
    custom VJP, so jax differentiates through them automatically.
    """
    n, h = t_proj.shape
    e, d = edge_attr.shape
    if e != n * k:
        raise ValueError(f"fused_edge_layer needs row-regular E==N*k; "
                         f"got N={n}, E={e}, k={k}")
    n_orig = n
    pad_n = (-n) % 8
    if pad_n:
        t_proj = jnp.pad(t_proj, ((0, pad_n), (0, 0)))
        s_proj = jnp.pad(s_proj, ((0, pad_n), (0, 0)))
        edge_attr = jnp.pad(edge_attr, ((0, pad_n * k), (0, 0)))
        adjT = jnp.pad(adjT, ((0, pad_n * k), (0, pad_n)))
        n += pad_n
        e += pad_n * k
    ea8 = jnp.pad(edge_attr.astype(jnp.float32), ((0, 0), (0, 8 - d)))
    we8 = jnp.pad(w_e.astype(jnp.float32), ((0, 8 - d), (0, 0)))
    training = (not deterministic) and dropout_p > 0.0
    bf16_stream = t_proj.dtype == jnp.bfloat16
    fn = _build(n, e, h, k, float(dropout_p), training, bool(interpret),
                bf16_stream)
    adj_dtype = (jnp.bfloat16 if (bf16_stream and not interpret)
                 else jnp.float32)
    out = fn(t_proj, s_proj, ea8, we8,
             gamma.reshape(1, h).astype(jnp.float32),
             beta.reshape(1, h).astype(jnp.float32),
             adjT.astype(adj_dtype), seed.astype(jnp.int32))
    return out[:n_orig] if pad_n else out
