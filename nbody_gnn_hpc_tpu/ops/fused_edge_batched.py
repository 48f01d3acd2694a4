"""Batch-folded fused edge-stream kernel (Pallas/TPU, round 3).

The round-2 kernel (ops/fused_edge.py) runs per graph under ``vmap``: the
lifted grid executes B x n_tiles steps whose matmuls are only H=256 wide —
measured ~6% MXU utilization on the v5e (profile_train_step.py: 10.7 ms of
the 18.7 ms b24 train step is the kernel).  This module folds the GRAPH
BATCH into the lane dimension instead:

    t_proj (B, N, H)  ->  TPw (N, B*H)     [graph-blocked lanes]

so every adjacency matmul becomes (E_t, N) @ (N, BC*H) — thousands of lanes
wide — and one grid step processes BC graphs at once.  The LayerNorm /
SiLU / dropout stream operates on (E_t, BC, H) lane-split views (per-edge,
per-graph statistics over H only), which Mosaic handles as pure views.

Semantics are identical to ``fused_edge_layer`` (reference
``src/ai/model.py:38-61``): adjacency gather + source/edge projections ->
LayerNorm -> SiLU -> dropout -> per-target sum.  Dropout draws from the TPU
core PRNG seeded per (chunk, tile), so masks differ from the per-graph
kernel's (identical Bernoulli semantics).

Layout requirements match the per-graph kernel: row-regular edges
(row == repeat(arange(N), k)); any N (the wrapper pads to a multiple of 8).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_gnn_hpc_tpu.ops.fused_edge import EPS, _threshold
from nbody_gnn_hpc_tpu.ops.fused_edge import _tile_sources as _tile_sources_cap

# Lane width budget per grid step (BC graphs x H lanes).  The (E_t, W)
# f32 stream planes (several live at once through LN/SiLU/dropout) plus
# the (N, W) accumulator must fit VMEM: 3072 measured SLOWER than the
# per-graph kernel (25 ms vs 13.9 ms b24 step — spills), 1024 is the
# measured sweet spot.
MAX_WIDTH = 1024
# Edge rows per tile (g sources x k edges); the VMEM ceiling for the
# (E_t, W) f32 stream planes.
MAX_TILE_E = 1024


def _chunk_graphs(b: int, h: int, max_width: int = None) -> int:
    """Largest divisor of b with bc * h <= max_width."""
    max_width = max_width or MAX_WIDTH
    best = 1
    for bc in range(1, b + 1):
        if b % bc == 0 and bc * h <= max_width:
            best = bc
    return best


def _tile_sources(n: int, k: int) -> int:
    """Largest multiple-of-8 divisor of n with g * k <= MAX_TILE_E (shared
    helper from fused_edge, bound to this kernel's edge-row budget)."""
    return _tile_sources_cap(n, k, cap=MAX_TILE_E)


def _slab_stream(b, t, zt, sp_ref, ea_ref, we_ref, gw_ref, bw_ref,
                 g, k, h):
    """Per-graph (E_t, H) slab of the pre-LN stream + LN + SiLU.

    Lane-dim reshapes in Mosaic are relayouts (measured: a lane-split LN
    made the whole kernel 2x slower than per-graph), so all elementwise
    work runs on 128-aligned lane-block SLABS of the wide tile — the same
    well-tiled (E_t, H) shapes as the per-graph kernel — while the
    adjacency matmuls stay wide.
    """
    e_t = g * k
    zt_b = zt[:, b * h:(b + 1) * h]                         # lane slice
    sb = sp_ref[pl.ds(t * g, g), b * h:(b + 1) * h].astype(jnp.float32)
    zsrc = jnp.broadcast_to(sb[:, None, :], (g, k, h)).reshape(e_t, h)
    ze = jnp.dot(ea_ref[b], we_ref[...],
                 preferred_element_type=jnp.float32)        # (E_t, H)
    zpre = zt_b + zsrc + ze
    mu = jnp.mean(zpre, axis=1, keepdims=True)
    var = jnp.mean(zpre * zpre, axis=1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + EPS)
    xhat = (zpre - mu) * rstd
    y = xhat * gw_ref[0:1, b * h:(b + 1) * h] \
        + bw_ref[0:1, b * h:(b + 1) * h]
    sig = jax.nn.sigmoid(y)
    return y * sig, xhat, y, sig, rstd


def _fwd_kernel(seed_ref, tp_ref, sp_ref, ea_ref, we_ref, gw_ref, bw_ref,
                adjT_ref, out_ref, acc, act_s, *, g, k, bc, h, n_tiles, thr,
                inv_keep, training, cd):
    c = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    adjT = adjT_ref[...]                                    # (E_t, N)
    zt = jnp.dot(adjT, tp_ref[...],
                 preferred_element_type=jnp.float32)        # (E_t, W) wide
    if training:
        pltpu.prng_seed(seed_ref[0, 0] + c * n_tiles + t)
    for b in range(bc):
        act, _, _, _, _ = _slab_stream(b, t, zt, sp_ref, ea_ref, we_ref,
                                       gw_ref, bw_ref, g, k, h)
        if training:
            bits = pltpu.bitcast(pltpu.prng_random_bits(act.shape),
                                 jnp.uint32)
            act = jnp.where(bits >= jnp.uint32(thr), act * inv_keep, 0.0)
        act_s[:, b * h:(b + 1) * h] = act.astype(act_s.dtype)
    acc[...] += jax.lax.dot_general(
        adjT, act_s[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (N, W) wide

    @pl.when(t == n_tiles - 1)
    def _():
        out_ref[...] = acc[...]


def _bwd_kernel(seed_ref, tp_ref, sp_ref, ea_ref, we_ref, gw_ref, bw_ref,
                adjT_ref, gout_ref,
                dtp_ref, dsp_ref, dea_ref, dwe_ref, dgw_ref, dbw_ref,
                acc_dtp, acc_dwe, acc_dg, acc_db, dz_s,
                *, g, k, bc, h, n_tiles, thr, inv_keep, training, cd):
    c = pl.program_id(0)
    t = pl.program_id(1)
    e_t = g * k

    @pl.when(t == 0)
    def _():
        acc_dtp[...] = jnp.zeros_like(acc_dtp)
        acc_dg[...] = jnp.zeros_like(acc_dg)
        acc_db[...] = jnp.zeros_like(acc_db)

    @pl.when(jnp.logical_and(c == 0, t == 0))
    def _():
        acc_dwe[...] = jnp.zeros_like(acc_dwe)

    adjT = adjT_ref[...]
    zt = jnp.dot(adjT, tp_ref[...],
                 preferred_element_type=jnp.float32)        # (E_t, W) wide
    d_act_w = jnp.dot(adjT, gout_ref[...].astype(cd),
                      preferred_element_type=jnp.float32)   # (E_t, W) wide
    if training:
        pltpu.prng_seed(seed_ref[0, 0] + c * n_tiles + t)
    for b in range(bc):
        # IMPORTANT: random bits must be drawn in the same order as the
        # forward pass (one draw per slab, b ascending).
        _, xhat, y, sig, rstd = _slab_stream(b, t, zt, sp_ref, ea_ref,
                                             we_ref, gw_ref, bw_ref,
                                             g, k, h)
        d_act = d_act_w[:, b * h:(b + 1) * h]
        if training:
            bits = pltpu.bitcast(pltpu.prng_random_bits(d_act.shape),
                                 jnp.uint32)
            d_act = jnp.where(bits >= jnp.uint32(thr), d_act * inv_keep,
                              0.0)
        d_y = d_act * (sig * (1.0 + y * (1.0 - sig)))
        acc_dg[0:1, b * h:(b + 1) * h] += jnp.sum(d_y * xhat, axis=0,
                                                  keepdims=True)
        acc_db[0:1, b * h:(b + 1) * h] += jnp.sum(d_y, axis=0,
                                                  keepdims=True)
        d_xhat = d_y * gw_ref[0:1, b * h:(b + 1) * h]
        m1 = jnp.mean(d_xhat, axis=1, keepdims=True)
        m2 = jnp.mean(d_xhat * xhat, axis=1, keepdims=True)
        d_zpre = rstd * (d_xhat - m1 - xhat * m2)           # (E_t, H)
        dz_s[:, b * h:(b + 1) * h] = d_zpre.astype(dz_s.dtype)
        dsp_ref[pl.ds(t * g, g), b * h:(b + 1) * h] = jnp.sum(
            d_zpre.reshape(g, k, h), axis=1).astype(dsp_ref.dtype)
        dea_ref[b] = jax.lax.dot_general(
            d_zpre, we_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (E_t, 8)
        acc_dwe[...] += jax.lax.dot_general(
            ea_ref[b], d_zpre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (8, H)

    acc_dtp[...] += jax.lax.dot_general(
        adjT, dz_s[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (N, W) wide

    @pl.when(t == n_tiles - 1)
    def _():
        dtp_ref[...] = acc_dtp[...].astype(dtp_ref.dtype)
        dgw_ref[...] = acc_dg[...]
        dbw_ref[...] = acc_db[...]

    @pl.when(jnp.logical_and(c == pl.num_programs(0) - 1, t == n_tiles - 1))
    def _():
        dwe_ref[...] = acc_dwe[...]


@functools.lru_cache(maxsize=None)
def _build(n: int, e: int, h: int, k: int, b: int, p: float, training: bool,
           interpret: bool, bf16_stream: bool, max_width: int):
    """Specialized custom-vjp batched fused layer for one shape/mode."""
    g = _tile_sources(n, k)
    e_t = g * k
    n_tiles = n // g
    bc = _chunk_graphs(b, h, max_width)
    n_chunks = b // bc
    w = bc * h
    thr = _threshold(p) if training else 0
    inv_keep = 1.0 / (1.0 - p) if training else 1.0
    cd = jnp.bfloat16 if (bf16_stream and not interpret) else jnp.float32
    common = dict(g=g, k=k, bc=bc, h=h, n_tiles=n_tiles, thr=thr,
                  inv_keep=inv_keep, training=training, cd=cd)
    grid = (n_chunks, n_tiles)

    # BlockSpecs shared between fwd and bwd.
    spec_seed = pl.BlockSpec((1, 1), lambda c, t: (0, 0),
                             memory_space=pltpu.VMEM)
    spec_nw = pl.BlockSpec((n, w), lambda c, t: (0, c),
                           memory_space=pltpu.VMEM)          # (N, B*H) chunk
    spec_ea = pl.BlockSpec((bc, e_t, 8), lambda c, t: (c, t, 0),
                           memory_space=pltpu.VMEM)
    spec_we = pl.BlockSpec((8, h), lambda c, t: (0, 0),
                           memory_space=pltpu.VMEM)
    spec_1w = pl.BlockSpec((1, w), lambda c, t: (0, c),
                           memory_space=pltpu.VMEM)          # gammaW chunk
    spec_adjT = pl.BlockSpec((e_t, n), lambda c, t: (t, 0),
                             memory_space=pltpu.VMEM)

    def fwd_call(tp, sp, ea, we, gw, bw, adjT, seed):
        return pl.pallas_call(
            functools.partial(_fwd_kernel, **common),
            grid=grid,
            in_specs=[spec_seed, spec_nw, spec_nw, spec_ea, spec_we,
                      spec_1w, spec_1w, spec_adjT],
            out_specs=spec_nw,
            out_shape=jax.ShapeDtypeStruct((n, b * h), jnp.float32),
            scratch_shapes=[pltpu.VMEM((n, w), jnp.float32),
                            pltpu.VMEM((e_t, w), cd)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * e * n * b * h * 2 + 40 * e * b * h,
                bytes_accessed=(2 * n * b * h * 2 + b * e * 8 * 4
                                + e * n * 2 + n * b * h * 4),
                transcendentals=2 * e * b * h),
        )(seed, tp, sp, ea, we, gw, bw, adjT)

    def bwd_call(tp, sp, ea, we, gw, bw, adjT, seed, gout):
        return pl.pallas_call(
            functools.partial(_bwd_kernel, **common),
            grid=grid,
            in_specs=[spec_seed, spec_nw, spec_nw, spec_ea, spec_we,
                      spec_1w, spec_1w, spec_adjT, spec_nw],
            out_specs=[spec_nw, spec_nw, spec_ea, spec_we, spec_1w, spec_1w],
            out_shape=[
                jax.ShapeDtypeStruct((n, b * h), tp.dtype),    # d_tp
                jax.ShapeDtypeStruct((n, b * h), sp.dtype),    # d_sp
                jax.ShapeDtypeStruct((b, e, 8), jnp.float32),  # d_ea
                jax.ShapeDtypeStruct((8, h), jnp.float32),     # d_we
                jax.ShapeDtypeStruct((1, b * h), jnp.float32),  # d_gammaW
                jax.ShapeDtypeStruct((1, b * h), jnp.float32),  # d_betaW
            ],
            scratch_shapes=[pltpu.VMEM((n, w), jnp.float32),
                            pltpu.VMEM((8, h), jnp.float32),
                            pltpu.VMEM((1, w), jnp.float32),
                            pltpu.VMEM((1, w), jnp.float32),
                            pltpu.VMEM((e_t, w), cd)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(seed, tp, sp, ea, we, gw, bw, adjT, gout)

    @jax.custom_vjp
    def fused(tp, sp, ea, we, gw, bw, adjT, seed):
        return fwd_call(tp, sp, ea, we, gw, bw, adjT, seed)

    def fused_fwd(tp, sp, ea, we, gw, bw, adjT, seed):
        out = fwd_call(tp, sp, ea, we, gw, bw, adjT, seed)
        return out, (tp, sp, ea, we, gw, bw, adjT, seed)

    def fused_bwd(res, gout):
        tp, sp, ea, we, gw, bw, adjT, seed = res
        d_tp, d_sp, d_ea, d_we, d_gw, d_bw = bwd_call(
            tp, sp, ea, we, gw, bw, adjT, seed, gout.astype(jnp.float32))
        return (d_tp, d_sp, d_ea, d_we, d_gw, d_bw,
                jnp.zeros_like(adjT),
                np.zeros(seed.shape, dtype=jax.dtypes.float0))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_edge_layer_batched(t_proj: jnp.ndarray, s_proj: jnp.ndarray,
                             edge_attr: jnp.ndarray, w_e: jnp.ndarray,
                             gamma: jnp.ndarray, beta: jnp.ndarray,
                             adjT: jnp.ndarray, seed: jnp.ndarray,
                             *, k: int, dropout_p: float = 0.0,
                             deterministic: bool = True,
                             interpret: bool = False,
                             max_width: int = None) -> jnp.ndarray:
    """Batched fused edge stream: (B, N, H) projections -> (B, N, H) sums.

    Args:
        t_proj:    (B, N, H) target-node projections (bias included).
        s_proj:    (B, N, H) source-node projections.
        edge_attr: (B, E, D) edge features, D <= 8.
        w_e:       (D, H) edge projection kernel (shared across graphs).
        gamma/beta:(H,) LayerNorm params (shared).
        adjT:      (E, N) one-hot edge->target matrix (shared).
        seed:      (1, 1) int32 dropout seed.
        k:         edges per source row.

    Returns:
        (B, N, H) float32 per-target sums.

    N pads internally to a multiple of 8 (zero adjT rows aggregate nothing).
    """
    bsz, n, h = t_proj.shape
    e, d = edge_attr.shape[-2:]
    if e != n * k:
        raise ValueError(f"batched fused edge needs E==N*k; "
                         f"got N={n}, E={e}, k={k}")
    n_orig = n
    pad_n = (-n) % 8
    if pad_n:
        t_proj = jnp.pad(t_proj, ((0, 0), (0, pad_n), (0, 0)))
        s_proj = jnp.pad(s_proj, ((0, 0), (0, pad_n), (0, 0)))
        edge_attr = jnp.pad(edge_attr, ((0, 0), (0, pad_n * k), (0, 0)))
        adjT = jnp.pad(adjT, ((0, pad_n * k), (0, pad_n)))
        n += pad_n
        e += pad_n * k
    # Lane-fold the batch: (B, N, H) -> (N, B*H).
    tpw = jnp.transpose(t_proj, (1, 0, 2)).reshape(n, bsz * h)
    spw = jnp.transpose(s_proj, (1, 0, 2)).reshape(n, bsz * h)
    ea8 = jnp.pad(edge_attr.astype(jnp.float32), ((0, 0), (0, 0), (0, 8 - d)))
    we8 = jnp.pad(w_e.astype(jnp.float32), ((0, 8 - d), (0, 0)))
    gw = jnp.tile(gamma.reshape(1, h).astype(jnp.float32), (1, bsz))
    bw = jnp.tile(beta.reshape(1, h).astype(jnp.float32), (1, bsz))
    training = (not deterministic) and dropout_p > 0.0
    bf16_stream = t_proj.dtype == jnp.bfloat16
    fn = _build(n, e, h, k, bsz, float(dropout_p), training, bool(interpret),
                bf16_stream, int(max_width or MAX_WIDTH))
    adj_dtype = (jnp.bfloat16 if (bf16_stream and not interpret)
                 else jnp.float32)
    out = fn(tpw, spw, ea8, we8, gw, bw, adjT.astype(adj_dtype),
             seed.astype(jnp.int32))                        # (N, B*H)
    out = jnp.transpose(out.reshape(n, bsz, h), (1, 0, 2))   # (B, N, H)
    return out[:, :n_orig] if pad_n else out
