"""Fully-fused ParticleInteractionLayer: one Pallas kernel per layer.

ROUND-3 MEASURED NEGATIVE RESULT — kept as an opt-in building block
(``edge_impl="fused_full"``), NOT the default.  Measured on the v5e
(200-step scanned b24 production train step, bf16): 12.31 ms vs the
default fused-edge path's 11.64 ms; inference rollout (394 steps, N=200):
0.211 s vs 0.208 s.  Why it loses despite removing the measured 2.56 ms
per-step XLA remainder (scan decomposition: full 11.6 = kernel chain 8.8 +
remainder 2.6 + encoder/decoder/loss/optimizer 0.24):

1. vmap lifts the graph batch into the grid, so every per-graph program
   re-reads all six (H, H) parameter matrices from HBM (~1.5 MB x 24
   graphs x 6 layers per forward) — the XLA remainder reads them ONCE per
   batched op.
2. The node-side work serializes into the sequential grid's last step,
   while XLA overlaps it with other per-graph kernel programs.
3. The custom-VJP backward recomputes the node side (the XLA branch saves
   its (N, H)-scale intermediates — they are cheap to keep).

Together with the batch-folded kernel's negative result
(ops/fused_edge_batched.py: wider matmuls don't help because the stream is
VPU/transcendental-bound), this CLOSES the "deeper fusion" train-step
lever: the step floor on one v5e is the 8.8 ms kernel chain itself, and
further gains require MXU/VPU overlap (not schedulable from Pallas today)
or multi-chip DP.  The forward/backward below are exact vs the XLA branch
at f32 (tests/test_fused_full.py pins forward, param grads, input grads,
padding, and vmap), so the kernel remains a correct, reusable whole-layer
primitive.

Extends the fused edge-stream kernel (ops/fused_edge.py) with the node-side
prologue and epilogue, so the ONLY per-layer HBM traffic is the (N, H) layer
input/output plus parameters:

    prologue  (grid step 0):   t_proj = h @ W_t + b_t ;  s_proj = h @ W_s
    tile loop (all grid steps): the edge stream of ops/fused_edge.py —
               gather + edge-feature projection -> LayerNorm -> SiLU ->
               in-kernel dropout -> sum-aggregate into a VMEM accumulator
    epilogue  (last grid step): the node side of the reference layer
               (src/ai/model.py:63-65):
               agg   = summed @ W_out + deg * b_out      (_AggregatedDense)
               z1    = [h, agg] @ W_1 + b_1             (node_mlp Dense_0)
               x     = LayerNorm(z1) * g_1 + be_1        (fast variance)
               a     = silu(x) * node_mask               (dropout as mask)
               h_new = a @ W_2 + b_2                     (node_mlp Dense_1)

The XLA branch (models/gnn.py) runs the same math as ~10 separate ops per
layer; measured on the v5e (scanned b24 decomposition) that remainder costs
2.56 ms of the 11.6 ms train step. The epilogue matmuls are (N, H)-scale —
microseconds on the MXU — so folding them is pure HBM/boundary savings.

Backward: the node side is recomputed and differentiated in XLA (it is
(N, H)-scale — cheap), producing d_summed; the tile stream's backward then
reuses ops/fused_edge.py's bwd kernel VERBATIM (same math, same in-kernel
dropout seeding), and the projection backward is two more XLA matmuls.
Node-side dropout uses a host-generated pre-scaled mask (passed in) so the
forward kernel and the XLA backward see identical bits; edge dropout stays
on the in-kernel TPU PRNG exactly as in ops/fused_edge.py.

Parameter layout matches the flax modules of the XLA branch exactly (same
names/shapes/inits — models/gnn.py declares them via bare-param twins), so
checkpoints are interchangeable between implementations.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_gnn_hpc_tpu.ops.fused_edge import (EPS, _build, _ln_silu,
                                              _threshold, _tile_sources,
                                              _tile_zpre)


def _full_fwd_kernel(seed_ref, h_ref, ea_ref, we_ref, ge_ref, be_ref,
                     wt_ref, bt_ref, ws_ref,
                     wout_ref, degb_ref, w1h_ref, w1a_ref, b1_ref,
                     g1_ref, be1_ref, w2_ref, b2_ref, mask_ref,
                     adjT_ref, hnew_ref, summed_ref,
                     acc, tp_s, sp_s, *, g, k, thr, inv_keep, training, cd):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _prologue():
        acc[...] = jnp.zeros_like(acc)
        hc = h_ref[...].astype(cd)
        tp = jnp.dot(hc, wt_ref[...].astype(cd),
                     preferred_element_type=jnp.float32)
        tp_s[...] = (tp.astype(cd) + bt_ref[...].astype(cd)).astype(cd)
        sp = jnp.dot(hc, ws_ref[...].astype(cd),
                     preferred_element_type=jnp.float32)
        sp_s[...] = sp.astype(cd)

    adjT, zpre = _tile_zpre(t, tp_s, sp_s, ea_ref, we_ref, adjT_ref, g, k)
    act, _, _, _, _ = _ln_silu(zpre, ge_ref[...], be_ref[...])
    if training:
        pltpu.prng_seed(seed_ref[0, 0] + t)
        bits = pltpu.bitcast(pltpu.prng_random_bits(act.shape), jnp.uint32)
        act = jnp.where(bits >= jnp.uint32(thr), act * inv_keep, 0.0)
    acc[...] += jax.lax.dot_general(
        adjT, act.astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(t == pl.num_programs(0) - 1)
    def _epilogue():
        summed = acc[...]                                        # (N, H) f32
        summed_ref[...] = summed
        # _AggregatedDense: (summed @ W_out).f32 + deg*b_out
        agg = jnp.dot(summed.astype(cd), wout_ref[...].astype(cd),
                      preferred_element_type=jnp.float32) + degb_ref[...]
        # node_mlp Dense_0 on [h, agg] (kernel rows split: W1h | W1a).
        hc = h_ref[...].astype(cd)
        z1 = (jnp.dot(hc, w1h_ref[...].astype(cd),
                      preferred_element_type=jnp.float32)
              + jnp.dot(agg.astype(cd), w1a_ref[...].astype(cd),
                        preferred_element_type=jnp.float32))
        x = (z1.astype(cd) + b1_ref[...].astype(cd)).astype(jnp.float32)
        act_n, _, _, _, _ = _ln_silu(x, g1_ref[...], be1_ref[...])
        if training:
            act_n = act_n * mask_ref[...]
        h_new = jnp.dot(act_n.astype(cd), w2_ref[...].astype(cd),
                        preferred_element_type=jnp.float32)
        hnew_ref[...] = (h_new.astype(cd) + b2_ref[...].astype(cd)
                         ).astype(jnp.float32)


def _node_side(h, summed, wout, degb, w1h, w1a, b1, g1, be1, w2, b2, mask,
               training, cd):
    """XLA recompute of the epilogue (used by the backward pass) — must
    mirror ``_full_fwd_kernel``'s epilogue op-for-op."""
    agg = (jnp.dot(summed.astype(cd), wout.astype(cd),
                   preferred_element_type=jnp.float32) + degb)
    hc = h.astype(cd)
    z1 = (jnp.dot(hc, w1h.astype(cd), preferred_element_type=jnp.float32)
          + jnp.dot(agg.astype(cd), w1a.astype(cd),
                    preferred_element_type=jnp.float32))
    x = (z1.astype(cd) + b1.astype(cd)).astype(jnp.float32)
    act_pre, xhat, y, sig, rstd = _ln_silu(x, g1, be1)
    act_n = act_pre * mask if training else act_pre
    h_new = jnp.dot(act_n.astype(cd), w2.astype(cd),
                    preferred_element_type=jnp.float32)
    h_new = (h_new.astype(cd) + b2.astype(cd)).astype(jnp.float32)
    return h_new, (agg, xhat, y, sig, rstd, act_pre, act_n)


@functools.lru_cache(maxsize=None)
def _build_full(n: int, e: int, h: int, ho: int, k: int, p: float,
                training: bool, interpret: bool, bf16_stream: bool):
    """Specialized custom-vjp fully-fused layer for one shape/mode."""
    g = _tile_sources(n, k)
    e_t = g * k
    n_tiles = n // g
    thr = _threshold(p) if training else 0
    inv_keep = 1.0 / (1.0 - p) if training else 1.0
    cd = jnp.bfloat16 if (bf16_stream and not interpret) else jnp.float32
    common = dict(g=g, k=k, thr=thr, inv_keep=inv_keep, training=training,
                  cd=cd)
    # The tile-stream backward is ops/fused_edge.py's bwd kernel, unchanged.
    edge_bwd = _build(n, e, h, k, p, training, interpret, bf16_stream
                      ).bwd_call

    def bcast(t0):
        return pl.BlockSpec(t0, lambda t: tuple(0 for _ in t0),
                            memory_space=pltpu.VMEM)

    def fwd_call(seed, hx, ea, we, ge, be, wt, bt, ws, wout, degb,
                 w1h, w1a, b1, g1, be1, w2, b2, mask, adjT):
        return pl.pallas_call(
            functools.partial(_full_fwd_kernel, **common),
            grid=(n_tiles,),
            in_specs=[
                bcast((1, 1)),                                   # seed
                bcast((n, h)),                                   # h
                pl.BlockSpec((e_t, 8), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),           # e_attr8
                bcast((8, h)),                                   # w_e8
                bcast((1, h)), bcast((1, h)),                    # edge LN
                bcast((h, h)), bcast((1, h)), bcast((h, h)),     # Wt bt Ws
                bcast((h, h)), bcast((n, h)),                    # Wout degb
                bcast((h, h)), bcast((h, h)), bcast((1, h)),     # W1h W1a b1
                bcast((1, h)), bcast((1, h)),                    # node LN
                bcast((h, ho)), bcast((1, ho)),                  # W2 b2
                bcast((n, h)),                                   # node_mask
                pl.BlockSpec((e_t, n), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),           # adjT
            ],
            out_specs=[bcast((n, ho)), bcast((n, h))],
            out_shape=[jax.ShapeDtypeStruct((n, ho), jnp.float32),
                       jax.ShapeDtypeStruct((n, h), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((n, h), jnp.float32),
                            pltpu.VMEM((n, h), cd),
                            pltpu.VMEM((n, h), cd)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * e * h * (2 * n + 8) + 40 * e * h
                + 2 * n * h * (5 * h + ho),
                bytes_accessed=(2 * n * h * 4 + e * 8 * 4 + e * n * 2
                                + 6 * h * h * 4),
                transcendentals=2 * e * h + 2 * n * h),
        )(seed, hx, ea, we, ge, be, wt, bt, ws, wout, degb,
          w1h, w1a, b1, g1, be1, w2, b2, mask, adjT)

    @jax.custom_vjp
    def fused(hx, ea, we, ge, be, wt, bt, ws, wout, degb,
              w1h, w1a, b1, g1, be1, w2, b2, mask, adjT, seed):
        h_new, _ = fwd_call(seed, hx, ea, we, ge, be, wt, bt, ws, wout,
                            degb, w1h, w1a, b1, g1, be1, w2, b2, mask, adjT)
        return h_new

    def fused_fwd(hx, ea, we, ge, be, wt, bt, ws, wout, degb,
                  w1h, w1a, b1, g1, be1, w2, b2, mask, adjT, seed):
        h_new, summed = fwd_call(seed, hx, ea, we, ge, be, wt, bt, ws, wout,
                                 degb, w1h, w1a, b1, g1, be1, w2, b2, mask,
                                 adjT)
        return h_new, (hx, ea, we, ge, be, wt, bt, ws, wout, degb,
                       w1h, w1a, b1, g1, be1, w2, b2, mask, adjT, seed,
                       summed)

    def fused_bwd(res, gout):
        (hx, ea, we, ge, be, wt, bt, ws, wout, degb, w1h, w1a, b1, g1, be1,
         w2, b2, mask, adjT, seed, summed) = res
        f32 = jnp.float32
        # -- node-side backward (XLA; (N, H)-scale) ------------------------
        _, (agg, xhat, y, sig, rstd, act_pre, act_n) = _node_side(
            hx, summed, wout, degb, w1h, w1a, b1, g1, be1, w2, b2, mask,
            training, cd)
        gc = gout.astype(cd)
        d_w2 = jax.lax.dot_general(
            act_n.astype(cd), gc, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        d_b2 = jnp.sum(gout, axis=0, keepdims=True)
        d_actn = jnp.dot(gc, w2.astype(cd).T,
                         preferred_element_type=f32)
        if training:
            d_mask = d_actn * act_pre
            d_act = d_actn * mask
        else:
            d_mask = jnp.zeros_like(mask)
            d_act = d_actn
        d_y = d_act * (sig * (1.0 + y * (1.0 - sig)))
        d_g1 = jnp.sum(d_y * xhat, axis=0, keepdims=True)
        d_be1 = jnp.sum(d_y, axis=0, keepdims=True)
        d_xhat = d_y * g1
        m1 = jnp.mean(d_xhat, axis=1, keepdims=True)
        m2 = jnp.mean(d_xhat * xhat, axis=1, keepdims=True)
        d_z1 = rstd * (d_xhat - m1 - xhat * m2)                  # (N, H) f32
        d_b1 = jnp.sum(d_z1, axis=0, keepdims=True)
        d_z1c = d_z1.astype(cd)
        hc = hx.astype(cd)
        d_w1h = jax.lax.dot_general(hc, d_z1c, (((0,), (0,)), ((), ())),
                                    preferred_element_type=f32)
        d_w1a = jax.lax.dot_general(agg.astype(cd), d_z1c,
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=f32)
        d_h = jnp.dot(d_z1c, w1h.astype(cd).T,
                      preferred_element_type=f32)
        d_agg = jnp.dot(d_z1c, w1a.astype(cd).T,
                        preferred_element_type=f32)
        d_degb = d_agg
        d_wout = jax.lax.dot_general(summed.astype(cd), d_agg.astype(cd),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        d_summed = jnp.dot(d_agg.astype(cd), wout.astype(cd).T,
                           preferred_element_type=f32)
        # -- tile-stream backward (ops/fused_edge.py bwd kernel) -----------
        tp = (jnp.dot(hc, wt.astype(cd), preferred_element_type=f32)
              .astype(cd) + bt.astype(cd)).astype(cd)
        sp = jnp.dot(hc, ws.astype(cd),
                     preferred_element_type=f32).astype(cd)
        d_tp, d_sp, d_ea, d_we, d_ge, d_be = edge_bwd(
            tp, sp, ea, we, ge, be, adjT, seed, d_summed)
        # -- projection backward -------------------------------------------
        d_tpc = d_tp.astype(cd)
        d_spc = d_sp.astype(cd)
        d_wt = jax.lax.dot_general(hc, d_tpc, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)
        d_bt = jnp.sum(d_tp.astype(f32), axis=0, keepdims=True)
        d_ws = jax.lax.dot_general(hc, d_spc, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)
        d_h = (d_h
               + jnp.dot(d_tpc, wt.astype(cd).T, preferred_element_type=f32)
               + jnp.dot(d_spc, ws.astype(cd).T, preferred_element_type=f32))
        return (d_h, d_ea, d_we, d_ge, d_be, d_wt, d_bt, d_ws, d_wout,
                d_degb, d_w1h, d_w1a, d_b1, d_g1, d_be1, d_w2, d_b2,
                d_mask, jnp.zeros_like(adjT),
                np.zeros(seed.shape, dtype=jax.dtypes.float0))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_full_layer(h: jnp.ndarray, edge_attr: jnp.ndarray,
                     params: dict, deg: jnp.ndarray,
                     adjT: jnp.ndarray, seed: jnp.ndarray,
                     node_mask: jnp.ndarray,
                     *, k: int, dropout_p: float = 0.0,
                     deterministic: bool = True,
                     interpret: bool = False) -> jnp.ndarray:
    """One fully-fused interaction layer: (N, H) in -> (N, Ho) out.

    Args:
        h:         (N, H) float32 layer input.
        edge_attr: (E, D) edge features, D <= 8.
        params:    dict with keys ``wt, bt, ws, we, ge, be, wout, bout,
                   w1, b1, g1, be1, w2, b2`` (flax shapes: wt/ws (H, H),
                   w1 (2H, H) — split internally, w2 (H, Ho)).
        deg:       (N,) float32 in-degrees (for the pulled-through edge_out
                   bias — _AggregatedDense).
        adjT:      (E, N) one-hot edge->target matrix.
        seed:      (1, 1) int32 edge-dropout seed.
        node_mask: (N, H) float32 pre-scaled dropout mask for the node MLP
                   (bernoulli(1-p)/(1-p); ignored when deterministic).
        k:         edges per source row.

    Returns (N, Ho) float32. N pads internally to a multiple of 8 exactly
    as :func:`nbody_gnn_hpc_tpu.ops.fused_edge.fused_edge_layer` does.
    """
    n, hdim = h.shape
    e, d = edge_attr.shape
    if e != n * k:
        raise ValueError(f"fused_full_layer needs row-regular E==N*k; "
                         f"got N={n}, E={e}, k={k}")
    w1 = params["w1"]
    if w1.shape[0] != 2 * hdim:
        raise ValueError(f"node_mlp Dense_0 kernel must be (2H, H); "
                         f"got {w1.shape}")
    ho = params["w2"].shape[1]
    n_orig = n
    pad_n = (-n) % 8
    if pad_n:
        h = jnp.pad(h, ((0, pad_n), (0, 0)))
        edge_attr = jnp.pad(edge_attr, ((0, pad_n * k), (0, 0)))
        adjT = jnp.pad(adjT, ((0, pad_n * k), (0, pad_n)))
        deg = jnp.pad(deg, (0, pad_n))
        node_mask = jnp.pad(node_mask, ((0, pad_n), (0, 0)))
        n += pad_n
        e += pad_n * k
    ea8 = jnp.pad(edge_attr.astype(jnp.float32), ((0, 0), (0, 8 - d)))
    we8 = jnp.pad(params["we"].astype(jnp.float32), ((0, 8 - d), (0, 0)))
    training = (not deterministic) and dropout_p > 0.0
    bf16_stream = False
    for key in ("wt", "ws"):
        bf16_stream = bf16_stream or params[key].dtype == jnp.bfloat16
    fn = _build_full(n, e, hdim, ho, k, float(dropout_p), training,
                     bool(interpret), bf16_stream)
    adj_dtype = (jnp.bfloat16 if (bf16_stream and not interpret)
                 else jnp.float32)
    f32 = jnp.float32
    row = lambda v: v.reshape(1, -1).astype(f32)
    degb = deg.astype(f32)[:, None] * params["bout"].astype(f32)[None, :]
    out = fn(h.astype(f32), ea8, we8,
             row(params["ge"]), row(params["be"]),
             params["wt"].astype(f32), row(params["bt"]),
             params["ws"].astype(f32),
             params["wout"].astype(f32), degb,
             w1[:hdim].astype(f32), w1[hdim:].astype(f32),
             row(params["b1"]), row(params["g1"]), row(params["be1"]),
             params["w2"].astype(f32), row(params["b2"]),
             node_mask.astype(f32),
             adjT.astype(adj_dtype), seed.astype(jnp.int32))
    return out[:n_orig] if pad_n else out
