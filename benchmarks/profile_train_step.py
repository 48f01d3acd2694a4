#!/usr/bin/env python3
"""Train-step cost breakdown on the real TPU (round-3 fusion guidance).

Times, with the chained-readback methodology of bench_train_step.py:
  full       — production b24 train step (fused edge kernel, remat)
  fwd        — forward + loss only (no grad/optimizer)
  kernel6    — the fused edge kernel alone, vmapped b24, 6 sequential
               applications (forward)
  kernel6_vjp— same, under value_and_grad (forward + custom backward)
  stack0     — a 0-layer model step (encoder/decoder/loss/optimizer only)

The difference full - kernel6_vjp - stack0 approximates the per-layer XLA
remainder (projections, aggregated dense, node MLP, residual LN).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def timed(fn, reps, sync):
    fn()  # warm/compile
    sync()
    t0 = time.time()
    for _ in range(reps):
        fn()
    sync()
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nbody_gnn_hpc_tpu.models import NBodyGNN, forward_batch, init_model
    from nbody_gnn_hpc_tpu.models.gnn import target_adjacency
    from nbody_gnn_hpc_tpu.ops.fused_edge import fused_edge_layer
    from nbody_gnn_hpc_tpu.ops.knn import knn_edge_index
    from nbody_gnn_hpc_tpu.train.loss import PhysicsInformedLoss

    jax.config.update("jax_default_prng_impl", "rbg")
    r = np.random.RandomState(0)
    B, N, K, H = 24, 200, 40, 256
    E = N * K
    edges = knn_edge_index(jnp.asarray(r.randn(N, 3), jnp.float32), K)
    pmasses = jnp.asarray(r.uniform(1e10, 1e12, N), jnp.float32)
    crit = PhysicsInformedLoss()
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(5e-4, weight_decay=1e-4))
    s = jnp.asarray(r.randn(B, N, 6), jnp.float32)
    t = jnp.asarray(r.randn(B, N, 6), jnp.float32)

    def make_step(model, params):
        @jax.jit
        def train_step(params, opt_state, s, t, key):
            k1, k2 = jax.random.split(key)
            sn = s + 0.003 * jax.random.normal(k1, s.shape)
            pos = sn[..., :3]
            x = jnp.concatenate(
                [sn, jnp.broadcast_to((pmasses / pmasses.mean())[:, None],
                                      sn.shape[:2] + (1,))], -1)

            def loss_fn(p):
                pred = forward_batch(model, p, x, edges, pos,
                                     deterministic=False, dropout_rng=k2)
                return crit(pred, t, pmasses)[0]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), opt_state, loss
        return train_step

    results = {}
    reps = 30

    # -- full step ---------------------------------------------------------
    model = NBodyGNN(7, H, 6, 6, 0.1, remat=True, dtype=jnp.bfloat16)
    params = init_model(model, jax.random.PRNGKey(0), N, E)
    opt_state = tx.init(params)
    step = make_step(model, params)
    state = {"p": params, "o": opt_state, "l": None}

    def run_full():
        state["p"], state["o"], state["l"] = step(
            state["p"], state["o"], s, t, jax.random.PRNGKey(0))

    results["full_ms"] = timed(run_full, reps,
                               lambda: float(state["l"])) * 1e3

    # -- forward only ------------------------------------------------------
    @jax.jit
    def fwd_only(params, s, t, key):
        k1, k2 = jax.random.split(key)
        sn = s + 0.003 * jax.random.normal(k1, s.shape)
        pos = sn[..., :3]
        x = jnp.concatenate(
            [sn, jnp.broadcast_to((pmasses / pmasses.mean())[:, None],
                                  sn.shape[:2] + (1,))], -1)
        pred = forward_batch(model, params, x, edges, pos,
                             deterministic=False, dropout_rng=k2)
        return crit(pred, t, pmasses)[0]

    box = {"l": None}

    def run_fwd():
        box["l"] = fwd_only(params, s, t, jax.random.PRNGKey(0))

    results["fwd_ms"] = timed(run_fwd, reps, lambda: float(box["l"])) * 1e3

    # -- fused kernel alone, 6 sequential applications ---------------------
    adj, _ = target_adjacency(edges, N, jnp.bfloat16)
    adjT = adj.T
    tp = jnp.asarray(r.randn(B, N, H), jnp.bfloat16)
    sp = jnp.asarray(r.randn(B, N, H), jnp.bfloat16)
    ea = jnp.asarray(r.randn(B, E, 5), jnp.float32)
    we = jnp.asarray(r.randn(5, H), jnp.float32)
    gam, bet = jnp.ones(H), jnp.zeros(H)
    seed = jnp.zeros((1, 1), jnp.int32)

    def one(tp_b, sp_b, ea_b):
        out = tp_b
        for i in range(6):
            out = fused_edge_layer(out.astype(jnp.bfloat16), sp_b, ea_b, we,
                                   gam, bet, adjT, seed + i, k=K,
                                   dropout_p=0.1, deterministic=False
                                   ).astype(jnp.bfloat16)
        return out

    k6 = jax.jit(lambda tp, sp, ea: jax.vmap(one)(tp, sp, ea))
    out_box = {}

    def run_k6():
        out_box["o"] = k6(tp, sp, ea)

    results["kernel6_ms"] = timed(
        run_k6, reps, lambda: float(out_box["o"].astype(jnp.float32).sum())
    ) * 1e3

    k6g = jax.jit(jax.grad(
        lambda tp, sp, ea: jax.vmap(one)(tp, sp, ea)
        .astype(jnp.float32).sum(), argnums=(0, 1, 2)))

    def run_k6g():
        out_box["g"] = k6g(tp, sp, ea)

    results["kernel6_vjp_ms"] = timed(
        run_k6g, reps,
        lambda: float(out_box["g"][0].astype(jnp.float32).sum())) * 1e3

    # -- 0-layer stack (encoder/decoder/loss/optimizer) --------------------
    model0 = NBodyGNN(7, H, 0, 6, 0.1, remat=False, dtype=jnp.bfloat16)
    params0 = init_model(model0, jax.random.PRNGKey(0), N, E)
    opt0 = tx.init(params0)
    step0 = make_step(model0, params0)
    st0 = {"p": params0, "o": opt0, "l": None}

    def run_s0():
        st0["p"], st0["o"], st0["l"] = step0(
            st0["p"], st0["o"], s, t, jax.random.PRNGKey(0))

    results["stack0_ms"] = timed(run_s0, reps,
                                 lambda: float(st0["l"])) * 1e3

    for k, v in results.items():
        results[k] = round(v, 2)
    results["xla_remainder_ms"] = round(
        results["full_ms"] - results["kernel6_vjp_ms"] - results["stack0_ms"],
        2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
