#!/usr/bin/env python3
"""A/B the batch-folded edge kernel's lane width on the real chip.

Times fwd+bwd (value_and_grad of a sum) of 6 sequential batched layers at
the production shape (b24, N=200, k=40, H=256, bf16 stream, training
dropout) for each --widths entry, against the vmapped per-graph kernel.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nbody_gnn_hpc_tpu.models.gnn import target_adjacency
    from nbody_gnn_hpc_tpu.ops.fused_edge import fused_edge_layer
    from nbody_gnn_hpc_tpu.ops.fused_edge_batched import \
        fused_edge_layer_batched
    from nbody_gnn_hpc_tpu.ops.knn import knn_edge_index

    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", type=int, nargs="+",
                    default=[512, 1024, 1536])
    ap.add_argument("--skip-pergraph", action="store_true")
    args = ap.parse_args()

    B, N, K, H = 24, 200, 40, 256
    r = np.random.RandomState(0)
    edges = knn_edge_index(jnp.asarray(r.randn(N, 3), jnp.float32), K)
    adj, _ = target_adjacency(edges, N, jnp.bfloat16)
    adjT = adj.T
    tp = jnp.asarray(r.randn(B, N, H), jnp.bfloat16)
    sp = jnp.asarray(r.randn(B, N, H), jnp.bfloat16)
    ea = jnp.asarray(r.randn(B, N * K, 5), jnp.float32)
    we = jnp.asarray(r.randn(5, H) * 0.3, jnp.float32)
    gam, bet = jnp.ones(H), jnp.zeros(H)
    seed = jnp.array([[7]], jnp.int32)
    kw = dict(k=K, dropout_p=0.1, deterministic=False)
    reps = 30
    out = {}

    def timed(f):
        g = f()  # compile
        float(jax.tree_util.tree_leaves(g)[0].astype(jnp.float32).sum())
        t0 = time.time()
        for _ in range(reps):
            g = f()
        float(jax.tree_util.tree_leaves(g)[0].astype(jnp.float32).sum())
        return (time.time() - t0) / reps * 1e3

    def six_batched(width):
        def body(tp, sp, ea):
            h = tp
            for i in range(6):
                h = fused_edge_layer_batched(
                    h.astype(jnp.bfloat16), sp, ea, we, gam, bet, adjT,
                    seed + i, max_width=width, **kw).astype(jnp.bfloat16)
            return h.astype(jnp.float32).sum()
        return jax.jit(jax.grad(body, argnums=(0, 1, 2)))

    def six_pergraph():
        def one(tp_b, sp_b, ea_b):
            h = tp_b
            for i in range(6):
                h = fused_edge_layer(
                    h.astype(jnp.bfloat16), sp_b, ea_b, we, gam, bet, adjT,
                    seed + i, **kw).astype(jnp.bfloat16)
            return h
        def body(tp, sp, ea):
            return jax.vmap(one)(tp, sp, ea).astype(jnp.float32).sum()
        return jax.jit(jax.grad(body, argnums=(0, 1, 2)))

    if not args.skip_pergraph:
        f = six_pergraph()
        out["pergraph_ms"] = round(timed(lambda: f(tp, sp, ea)), 2)
        print(f"# pergraph: {out['pergraph_ms']} ms", file=sys.stderr)
    for w in args.widths:
        f = six_batched(w)
        out[f"batched_w{w}_ms"] = round(timed(lambda: f(tp, sp, ea)), 2)
        print(f"# width {w}: {out[f'batched_w{w}_ms']} ms", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
