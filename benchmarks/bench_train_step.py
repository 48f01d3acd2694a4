#!/usr/bin/env python3
"""Focused config-4 benchmark: production GNN train step (b24, physics loss,
noise, dropout) on the attached TPU. Same methodology as run_all.py
(chained steps, one host readback)."""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nbody_gnn_hpc_tpu.models import NBodyGNN, forward_batch, init_model
    from nbody_gnn_hpc_tpu.train.loss import PhysicsInformedLoss

    remat = "--remat" in sys.argv
    jax.config.update("jax_default_prng_impl", "rbg")
    r = np.random.RandomState(0)
    model = NBodyGNN(node_input_dim=7, hidden_dim=256, n_layers=6,
                     output_dim=6, dropout=0.1, remat=remat,
                     dtype=jnp.bfloat16)
    edges = jnp.asarray(np.stack([np.repeat(np.arange(200), 40),
                                  np.tile(np.arange(40), 200)]
                                 ).astype(np.int32))
    params = init_model(model, jax.random.PRNGKey(0), 200, 8000)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(5e-4, weight_decay=1e-4))
    opt_state = tx.init(params)
    pmasses = jnp.asarray(r.uniform(1e10, 1e12, 200), jnp.float32)
    crit = PhysicsInformedLoss()

    @jax.jit
    def train_step(params, opt_state, s, t, key):
        k1, k2 = jax.random.split(key)
        s = s + 0.003 * jax.random.normal(k1, s.shape)
        pos = s[..., :3]
        x = jnp.concatenate(
            [s, jnp.broadcast_to((pmasses / pmasses.mean())[:, None],
                                 s.shape[:2] + (1,))], -1)

        def loss_fn(p):
            pred = forward_batch(model, p, x, edges, pos,
                                 deterministic=False, dropout_rng=k2)
            return crit(pred, t, pmasses)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    s = jnp.asarray(r.randn(24, 200, 6), jnp.float32)
    t = jnp.asarray(r.randn(24, 200, 6), jnp.float32)

    t0 = time.time()
    p, o, loss = train_step(params, opt_state, s, t, jax.random.PRNGKey(0))
    float(loss)
    print(f"# compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    reps = 30
    t0 = time.time()
    for _ in range(reps):
        p, o, loss = train_step(p, o, s, t, jax.random.PRNGKey(0))
    float(loss)
    dt = (time.time() - t0) / reps
    print(json.dumps({"metric": "gnn_train_step_b24"
                                + ("_remat" if remat else ""),
                      "ms_per_step": round(dt * 1000, 2),
                      "samples_per_sec": round(24 / dt, 1)}))


if __name__ == "__main__":
    main()
