"""Rollout-aware fine-tuning: a K-step unrolled objective.

Motivation (RESULTS.md, measured): the reference's one-step physics loss
anticorrelates with multi-step rollout quality — models that lower it make
aggressive per-step velocity adjustments that compound over hundreds of
autoregressive steps.  This module fine-tunes a trained model by unrolling
it K steps exactly as inference does (normalize -> on-device k-NN -> forward
-> denormalize -> feed back) and penalizing the normalized-state error at
EVERY unrolled step.  No reference equivalent — this is a beyond-parity
capability enabled by differentiating through the whole scan on TPU.

The unroll is deterministic (no dropout/noise): the objective itself
supplies the multi-step robustness that noise injection approximates.
"""

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nbody_gnn_hpc_tpu.ops.knn import (fully_connected_edge_index,
                                       knn_edge_index)


def load_trajectory_tensor(checkpoint_dir, sim_names) -> np.ndarray:
    """Stack per-sim state sequences: (n_sims, n_saves, N, 6) float32
    [pos(3), vel(3)] from saved trajectory files."""
    from nbody_gnn_hpc_tpu.io import CheckpointManager

    mgr = CheckpointManager(str(checkpoint_dir))
    seqs = []
    for name in sim_names:
        t = mgr.load_trajectory(name)
        seqs.append(np.concatenate(
            [t["positions"], t["velocities"]], axis=-1).astype(np.float32))
    return np.stack(seqs)


def make_unroll_loss(model, norm_stats: Dict, mass_feat: jnp.ndarray,
                     k_neighbors: Optional[int], n_particles: int,
                     horizon: int):
    """loss(params, seq) with seq (B, horizon+1, N, 6) RAW states: unroll
    ``horizon`` autoregressive steps from seq[:, 0], MSE in normalized space
    against seq[:, 1:], averaged over the horizon."""
    mean = jnp.asarray(norm_stats["state_mean"], jnp.float32)
    std = jnp.asarray(norm_stats["state_std"], jnp.float32)
    use_knn = k_neighbors is not None and k_neighbors < n_particles - 1
    static_edges = None if use_knn else jnp.asarray(
        fully_connected_edge_index(n_particles))

    def one_step(params, s_raw):
        """One inference-equivalent step in raw units (predict.py:93-117
        numerics, deterministic)."""
        s_norm = (s_raw - mean) / std
        pos = s_norm[:, :3]
        edges = knn_edge_index(pos, k_neighbors) if use_knn else static_edges
        x = jnp.concatenate([s_norm, mass_feat], axis=1)
        pred_norm = model.apply({"params": params}, x, edges, pos,
                                deterministic=True)
        return pred_norm * std + mean, pred_norm

    def loss(params, seq):
        tgt_norm = (seq[:, 1:] - mean) / std  # (B, H, N, 6)

        def unroll_one(s0, tgt):
            # Remat each unrolled step: without it the scan keeps every
            # step's edge activations alive for the backward pass
            # (O(horizon * E * H) — hundreds of MB per buffer at K=8).
            @jax.checkpoint
            def body(s_raw, t_norm):
                s_next, pred_norm = one_step(params, s_raw)
                err = jnp.mean((pred_norm - t_norm) ** 2)
                return s_next, err

            _, errs = jax.lax.scan(body, s0, tgt)
            return jnp.mean(errs)

        per_sample = jax.vmap(unroll_one)(seq[:, 0], tgt_norm)
        return jnp.mean(per_sample)

    return loss


def finetune_rollout(model, params, trajectories: np.ndarray,
                     norm_stats: Dict, masses: np.ndarray,
                     k_neighbors: Optional[int] = 40,
                     horizon: int = 8,
                     batch_size: int = 8,
                     learning_rate: float = 5e-5,
                     n_steps: int = 1000,
                     seed: int = 0,
                     log_every: int = 100,
                     val_fraction: float = 0.1,
                     progress_cb=None
                     ) -> Tuple[dict, Dict[str, list]]:
    """Fine-tune ``params`` with the K-step unrolled objective.

    Args:
        trajectories: (n_sims, n_saves, N, 6) raw state sequences.
        horizon: unroll length K.
        n_steps: optimizer steps.
        progress_cb: optional no-arg callable invoked after each
            ``log_every``-step host readback — a stall-watchdog beat hook.

    Returns:
        (best_params, history) — best by held-out unroll loss.
    """
    n_sims, n_saves, n_particles, _ = trajectories.shape
    mass_feat = jnp.asarray(
        (masses / masses.mean()).reshape(-1, 1), jnp.float32)

    loss_fn = make_unroll_loss(model, norm_stats, mass_feat, k_neighbors,
                               n_particles, horizon)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(learning_rate, weight_decay=1e-4))
    opt_state = tx.init(params)

    data = jnp.asarray(trajectories)
    n_val_sims = max(1, int(val_fraction * n_sims))
    train_sims, val_sims = n_sims - n_val_sims, n_val_sims

    @jax.jit
    def train_step(params, opt_state, data, sim_idx, t_idx):
        # Gather (B, horizon+1, N, 6) windows.
        win = jnp.arange(horizon + 1)
        seq = data[sim_idx[:, None], t_idx[:, None] + win[None, :]]
        loss, grads = jax.value_and_grad(loss_fn)(params, seq)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_loss(params, data, sim_idx, t_idx):
        win = jnp.arange(horizon + 1)
        seq = data[sim_idx[:, None], t_idx[:, None] + win[None, :]]
        return loss_fn(params, seq)

    rng = np.random.RandomState(seed)
    # Fixed held-out probe windows from the val sims.
    v_si = jnp.asarray(rng.randint(train_sims, n_sims, 16))
    v_ti = jnp.asarray(rng.randint(0, n_saves - horizon - 1, 16))

    history = {"train_loss": [], "val_loss": []}
    best_params, best_val = params, float(eval_loss(params, data, v_si, v_ti))
    history["val_loss"].append(best_val)
    print(f"  initial unroll-{horizon} val loss: {best_val:.6f}")
    if progress_cb is not None:
        progress_cb()  # the compile + first readback completed

    for step in range(1, n_steps + 1):
        si = jnp.asarray(rng.randint(0, train_sims, batch_size))
        ti = jnp.asarray(rng.randint(0, n_saves - horizon - 1, batch_size))
        params, opt_state, loss = train_step(params, opt_state, data, si, ti)
        if step % log_every == 0 or step == n_steps:
            val = float(eval_loss(params, data, v_si, v_ti))
            history["train_loss"].append(float(loss))
            history["val_loss"].append(val)
            marker = ""
            if val < best_val:
                best_val, best_params = val, params
                marker = " *BEST"
            print(f"  step {step:5d} | train {float(loss):.6f} | "
                  f"val {val:.6f}{marker}")
            if progress_cb is not None:
                progress_cb()  # this chunk's readbacks completed

    return best_params, history
