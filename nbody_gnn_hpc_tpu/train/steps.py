"""The canonical training step, shared by the single-device Trainer and the
data-parallel path (one source of truth for the per-batch semantics:
normalize -> noise injection with pos resync -> mass-feature concat ->
dropout forward -> physics loss -> clip+AdamW update — reference
``train.py:396-435``)."""

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from nbody_gnn_hpc_tpu.models.gnn import forward_batch
from nbody_gnn_hpc_tpu.train.loss import PhysicsInformedLoss, mse_loss


def make_train_step(model, tx, edge_index, state_mean, state_std, mass_feat,
                    noise_std: float = 0.003,
                    masses: Optional[jnp.ndarray] = None,
                    criterion: Optional[PhysicsInformedLoss] = None,
                    use_physics_loss: bool = True):
    """Build ``step(params, opt_state, states, targets, key) ->
    (params, opt_state, loss)`` over RAW (unnormalized) (B, N, 6) batches.

    Callers wrap it: the Trainer gathers batches by index inside a scan; the
    DP path adds mesh shardings.  All captured operands are small (stats,
    edges, masses) — large data must arrive via the arguments (HLO-constant
    rule, see Trainer._build_epoch_fn).
    """
    if criterion is None and use_physics_loss:
        criterion = PhysicsInformedLoss()
    if getattr(model, "gather_mode", "take") == "matmul":
        # edge_index is concrete here: validate the row-regular layout the
        # scatter-free gather mode assumes (every builder in ops/knn.py
        # emits it; a hand-rolled edge set might not).
        import numpy as np

        from nbody_gnn_hpc_tpu.ops.knn import is_row_regular
        n_nodes = int(np.asarray(mass_feat).reshape(-1).shape[0])
        if not is_row_regular(edge_index, n_nodes):
            raise ValueError(
                "edge_index is not row-regular (row != repeat(arange(N), k))"
                " — required by gather_mode='matmul'; build edges with "
                "ops/knn.py or use a model with gather_mode='take'")
    edge_index = jnp.asarray(edge_index)
    mean = jnp.asarray(state_mean)
    std = jnp.asarray(state_std)
    mass_feat = jnp.asarray(mass_feat)
    if masses is not None:
        masses = jnp.asarray(masses)

    def compute_loss(params, states, targets, key, deterministic=False):
        """(total, details) for one raw batch; used by train and val."""
        if deterministic:
            k_noise = k_drop = None
        else:
            k_noise, k_drop = jax.random.split(key)
        s_norm = (states - mean) / std
        t_norm = (targets - mean) / std
        # Input-noise injection on the 6 state features, pos resynced to the
        # noised positions (train.py:409-415).
        if noise_std > 0 and not deterministic:
            s_norm = s_norm + noise_std * jax.random.normal(
                k_noise, s_norm.shape, s_norm.dtype)
        pos = s_norm[..., :3]
        x = jnp.concatenate(
            [s_norm, jnp.broadcast_to(mass_feat, s_norm.shape[:2] + (1,))],
            axis=-1)
        pred = forward_batch(model, params, x, edge_index, pos,
                             deterministic=deterministic, dropout_rng=k_drop)
        if criterion is not None:
            return criterion(pred, t_norm, masses)
        total = mse_loss(pred, t_norm)
        zero = jnp.asarray(0.0, pred.dtype)
        return total, {"total": total, "position": zero, "velocity": zero,
                       "energy": zero, "momentum": zero}

    def step(params, opt_state, states, targets, key):
        def loss_fn(p):
            total, _ = compute_loss(p, states, targets, key)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step.compute_loss = compute_loss
    return step
