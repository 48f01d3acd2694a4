"""Physics-informed loss (jitted, dense-batch).

Numerics parity: ``PhysicsInformedLoss`` (``src/ai/train.py:187-279``):

    total = 1.0*MSE(pos) + 1.0*MSE(vel)
          + 0.1*MSE(per-graph sum KE) + 0.1*MSE(per-graph sum momentum)

with masses renormalized by their mean inside the loss (``train.py:231-236``).
The reference's per-graph ``scatter_add_`` over a flattened PyG batch index
becomes a plain sum over the particle axis of the dense (B, N, ...) batch —
same reduction, no scatter needed.
"""

from typing import Dict, Optional, Tuple

import jax.numpy as jnp


class PhysicsInformedLoss:
    """Callable loss; returns (total, details) like the reference.

    The details dict values are traced scalars (callers convert to float
    outside jit); keys match the reference's: total/position/velocity/
    energy/momentum (``train.py:271-277``).
    """

    def __init__(self,
                 position_weight: float = 1.0,
                 velocity_weight: float = 1.0,
                 energy_weight: float = 0.1,
                 momentum_weight: float = 0.1):
        self.position_weight = position_weight
        self.velocity_weight = velocity_weight
        self.energy_weight = energy_weight
        self.momentum_weight = momentum_weight

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray,
                 masses: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Args:
            pred/target: (B, N, 6) — [pos(3), vel(3)] in normalized space.
            masses: (N,) shared particle masses (same graph across batch —
                the reference tiles one mass array per graph,
                ``train.py:382-394``).
        """
        pred_pos, pred_vel = pred[..., :3], pred[..., 3:6]
        tgt_pos, tgt_vel = target[..., :3], target[..., 3:6]

        pos_loss = jnp.mean((pred_pos - tgt_pos) ** 2)
        vel_loss = jnp.mean((pred_vel - tgt_vel) ** 2)

        energy_loss = jnp.asarray(0.0, pred.dtype)
        momentum_loss = jnp.asarray(0.0, pred.dtype)

        if masses is not None:
            mass_scale = masses.mean()
            norm_m = jnp.where(mass_scale > 0, masses / mass_scale, masses)

            if self.momentum_weight > 0:
                # Per-graph total momentum: (B, 3).
                pred_mom = jnp.sum(norm_m[None, :, None] * pred_vel, axis=1)
                tgt_mom = jnp.sum(norm_m[None, :, None] * tgt_vel, axis=1)
                momentum_loss = jnp.mean((pred_mom - tgt_mom) ** 2)

            if self.energy_weight > 0:
                # Per-graph total kinetic energy: (B,).
                pred_ke = jnp.sum(
                    0.5 * norm_m[None, :] * jnp.sum(pred_vel ** 2, -1), axis=1)
                tgt_ke = jnp.sum(
                    0.5 * norm_m[None, :] * jnp.sum(tgt_vel ** 2, -1), axis=1)
                energy_loss = jnp.mean((pred_ke - tgt_ke) ** 2)

        total = (self.position_weight * pos_loss
                 + self.velocity_weight * vel_loss
                 + self.energy_weight * energy_loss
                 + self.momentum_weight * momentum_loss)

        return total, {
            "total": total,
            "position": pos_loss,
            "velocity": vel_loss,
            "energy": energy_loss,
            "momentum": momentum_loss,
        }


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Plain MSE alternative (the reference's non-physics branch,
    ``train.py:358-359``)."""
    return jnp.mean((pred - target) ** 2)
