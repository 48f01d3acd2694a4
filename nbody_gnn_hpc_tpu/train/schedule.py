"""Cosine-annealing-with-warm-restarts LR schedule (epoch-stepped).

Parity target: torch ``CosineAnnealingWarmRestarts(T_0=20, T_mult=2,
eta_min=1e-6)`` stepped once per epoch (``src/ai/train.py:368-370,503``):

    lr(epoch) = eta_min + (base - eta_min) * (1 + cos(pi * T_cur / T_i)) / 2

where restarts occur at epochs 20, 60, 140, ... (period doubling).  Not
stock in optax (SURVEY §7 hard parts) — implemented directly, both as a
Python function of epoch and as an optax-compatible per-step schedule
(epoch = step // steps_per_epoch, so the LR is constant within an epoch
exactly like the reference).
"""

import math

import jax.numpy as jnp


def cosine_warm_restarts(epoch, base_lr: float, t_0: int = 20,
                         t_mult: int = 2, eta_min: float = 1e-6):
    """LR at integer ``epoch`` (0-indexed: epoch 0 uses lr=base).

    Works on Python ints (host bookkeeping) and traced arrays (inside jit) —
    the restart boundary search is closed-form for t_mult >= 2:
    epoch e lies in cycle c where cum_c = t_0*(t_mult^c - 1)/(t_mult - 1).
    """
    if t_mult == 1:
        t_cur = epoch % t_0
        t_i = t_0
    else:
        # cycle index: largest c with t_0*(t_mult^c - 1)/(t_mult-1) <= epoch
        # Epsilon guards the exact-boundary case (log of an exact power of
        # t_mult rounding just below an integer).
        ratio = epoch * (t_mult - 1) / t_0 + 1
        if isinstance(epoch, (int, float)):
            c = int(math.floor(math.log(ratio, t_mult) + 1e-9))
            cum = t_0 * (t_mult ** c - 1) // (t_mult - 1)
            t_cur = epoch - cum
            t_i = t_0 * t_mult ** c
        else:
            c = jnp.floor(jnp.log(ratio) / jnp.log(float(t_mult)) + 1e-6)
            cum = t_0 * (jnp.power(float(t_mult), c) - 1) / (t_mult - 1)
            t_cur = epoch - cum
            t_i = t_0 * jnp.power(float(t_mult), c)

    cos_term = (1 + jnp.cos(jnp.pi * t_cur / t_i)) / 2 \
        if not isinstance(epoch, (int, float)) \
        else (1 + math.cos(math.pi * t_cur / t_i)) / 2
    return eta_min + (base_lr - eta_min) * cos_term


def make_step_schedule(base_lr: float, steps_per_epoch: int, t_0: int = 20,
                       t_mult: int = 2, eta_min: float = 1e-6):
    """optax schedule: step count -> LR, constant within each epoch
    (reproduces per-epoch ``scheduler.step()``)."""
    spe = max(1, int(steps_per_epoch))

    def schedule(count):
        epoch = count // spe
        return cosine_warm_restarts(epoch.astype(jnp.float32) if hasattr(
            epoch, "astype") else epoch, base_lr, t_0, t_mult, eta_min)

    return schedule
