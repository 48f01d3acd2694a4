"""Data-parallel training step over a device mesh.

The reference trains single-device (SURVEY §2.3: DataLoader workers only
feed CPU->GPU).  Here the batch axis is sharded over the mesh's ``data``
axis and parameters are replicated; XLA emits the gradient ``psum`` over ICI
automatically because the replicated-output constraint requires it — the
scaling-book recipe: annotate shardings, let the compiler place collectives.

The per-batch semantics come from the SAME step builder the single-device
Trainer uses (:func:`nbody_gnn_hpc_tpu.train.steps.make_train_step`), so the
two paths cannot drift.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from nbody_gnn_hpc_tpu.parallel.mesh import batch_sharding, replicated
from nbody_gnn_hpc_tpu.train.loss import PhysicsInformedLoss
from nbody_gnn_hpc_tpu.train.steps import make_train_step


def make_dp_train_step(model, tx, edge_index, state_mean, state_std,
                       mass_feat, mesh, noise_std: float = 0.003,
                       masses: Optional[jnp.ndarray] = None,
                       criterion: Optional[PhysicsInformedLoss] = None,
                       impl: str = "gspmd"):
    """Build a jitted data-parallel train step.

    Args mirror :func:`make_train_step` plus ``mesh`` — 1-D ('data') or the
    2-D ('dcn', 'data') hybrid mesh from :func:`make_hybrid_mesh`; the batch
    is sharded over every mesh axis, so on a multi-slice pod the gradient
    reduction is hierarchical (ICI within a slice, one DCN pass across).

    ``impl`` selects how the batch is split:

    - ``"gspmd"`` (default): one global program with sharding annotations —
      the compiler partitions it and places the gradient psum.  Per-sample
      RNG streams are identical to the single-device step (8-dev == 1-dev
      bitwise), but the fused Pallas edge kernel is a custom call GSPMD
      cannot partition, so this path pins the XLA edge branch
      (math-identical).
    - ``"shard_map"``: per-device local steps with an explicit gradient
      ``pmean`` — Pallas kernels run PER DEVICE, so the fused edge kernel
      stays fused on multi-chip.  Stochastic parts (noise/dropout) fold the
      device index into the key: deterministic runs match gspmd exactly;
      stochastic runs draw per-shard streams (same distribution, different
      bits than single-device).

    Returns:
        step(params, opt_state, states, targets, key) ->
            (params, opt_state, loss)
        with states/targets (B, N, 6) RAW (unnormalized), B divisible by the
        mesh size.
    """
    if impl not in ("gspmd", "shard_map"):
        raise ValueError(f"unknown dp impl {impl!r}")
    data_shard = batch_sharding(mesh)
    repl = replicated(mesh)

    if impl == "gspmd" and getattr(model, "edge_impl", "xla") != "xla":
        # See the impl docstring: GSPMD would replicate the Mosaic custom
        # call instead of splitting it; pin the math-identical XLA branch.
        import dataclasses

        model = dataclasses.replace(model, edge_impl="xla")

    base_step = make_train_step(model, tx, edge_index, state_mean, state_std,
                                mass_feat, noise_std=noise_std, masses=masses,
                                criterion=criterion)

    if impl == "shard_map":
        import optax
        from jax.sharding import PartitionSpec as P

        axes = tuple(mesh.axis_names)

        def local_step(params, opt_state, s, t, key):
            # Flat device index over the (possibly hybrid) mesh; for a 1-D
            # mesh this is exactly axis_index('data'), keeping the certified
            # single-axis RNG streams bit-identical.
            idx = jax.lax.axis_index(axes[0])
            for a in axes[1:]:
                idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
            key = jax.random.fold_in(key, idx)

            def loss_fn(p):
                total, _ = base_step.compute_loss(p, s, t, key)
                return total

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = jax.lax.pmean(grads, axes)
            loss = jax.lax.pmean(loss, axes)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return jax.jit(jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P(), P(axes), P(axes), P()),
            out_specs=(P(), P(), P()),
            check_vma=False))

    @partial(jax.jit,
             in_shardings=(repl, repl, data_shard, data_shard, repl),
             out_shardings=(repl, repl, repl))
    def step(params, opt_state, states, targets, key):
        return base_step(params, opt_state, states, targets, key)

    return step
