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
                       criterion: Optional[PhysicsInformedLoss] = None):
    """Build a jitted data-parallel train step.

    Args mirror :func:`make_train_step` plus ``mesh`` (1-D, axis 'data').

    Returns:
        step(params, opt_state, states, targets, key) ->
            (params, opt_state, loss)
        with states/targets (B, N, 6) RAW (unnormalized), B divisible by the
        mesh size.
    """
    data_shard = batch_sharding(mesh)
    repl = replicated(mesh)

    if getattr(model, "edge_impl", "xla") != "xla":
        # The fused Pallas edge kernel (ops/fused_edge.py) is a Mosaic
        # custom call GSPMD cannot partition across the sharded batch —
        # under this jit it would force replication instead of splitting.
        # The DP path pins the XLA branch (math-identical); a shard_map
        # wrapper for per-device fused kernels is future work.
        import dataclasses

        model = dataclasses.replace(model, edge_impl="xla")

    base_step = make_train_step(model, tx, edge_index, state_mean, state_std,
                                mass_feat, noise_std=noise_std, masses=masses,
                                criterion=criterion)

    @partial(jax.jit,
             in_shardings=(repl, repl, data_shard, data_shard, repl),
             out_shardings=(repl, repl, repl))
    def step(params, opt_state, states, targets, key):
        return base_step(params, opt_state, states, targets, key)

    return step
