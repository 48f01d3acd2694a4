"""nbody_gnn_hpc_tpu — a TPU-native N-body + GNN-surrogate framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``Sanshrey712/nbody-gnn-hpc`` (an HPC N-body simulator + PyTorch-Geometric
GNN surrogate).  The compute path is designed TPU-first:

- the O(N^2) softened-gravity kernel is a tiled Pallas kernel (large N) or a
  fused XLA broadcast kernel (small N), batched with ``vmap`` and sharded over
  a ``jax.sharding.Mesh`` instead of ``multiprocessing.Pool`` fan-out
  (reference: ``src/hpc/nbody.py``, ``scripts/generate_data.py:143-147``);
- the KDK leapfrog integrator runs whole trajectories inside ``lax.scan``
  (reference inlines the update per-Python-step at ``src/hpc/nbody.py:202-218``);
- the message-passing GNN is Flax + ``segment_sum`` gather/scatter
  (reference: ``src/ai/model.py``), trained with a jitted physics-informed
  loss and an epoch-scanned train loop;
- inference rollouts are a single device program with on-device dynamic k-NN
  (the reference pays 2 host<->device transfers + a scipy cKDTree per rollout
  step, ``src/ai/predict.py:119-154``).

Public layers mirror the reference's (``src/hpc``, ``src/ai``, ``src/utils``):

- :mod:`nbody_gnn_hpc_tpu.sim`       — physics engine (NBodySimulator, forces, energy)
- :mod:`nbody_gnn_hpc_tpu.io`        — CheckpointManager, create_training_dataset
- :mod:`nbody_gnn_hpc_tpu.models`    — NBodyGNN / ParticleInteractionLayer
- :mod:`nbody_gnn_hpc_tpu.train`     — GNNDataset, PhysicsInformedLoss, Trainer
- :mod:`nbody_gnn_hpc_tpu.predict`   — Predictor, compare_with_hpc
- :mod:`nbody_gnn_hpc_tpu.ops`       — Pallas kernels, k-NN, edge features
- :mod:`nbody_gnn_hpc_tpu.parallel`  — device mesh + sharded batch simulation
- :mod:`nbody_gnn_hpc_tpu.utils`     — metrics, visualization, profiling
"""

__version__ = "0.1.0"

import os as _os


def _enable_persistent_compilation_cache():
    """XLA compiles are expensive (minutes for large scan programs on
    remote-compile TPU backends); cache them on disk across processes.
    Opt out with NBODY_GNN_TPU_NO_CACHE=1 or redirect with
    NBODY_GNN_TPU_CACHE_DIR."""
    if _os.environ.get("NBODY_GNN_TPU_NO_CACHE") == "1":
        return
    cache_dir = _os.environ.get(
        "NBODY_GNN_TPU_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    try:
        import jax

        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never block import


_enable_persistent_compilation_cache()

from nbody_gnn_hpc_tpu.config import TrainingConfig

__all__ = ["TrainingConfig", "__version__"]


def __getattr__(name):
    # Lazy subsystem access (keeps `import nbody_gnn_hpc_tpu` light).
    import importlib

    if name in ("sim", "ops", "models", "train", "predict", "parallel",
                "io", "utils", "serve", "client"):
        return importlib.import_module(f"nbody_gnn_hpc_tpu.{name}")
    raise AttributeError(name)
