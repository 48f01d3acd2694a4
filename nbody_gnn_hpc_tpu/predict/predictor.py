"""Inference engine: jitted single-step predict and scan-compiled rollouts.

Parity target: ``Predictor`` (``src/ai/predict.py:20-154``) and
``compare_with_hpc`` (``predict.py:157-194``) — same public surface and
numerics (normalize -> k-NN graph -> forward -> denormalize, outputs fed
back in raw units).

TPU-first redesign of the reference's dominant inference cost (SURVEY §3.4):
the reference rebuilds a scipy cKDTree and crosses host<->device twice per
rollout step (394 sequential round-trips per evaluation).  Here the k-NN is
on-device (dense distances + ``lax.top_k``) and the WHOLE rollout is one
``lax.scan`` device program — zero host round-trips between steps.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nbody_gnn_hpc_tpu.io.model_io import load_checkpoint
from nbody_gnn_hpc_tpu.models.gnn import NBodyGNN
from nbody_gnn_hpc_tpu.ops.knn import (fully_connected_edge_index,
                                       knn_edge_index)


class Predictor:
    """Rollout engine for a trained N-body GNN."""

    def __init__(self,
                 model: NBodyGNN,
                 model_path: Optional[str] = None,
                 device: Optional[str] = None,    # parity arg; backend is JAX's
                 k_neighbors: Optional[int] = None,
                 params=None):
        del device
        self.model = model
        self.k_neighbors = k_neighbors
        self.norm_stats = None
        self.params = params
        self.quantization = None   # None | "bf16" | "int8" (weight-only)
        self._rollout_cache = {}

        if model_path:
            self.load_model(model_path)

    def load_model(self, model_path: str) -> None:
        """Load params + normalization stats (parity: ``predict.py:40-52``;
        norm stats are load-bearing for correctness).  Quantized serving
        checkpoints (predict/quantize.py) are detected via their
        ``"quantization"`` marker and dequantized inside the jitted step."""
        ckpt = load_checkpoint(model_path)
        state = ckpt.get("model_state_dict", ckpt)
        self.quantization = ckpt.get("quantization")
        # Tolerate non-array leaves (e.g. metadata strings in hand-edited
        # checkpoints); int8 kernels are {"q", "scale"} dicts whose array
        # values tree_map visits individually.
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if hasattr(x, "shape") else x, state)
        if ckpt.get("norm_stats") is not None:
            self.norm_stats = ckpt["norm_stats"]
            print("Loaded normalization stats")
        tag = f" [{self.quantization} weights]" if self.quantization else ""
        print(f"Loaded model from {model_path}{tag}")
        self._rollout_cache.clear()

    def quantize(self, mode: str) -> None:
        """Quantize the loaded weights in place (weight-only bf16/int8;
        predict/quantize.py) — serving memory/latency knob, no reload."""
        from nbody_gnn_hpc_tpu.predict.quantize import quantize_params
        if self.params is None:
            raise ValueError("no params loaded to quantize")
        if self.quantization:
            raise ValueError(f"params already {self.quantization}-quantized")
        self.params = quantize_params(self.params, mode)
        self.quantization = mode
        self._rollout_cache.clear()

    # -- core jitted step -----------------------------------------------------

    def _mean_std(self, dtype=jnp.float32):
        if self.norm_stats is not None:
            return (jnp.asarray(self.norm_stats["state_mean"], dtype),
                    jnp.asarray(self.norm_stats["state_std"], dtype))
        return jnp.zeros(6, dtype), jnp.ones(6, dtype)

    def _build_step(self, n_particles: int):
        """One physical-units step: normalize, build graph, forward,
        denormalize (predict.py:54-117) — fully on device."""
        model = self.model
        mean, std = self._mean_std()
        k = self.k_neighbors
        use_knn = k is not None and k < n_particles - 1
        static_edges = None if use_knn else jnp.asarray(
            fully_connected_edge_index(n_particles))
        quantized = self.quantization is not None

        def step(params, pos, vel, mass_feat):
            if quantized:
                # Weight-only dequantization; loop-invariant, so XLA hoists
                # it out of scanned rollouts (one pass per program).
                from nbody_gnn_hpc_tpu.predict.quantize import \
                    dequantize_params
                params = dequantize_params(params)
            norm_pos = (pos - mean[:3]) / std[:3]
            norm_vel = (vel - mean[3:6]) / std[3:6]
            x = jnp.concatenate([norm_pos, norm_vel, mass_feat], axis=1)
            if use_knn:
                edges = knn_edge_index(norm_pos, k)  # fresh graph per step
            else:
                edges = static_edges
            pred = model.apply({"params": params}, x, edges, norm_pos,
                               deterministic=True)
            next_pos = pred[:, :3] * std[:3] + mean[:3]
            next_vel = pred[:, 3:6] * std[3:6] + mean[3:6]
            return next_pos, next_vel

        return step

    def _get_rollout_fn(self, n_particles: int, n_steps: int,
                        trajectory: bool = True):
        key = (n_particles, n_steps, trajectory)
        if key not in self._rollout_cache:
            step = self._build_step(n_particles)

            @jax.jit
            def rollout(params, pos0, vel0, mass_feat):
                def body(carry, _):
                    pos, vel = carry
                    pos, vel = step(params, pos, vel, mass_feat)
                    return (pos, vel), ((pos, vel) if trajectory else None)

                carry, ys = jax.lax.scan(body, (pos0, vel0), None,
                                         length=n_steps)
                if not trajectory:
                    # Final state only: the program's output is (N, 3)x2 —
                    # nothing per-step is materialized or read back.
                    return carry
                ps, vs = ys
                return (jnp.concatenate([pos0[None], ps]),
                        jnp.concatenate([vel0[None], vs]))

            self._rollout_cache[key] = rollout
        return self._rollout_cache[key]

    def _get_batch_rollout_fn(self, n_particles: int, n_steps: int,
                              trajectory: bool = True):
        key = ("batch", n_particles, n_steps, trajectory)
        if key not in self._rollout_cache:
            step = self._build_step(n_particles)

            @jax.jit
            def rollout(params, pos0, vel0, mass_feat):
                # pos0: (B, N, 3); mass_feat: (B, N, 1) — per-system masses
                # so the serving micro-batcher can coalesce requests with
                # different mass vectors into one program.
                def one(p0, v0, mf):
                    def body(carry, _):
                        pos, vel = carry
                        pos, vel = step(params, pos, vel, mf)
                        return (pos, vel), ((pos, vel) if trajectory
                                            else None)

                    carry, ys = jax.lax.scan(body, (p0, v0), None,
                                             length=n_steps)
                    if not trajectory:
                        return carry
                    ps, vs = ys
                    return (jnp.concatenate([p0[None], ps]),
                            jnp.concatenate([v0[None], vs]))

                return jax.vmap(one)(pos0, vel0, mass_feat)

            self._rollout_cache[key] = rollout
        return self._rollout_cache[key]

    # -- reference surface ------------------------------------------------------

    def predict_single(self, positions: np.ndarray, velocities: np.ndarray,
                       masses: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Next state in physical units (parity: ``predict.py:93-117``)."""
        n = len(masses)
        step = self._get_rollout_fn(n, 1)
        mass_feat = (np.asarray(masses) / np.asarray(masses).mean()
                     ).reshape(-1, 1).astype(np.float32)
        ps, vs = step(self.params,
                      jnp.asarray(positions, jnp.float32),
                      jnp.asarray(velocities, jnp.float32),
                      jnp.asarray(mass_feat))
        return np.asarray(ps[1]), np.asarray(vs[1])

    def predict_rollout(self, initial_positions: np.ndarray,
                        initial_velocities: np.ndarray,
                        masses: np.ndarray, n_steps: int,
                        trajectory: bool = True,
                        out_dtype=np.float64) -> Dict[str, np.ndarray]:
        """Multi-step rollout (parity: ``predict.py:119-154``) — one device
        program for all steps.

        ``trajectory=False`` compiles a final-state-only variant: the scan
        carries no per-step outputs, so the device materializes and the
        host reads back just (N, 3)x2 instead of (n_steps+1, N, 3)x2 —
        the right mode for next-state serving (the readback is the
        dominant per-request cost on a tunneled host).

        ``out_dtype``: host dtype of the returned arrays. float64 is the
        reference's output convention (predict.py returns f64); serving
        passes float32 — the compute is f32, so the narrow copy is
        lossless and skips an upcast copy of the whole trajectory."""
        n_particles = len(masses)
        rollout = self._get_rollout_fn(n_particles, n_steps, trajectory)
        mass_feat = (np.asarray(masses) / np.asarray(masses).mean()
                     ).reshape(-1, 1).astype(np.float32)
        ps, vs = rollout(self.params,
                         jnp.asarray(initial_positions, jnp.float32),
                         jnp.asarray(initial_velocities, jnp.float32),
                         jnp.asarray(mass_feat))
        return {
            "positions": np.asarray(ps, out_dtype),
            "velocities": np.asarray(vs, out_dtype),
            "n_steps": n_steps,
            "n_particles": n_particles,
        }

    def predict_rollout_batch(self, initial_positions: np.ndarray,
                              initial_velocities: np.ndarray,
                              masses: np.ndarray, n_steps: int,
                              trajectory: bool = True,
                              out_dtype=np.float64
                              ) -> Dict[str, np.ndarray]:
        """Rollouts for a whole batch of initial states in ONE device
        program (``vmap`` over sims) — used by evaluation to run all test
        sims at once.  Inputs (B, N, 3); outputs (B, n_steps+1, N, 3).

        No reference equivalent: the reference rolls test sims out one at a
        time, one host round-trip per step (``evaluate.py:101-110``).

        ``masses``: (N,) shared across the batch, or (B, N) per system —
        each system's mass feature is normalized by its own mean, matching
        ``predict_rollout``'s semantics for that system alone.

        ``trajectory=False``: final (B, N, 3) states only; ``out_dtype``:
        host dtype of the returned arrays (see ``predict_rollout``).
        """
        masses = np.asarray(masses)
        batch = np.asarray(initial_positions).shape[0]
        n_particles = masses.shape[-1]
        rollout = self._get_batch_rollout_fn(n_particles, n_steps,
                                             trajectory)
        if masses.ndim == 1:
            masses = np.broadcast_to(masses, (batch, n_particles))
        mass_feat = (masses / masses.mean(axis=1, keepdims=True)
                     )[..., None].astype(np.float32)
        ps, vs = rollout(self.params,
                         jnp.asarray(initial_positions, jnp.float32),
                         jnp.asarray(initial_velocities, jnp.float32),
                         jnp.asarray(mass_feat))
        return {
            "positions": np.asarray(ps, out_dtype),
            "velocities": np.asarray(vs, out_dtype),
            "n_steps": n_steps,
            "n_particles": n_particles,
        }


def compare_with_hpc(predictor: Predictor, hpc_trajectory: Dict,
                     start_step: int = 0,
                     n_prediction_steps: int = 100) -> Dict:
    """Roll the GNN out from a ground-truth state and score per-step RMSE
    (parity: ``predict.py:157-194``)."""
    positions = hpc_trajectory["positions"]
    velocities = hpc_trajectory["velocities"]
    masses = hpc_trajectory["masses"]

    ai = predictor.predict_rollout(positions[start_step],
                                   velocities[start_step],
                                   masses, n_prediction_steps)

    end_step = min(start_step + n_prediction_steps + 1, len(positions))
    hpc_pos = positions[start_step:end_step]
    hpc_vel = velocities[start_step:end_step]
    ai_pos = ai["positions"][:len(hpc_pos)]
    ai_vel = ai["velocities"][:len(hpc_vel)]

    pos_error = np.sqrt(np.mean((ai_pos - hpc_pos) ** 2, axis=(1, 2)))
    vel_error = np.sqrt(np.mean((ai_vel - hpc_vel) ** 2, axis=(1, 2)))

    return {
        "ai_positions": ai_pos,
        "ai_velocities": ai_vel,
        "hpc_positions": hpc_pos,
        "hpc_velocities": hpc_vel,
        "position_rmse": pos_error,
        "velocity_rmse": vel_error,
        "mean_position_rmse": float(np.mean(pos_error)),
        "mean_velocity_rmse": float(np.mean(vel_error)),
        "final_position_rmse": float(pos_error[-1]),
        "final_velocity_rmse": float(vel_error[-1]),
    }
