"""Batched low-latency rollout service for the GNN surrogate.

The reference has no serving story (its inference path is a script that
round-trips the host twice per step — predict.py:142-147); this module is
the production-deployment counterpart: a checkpoint-loaded Predictor behind
a tiny stdlib HTTP server, with shape-warmed compiled rollouts so first
request latency is compile-free.

Endpoints (JSON over HTTP, no external dependencies):
  GET  /healthz           -> {"status": "ok", "device": ..., "model": ...}
  POST /rollout           -> single system rollout
        {"positions": (N,3), "velocities": (N,3), "masses": (N,),
         "n_steps": int}
        -> {"positions": (n_steps+1,N,3), "velocities": (n_steps+1,N,3)}
  POST /rollout_batch     -> batched rollout (one device program for all)
        {"positions": (B,N,3), "velocities": (B,N,3), "masses": (N,),
         "n_steps": int}

Device access is serialized with a lock (one chip); batching is the
throughput lever — a (B, N) batch rolls out as one vmapped scan program.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np


class RolloutService:
    """Checkpoint-backed rollout engine with shape warmup."""

    def __init__(self, model, checkpoint_path: str, k_neighbors: int = 40):
        from nbody_gnn_hpc_tpu.predict import Predictor

        self.predictor = Predictor(model, checkpoint_path,
                                   k_neighbors=k_neighbors)
        self._lock = threading.Lock()  # one device; serialize dispatches
        self.model_info = {
            "hidden_dim": model.hidden_dim, "n_layers": model.n_layers,
            "k_neighbors": k_neighbors, "checkpoint": str(checkpoint_path),
        }

    def warmup(self, n_particles: int, n_steps: int,
               batch: Optional[int] = None) -> None:
        """Compile the rollout program for a (batch, N, n_steps) shape so
        the first real request doesn't pay compile latency."""
        rng = np.random.RandomState(0)
        pos = rng.randn(n_particles, 3).astype(np.float32)
        vel = rng.randn(n_particles, 3).astype(np.float32)
        masses = rng.uniform(1e10, 1e12, n_particles).astype(np.float32)
        if batch:
            self.rollout_batch(np.stack([pos] * batch),
                               np.stack([vel] * batch), masses, n_steps)
        else:
            self.rollout(pos, vel, masses, n_steps)

    def rollout(self, positions, velocities, masses, n_steps: int):
        with self._lock:
            out = self.predictor.predict_rollout(
                np.asarray(positions, np.float32),
                np.asarray(velocities, np.float32),
                np.asarray(masses, np.float32), n_steps=int(n_steps))
        return {"positions": np.asarray(out["positions"]),
                "velocities": np.asarray(out["velocities"])}

    def rollout_batch(self, positions, velocities, masses, n_steps: int):
        with self._lock:
            out = self.predictor.predict_rollout_batch(
                np.asarray(positions, np.float32),
                np.asarray(velocities, np.float32),
                np.asarray(masses, np.float32), n_steps=int(n_steps))
        return {"positions": np.asarray(out["positions"]),
                "velocities": np.asarray(out["velocities"])}


def _validate(payload: dict, batched: bool) -> Tuple[np.ndarray, np.ndarray,
                                                     np.ndarray, int]:
    try:
        pos = np.asarray(payload["positions"], np.float32)
        vel = np.asarray(payload["velocities"], np.float32)
        masses = np.asarray(payload["masses"], np.float32)
        n_steps = int(payload["n_steps"])
    except (KeyError, TypeError, ValueError) as e:
        raise ValueError(f"bad request: {e}")
    want_dims = 3 if batched else 2
    if pos.ndim != want_dims or pos.shape != vel.shape \
            or pos.shape[-1] != 3 or masses.ndim != 1 \
            or masses.shape[0] != pos.shape[-2]:
        raise ValueError(
            f"shape mismatch: positions {pos.shape}, velocities {vel.shape},"
            f" masses {masses.shape} (batched={batched})")
    if not (1 <= n_steps <= 100_000):
        raise ValueError(f"n_steps out of range: {n_steps}")
    return pos, vel, masses, n_steps


def make_handler(service: RolloutService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._reply(200, {"status": "ok",
                                  "device": str(jax.devices()[0]),
                                  "model": service.model_info})
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path not in ("/rollout", "/rollout_batch"):
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length))
                batched = self.path == "/rollout_batch"
                pos, vel, masses, n_steps = _validate(payload, batched)
                fn = service.rollout_batch if batched else service.rollout
                out = fn(pos, vel, masses, n_steps)
                self._reply(200, {k: v.tolist() for k, v in out.items()})
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # keep the server alive on bad input
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(service: RolloutService, host: str = "127.0.0.1",
          port: int = 8742) -> ThreadingHTTPServer:
    """Start the HTTP server (returns it; call ``serve_forever`` to block)."""
    return ThreadingHTTPServer((host, port), make_handler(service))
