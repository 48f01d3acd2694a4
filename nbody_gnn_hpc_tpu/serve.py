"""Batched low-latency rollout service for the GNN surrogate.

The reference has no serving story (its inference path is a script that
round-trips the host twice per step — predict.py:142-147); this module is
the production-deployment counterpart: a checkpoint-loaded Predictor behind
a tiny stdlib HTTP server, with shape-warmed compiled rollouts so first
request latency is compile-free.

Endpoints (JSON over HTTP, no external dependencies):
  GET  /healthz           -> {"status": "ok", "device": ..., "model": ...}
  GET  /metrics           -> Prometheus text format: request counters by
                             endpoint/status + latency histograms + uptime
  POST /rollout           -> single system rollout
        {"positions": (N,3), "velocities": (N,3), "masses": (N,),
         "n_steps": int, "trajectory": bool = true, "format": "json"|"npz"}
        -> {"positions": (n_steps+1,N,3), "velocities": (n_steps+1,N,3)}
           ("trajectory": false -> final (N,3) state only)
  POST /rollout_batch     -> batched rollout (one device program for all)
        {"positions": (B,N,3), "velocities": (B,N,3), "masses": (N,),
         "n_steps": int, "trajectory": bool = true, "format": ...}

Response cost matters as much as device cost: a 394-step N=200 trajectory
is ~10 MB of float text as JSON (measured to dominate request latency).
Clients that only need the endpoint state should send "trajectory": false;
clients that need the full trajectory should send "format": "npz" (an
uncompressed f32 .npz body — the compute precision — ~5x smaller and far
cheaper to produce/parse than JSON). Both knobs also apply to /simulate
(which already defaulted to final-state-only).

Streaming ("stream": true on /rollout and /simulate): the trajectory is
computed in fixed-size chunks and sent as NDJSON — one JSON line per chunk
({"frame_start", "positions", "velocities"[, "times"]}), terminated by
{"done": true}. The device lock is released between chunks (long streams
interleave with other traffic instead of stalling it), host memory is
bounded at one chunk, and /rollout streams of ANY length reuse one
compiled (N, chunk) program ("chunk" request key, default 64). Streamed
/simulate trajectories are exempt from the 4000-saved-frame cap — nothing
is buffered. Mid-stream errors arrive as a final {"error": ...} line
(headers are already out); a stream without the "done" terminator is
incomplete.

Device access is serialized with a lock (one chip); batching is the
throughput lever — a (B, N) batch rolls out as one vmapped scan program.
On a multi-device host, :func:`build_replica_pool` puts one device-pinned
replica per chip behind the same interface (serving DP): requests acquire
a free replica instead of serializing on one lock, composing with the
micro-batcher and every response mode.
"""

import itertools
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np


def build_service(model_path: str, config_path: str,
                  quantize: Optional[str] = None) -> "RolloutService":
    """Construct a RolloutService from a checkpoint + persisted config.json
    (the schema train_model.py writes). Single source of truth for the
    architecture/k_neighbors reconstruction — scripts/serve.py and
    benchmarks/bench_serving.py both use this, so benchmark numbers are
    measured on exactly what the server serves."""
    import json as _json
    from pathlib import Path as _Path

    from nbody_gnn_hpc_tpu.models import model_from_config

    cfg_path = _Path(config_path)
    if cfg_path.exists():
        cfg = _json.loads(cfg_path.read_text())
        model_config = cfg["model_config"]
        k_neighbors = cfg.get("training_config", {}).get("k_neighbors", 40)
    else:
        model_config = {"node_input_dim": 7, "hidden_dim": 256,
                        "n_layers": 6, "output_dim": 6, "dropout": 0.1}
        k_neighbors = 40
    model = model_from_config(model_config, dtype_override="float32")
    return RolloutService(model, model_path, k_neighbors=k_neighbors,
                          quantize=quantize)


class RolloutService:
    """Checkpoint-backed rollout engine with shape warmup."""

    def __init__(self, model, checkpoint_path: str, k_neighbors: int = 40,
                 quantize: Optional[str] = None):
        from nbody_gnn_hpc_tpu.predict import Predictor

        self.predictor = Predictor(model, checkpoint_path,
                                   k_neighbors=k_neighbors)
        if quantize and not self.predictor.quantization:
            # Weight-only serving quantization (predict/quantize.py); a
            # checkpoint already carrying quantized weights wins.
            self.predictor.quantize(quantize)
        self._lock = threading.Lock()  # one device; serialize dispatches
        self._exec_device = None  # set by build_replica_pool (device pin)
        self.model_info = {
            "hidden_dim": model.hidden_dim, "n_layers": model.n_layers,
            "k_neighbors": k_neighbors, "checkpoint": str(checkpoint_path),
            "quantization": self.predictor.quantization,
        }
        # Resolved once: /healthz must answer from cached state, not call
        # jax.devices() per request (device discovery can hang for minutes
        # during a backend outage, and liveness probes are exactly what
        # must keep answering then).
        import jax
        self.device = str(jax.devices()[0])

    def warmup(self, n_particles: int, n_steps: int,
               batch: Optional[int] = None,
               trajectories=(True, False)) -> None:
        """Compile the rollout programs for a (batch, N, n_steps) shape so
        the first real request doesn't pay compile latency. Each response
        variant (full trajectory / final-state-only) is a separate compiled
        program; both are warmed by default — pass ``trajectories=(True,)``
        to halve cold-start time when clients only ever use one mode
        (remote compiles cost minutes on a tunneled host)."""
        rng = np.random.RandomState(0)
        pos = rng.randn(n_particles, 3).astype(np.float32)
        vel = rng.randn(n_particles, 3).astype(np.float32)
        masses = rng.uniform(1e10, 1e12, n_particles).astype(np.float32)
        for trajectory in trajectories:
            if batch:
                self.rollout_batch(np.stack([pos] * batch),
                                   np.stack([vel] * batch), masses, n_steps,
                                   trajectory=trajectory)
            else:
                self.rollout(pos, vel, masses, n_steps,
                             trajectory=trajectory)

    def rollout(self, positions, velocities, masses, n_steps: int,
                trajectory: bool = True):
        """``trajectory=False`` returns only the final state (N, 3)x2, via
        a final-state-only compiled program (the scan carries no per-step
        outputs) — measured on this host, the full-trajectory readback +
        JSON response dominates request latency (~10 MB of float text for
        394 steps at N=200), so next-state-service clients should ask for
        the endpoint only."""
        with self._lock:
            # out_dtype=f32: the compute is f32, so serving responses skip
            # the reference-convention f64 upcast copy of the trajectory.
            out = self.predictor.predict_rollout(
                np.asarray(positions, np.float32),
                np.asarray(velocities, np.float32),
                np.asarray(masses, np.float32), n_steps=int(n_steps),
                trajectory=trajectory, out_dtype=np.float32)
        return {"positions": out["positions"],
                "velocities": out["velocities"]}

    def rollout_batch(self, positions, velocities, masses, n_steps: int,
                      trajectory: bool = True):
        with self._lock:
            out = self.predictor.predict_rollout_batch(
                np.asarray(positions, np.float32),
                np.asarray(velocities, np.float32),
                np.asarray(masses, np.float32), n_steps=int(n_steps),
                trajectory=trajectory, out_dtype=np.float32)
        return {"positions": out["positions"],
                "velocities": out["velocities"]}

    # Rollout steps per streamed chunk: one compiled (N, chunk) program
    # covers any client n_steps (the tail reuses it and slices), and each
    # chunk's device+readback latency stays well under a second.
    STREAM_CHUNK = 64

    def rollout_stream(self, positions, velocities, masses, n_steps: int,
                       chunk: Optional[int] = None):
        """GNN rollout as a generator of trajectory chunks.

        Yields dicts ``{"frame_start": int, "positions": (F, N, 3),
        "velocities": (F, N, 3)}`` whose frames concatenate to exactly the
        ``trajectory=True`` rollout (frames 0..n_steps inclusive; chunk
        boundaries never duplicate a frame).

        Three properties the monolithic rollout doesn't have:
        - the device lock is held per CHUNK, not per request, so concurrent
          requests interleave with a long stream instead of stalling behind
          it (streamed requests bypass the MicroBatcher for the same
          reason);
        - host memory is bounded at one chunk regardless of n_steps;
        - every chunk — including the tail — runs the SAME compiled
          (n_particles, chunk) program (the tail's surplus steps are
          computed and discarded; surplus < chunk), so an arbitrary-length
          stream costs one compile. ``warmup(n_particles, chunk)`` warms it.
        """
        chunk = int(chunk or self.STREAM_CHUNK)
        yield from _stream_rollout_chunks(
            lambda pos, vel, m: self.rollout_chunk(pos, vel, m, chunk),
            positions, velocities, masses, int(n_steps), chunk)

    def rollout_chunk(self, pos, vel, masses, chunk: int):
        """One fixed-size stream chunk under this service's device lock:
        returns (chunk+1, N, 3) position/velocity arrays. The unit both
        the single-service and replica-pool stream loops execute."""
        with self._lock:
            out = self.predictor.predict_rollout(
                pos, vel, masses, n_steps=chunk, trajectory=True,
                out_dtype=np.float32)
        return out["positions"], out["velocities"]

    def simulate_stream(self, positions, velocities, masses, n_steps: int,
                        dt: float = 0.001, save_interval: int = 1):
        """Exact-physics trajectory as a generator of chunks (the streaming
        counterpart of ``simulate(trajectory=True)``; same bounded device
        programs, but each chunk is yielded as soon as it is read back).
        Because nothing is buffered, streamed simulations are exempt from
        the handler's saved-frame cap.

        Yields ``{"frame_start": int, "positions", "velocities", "times"}``
        in saved-frame index space; chunks concatenate to exactly the
        buffered trajectory-mode response."""
        state = self._prepare_sim_state(positions, velocities, masses)
        for start, ps, vs, ts in self._sim_frames(state, dt, int(n_steps),
                                                  int(save_interval)):
            yield {"frame_start": start, "positions": ps,
                   "velocities": vs, "times": ts}

    # Steps per device program for /simulate: one compile covers every
    # full chunk regardless of the client's n_steps, and each program
    # stays far below the backend's long-program kill threshold.
    SIM_CHUNK = 200

    def _prepare_sim_state(self, positions, velocities, masses):
        from nbody_gnn_hpc_tpu.sim import accelerations
        from nbody_gnn_hpc_tpu.sim.state import make_state

        state = make_state(np.asarray(positions, np.float32),
                           np.asarray(velocities, np.float32),
                           np.asarray(masses, np.float32))
        state = state._replace(
            accelerations=accelerations(state.positions, state.masses))
        if self._exec_device is not None:
            # Replica-pool pinning: committing the state routes every
            # subsequent /simulate program to this replica's device (the
            # GNN paths are pinned through the committed params instead).
            import jax
            state = jax.device_put(state, self._exec_device)
        return state

    def _advance(self, state, dt, steps: int):
        """Advance without saving, <=SIM_CHUNK steps per device program,
        the lock held per program (at most two compiled shapes: SIM_CHUNK
        and one remainder)."""
        from nbody_gnn_hpc_tpu.sim.integrator import rollout_steps

        done = 0
        while done < steps:
            todo = min(self.SIM_CHUNK, steps - done)
            with self._lock:
                state = rollout_steps(state, dt, todo)
            done += todo
        return state

    def _sim_frames(self, state, dt, n_steps: int, save_interval: int):
        """Saved-frame chunks ``(frame_start, positions, velocities,
        times)`` for a trajectory run. EVERY device program is bounded by
        ~SIM_CHUNK steps and the lock is released between programs, in
        both regimes:

        - ``save_interval <= SIM_CHUNK``: run_trajectory chunks aligned to
          the save cadence (multiple saves per program).
        - ``save_interval > SIM_CHUNK``: one run_trajectory segment would
          be a single save_interval-step program — minutes-long programs
          get killed by this backend (CLAUDE.md) and stall all traffic
          behind the lock. Instead, fast-forward each interval in
          <=SIM_CHUNK-step no-save programs and capture the state at every
          save boundary (the same leapfrog step sequence, so frames match
          run_trajectory exactly). Trailing ``n_steps % save_interval``
          steps are integrated-but-unsaved in the reference semantics
          (nbody.py:237-241) and unobservable in trajectory output, so
          they are skipped.
        """
        from nbody_gnn_hpc_tpu.sim.integrator import run_trajectory

        if save_interval <= self.SIM_CHUNK:
            # Chunks must be multiples of save_interval so the global save
            # cadence is preserved across boundaries.
            chunk = max(save_interval,
                        (self.SIM_CHUNK // save_interval) * save_interval)
            done = 0
            while done < n_steps:
                todo = min(chunk, n_steps - done)
                with self._lock:
                    traj = run_trajectory(state, dt, todo,
                                          save_interval=save_interval)
                state = traj.final
                skip = 0 if done == 0 else 1  # drop duplicated chunk head
                yield (done // save_interval + skip,
                       np.asarray(traj.positions[skip:]),
                       np.asarray(traj.velocities[skip:]),
                       np.asarray(traj.times[skip:]))
                done += todo
            return
        yield (0, np.asarray(state.positions[None]),
               np.asarray(state.velocities[None]),
               np.asarray(state.time[None]))
        for k in range(n_steps // save_interval):
            state = self._advance(state, dt, save_interval)
            yield (k + 1, np.asarray(state.positions[None]),
                   np.asarray(state.velocities[None]),
                   np.asarray(state.time[None]))

    def simulate(self, positions, velocities, masses, n_steps: int,
                 dt: float = 0.001, trajectory: bool = False,
                 save_interval: int = 1):
        """Exact-physics rollout on the same device (the HPC engine as a
        service, beyond the reference's file-based workflow).  Returns the
        final state, or the saved trajectory when ``trajectory`` is set.

        The run is chunked into ~SIM_CHUNK-step programs, so arbitrary
        client n_steps reuse one compiled program per chunk shape instead
        of compiling a fresh multi-minute scan, and the device lock is
        released between programs so concurrent requests interleave with a
        long simulation."""
        n_steps = int(n_steps)
        save_interval = int(save_interval)
        state = self._prepare_sim_state(positions, velocities, masses)
        if not trajectory:
            state = self._advance(state, dt, n_steps)
            return {"positions": np.asarray(state.positions),
                    "velocities": np.asarray(state.velocities)}
        pos_parts, vel_parts, time_parts = [], [], []
        for _start, ps, vs, ts in self._sim_frames(state, dt, n_steps,
                                                   save_interval):
            pos_parts.append(ps)
            vel_parts.append(vs)
            time_parts.append(ts)
        return {"positions": np.concatenate(pos_parts),
                "velocities": np.concatenate(vel_parts),
                "times": np.concatenate(time_parts)}


class Metrics:
    """In-process request metrics, rendered in Prometheus text format at
    ``GET /metrics`` (counters by endpoint/status + latency histograms by
    endpoint). Thread-safe; one instance per server. No external deps —
    the scrape format is plain text, so any Prometheus-compatible stack
    can consume it as-is."""

    # Seconds; chosen to bracket both CPU-smoke (~10 ms) and tunneled-TPU
    # long-rollout (~10 s) request latencies.
    BUCKETS = (0.005, 0.02, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0, 30.0)

    def __init__(self):
        self._lock = threading.Lock()
        self._requests = {}    # (endpoint, status) -> count
        self._hist = {}        # endpoint -> [bucket counts..., +Inf]
        self._sum = {}         # endpoint -> total seconds
        self._started = time.time()

    def observe(self, endpoint: str, status: int, seconds: float) -> None:
        with self._lock:
            key = (endpoint, int(status))
            self._requests[key] = self._requests.get(key, 0) + 1
            h = self._hist.setdefault(endpoint,
                                      [0] * (len(self.BUCKETS) + 1))
            for i, edge in enumerate(self.BUCKETS):
                if seconds <= edge:
                    h[i] += 1
                    break
            else:
                h[-1] += 1
            self._sum[endpoint] = self._sum.get(endpoint, 0.0) + seconds

    def render(self) -> str:
        with self._lock:
            lines = [
                "# HELP nbody_requests_total Requests by endpoint and "
                "HTTP status.",
                "# TYPE nbody_requests_total counter",
            ]
            for (endpoint, status), n in sorted(self._requests.items()):
                lines.append(f'nbody_requests_total{{endpoint="{endpoint}",'
                             f'status="{status}"}} {n}')
            lines += [
                "# HELP nbody_request_seconds Request latency.",
                "# TYPE nbody_request_seconds histogram",
            ]
            for endpoint in sorted(self._hist):
                h = self._hist[endpoint]
                cum = 0
                for edge, n in zip(self.BUCKETS, h):
                    cum += n
                    lines.append(
                        f'nbody_request_seconds_bucket{{endpoint='
                        f'"{endpoint}",le="{edge}"}} {cum}')
                cum += h[-1]
                lines.append(f'nbody_request_seconds_bucket{{endpoint='
                             f'"{endpoint}",le="+Inf"}} {cum}')
                lines.append(f'nbody_request_seconds_count{{endpoint='
                             f'"{endpoint}"}} {cum}')
                lines.append(f'nbody_request_seconds_sum{{endpoint='
                             f'"{endpoint}"}} {self._sum[endpoint]:.6f}')
            lines.append("# HELP nbody_uptime_seconds Seconds since server "
                         "construction.")
            lines.append("# TYPE nbody_uptime_seconds gauge")
            lines.append(f"nbody_uptime_seconds "
                         f"{time.time() - self._started:.1f}")
            return "\n".join(lines) + "\n"


def build_replica_pool(model_path: str, config_path: str,
                       n_replicas: Optional[int] = None,
                       quantize: Optional[str] = None) -> "ReplicaPool":
    """One device-pinned :class:`RolloutService` replica per visible device
    (or the first ``n_replicas`` devices), behind the single-service
    interface. On a multi-chip host this is serving DP: independent
    requests run concurrently on different chips instead of serializing on
    one device lock. The 2.5M-param model replicates trivially (SURVEY
    §2.3: TP/PP are n/a); each replica's params are committed to its
    device with ``jax.device_put`` so dispatches land there."""
    import jax

    devices = jax.devices()
    n = len(devices) if n_replicas is None else int(n_replicas)
    if not (1 <= n <= len(devices)):
        raise ValueError(f"n_replicas={n} but {len(devices)} devices visible")
    services = []
    for dev in devices[:n]:
        svc = build_service(model_path, config_path, quantize=quantize)
        svc.predictor.params = jax.device_put(svc.predictor.params, dev)
        svc._exec_device = dev  # pins the exact-physics /simulate path too
        svc.device = str(dev)
        services.append(svc)
    return ReplicaPool(services)


class ReplicaPool:
    """Device-replica pool with the RolloutService surface.

    Each request acquires a free replica (FIFO; blocks when every replica
    is busy — the multi-device generalization of the single service's
    lock) and runs entirely on that replica's device. GNN streams acquire
    a replica per CHUNK (their carry is host-side), so long streams
    load-balance across the pool; /simulate streams pin one replica (their
    state lives on its device). Composes with :class:`MicroBatcher` (each
    coalesced batch dispatch acquires one replica).
    """

    def __init__(self, services):
        import queue

        if not services:
            raise ValueError("ReplicaPool needs at least one service")
        self.services = list(services)
        self._free = queue.Queue()
        for s in self.services:
            self._free.put(s)
        self.STREAM_CHUNK = self.services[0].STREAM_CHUNK
        self.model_info = {**self.services[0].model_info,
                           "replicas": len(self.services)}
        self.device = ", ".join(s.device for s in self.services)

    def warmup(self, *args, **kwargs) -> None:
        # Every replica compiles its own device's executable (one compile
        # per device; later replicas hit the persistent compile cache).
        for s in self.services:
            s.warmup(*args, **kwargs)

    def _run(self, method, *args, **kwargs):
        s = self._free.get()
        try:
            return getattr(s, method)(*args, **kwargs)
        finally:
            self._free.put(s)

    def rollout(self, *args, **kwargs):
        return self._run("rollout", *args, **kwargs)

    def rollout_batch(self, *args, **kwargs):
        return self._run("rollout_batch", *args, **kwargs)

    def simulate(self, *args, **kwargs):
        return self._run("simulate", *args, **kwargs)

    def rollout_stream(self, positions, velocities, masses, n_steps: int,
                       chunk: Optional[int] = None):
        """Each chunk acquires a free replica: the carry between chunks is
        host-side, so a long stream load-balances across the pool instead
        of pinning one replica (FIFO rotation alternates replicas when
        several are free)."""
        chunk = int(chunk or self.STREAM_CHUNK)

        def run_chunk(pos, vel, m):
            s = self._free.get()
            try:
                return s.rollout_chunk(pos, vel, m, chunk)
            finally:
                self._free.put(s)

        yield from _stream_rollout_chunks(run_chunk, positions, velocities,
                                          masses, int(n_steps), chunk)

    def simulate_stream(self, *args, **kwargs):
        # The simulation state lives on the acquired replica's device
        # between chunks, so (unlike rollout_stream) the whole stream pins
        # that replica; exhaustion or abandonment releases it.
        s = self._free.get()
        try:
            yield from s.simulate_stream(*args, **kwargs)
        finally:
            self._free.put(s)


def _stream_rollout_chunks(run_chunk, positions, velocities, masses,
                           n_steps: int, chunk: int):
    """Shared chunk loop for streamed GNN rollouts: the carry between
    chunks is host-side (f32 numpy states), so ``run_chunk`` may execute
    each chunk on a different device — the single service locks its one
    device per chunk, the replica pool acquires a free replica per chunk.
    ``run_chunk(pos, vel, masses) -> (ps, vs)`` runs the fixed
    ``chunk``-step program and returns (chunk+1, N, 3) arrays."""
    pos = np.asarray(positions, np.float32)
    vel = np.asarray(velocities, np.float32)
    masses = np.asarray(masses, np.float32)
    done = 0
    while done < n_steps:
        todo = min(chunk, n_steps - done)
        ps, vs = run_chunk(pos, vel, masses)  # (chunk+1, N, 3)
        pos, vel = ps[todo], vs[todo]
        lo = 0 if done == 0 else 1  # drop duplicated chunk head
        yield {"frame_start": done + lo,
               "positions": ps[lo:todo + 1],
               "velocities": vs[lo:todo + 1]}
        done += todo


class _Job:
    """One queued single-system rollout awaiting a coalesced dispatch."""

    __slots__ = ("pos", "vel", "masses", "trajectory", "event", "result",
                 "error")

    def __init__(self, pos, vel, masses, trajectory=True):
        self.pos, self.vel, self.masses = pos, vel, masses
        self.trajectory = trajectory
        self.event = threading.Event()
        self.result = None
        self.error = None


class MicroBatcher:
    """Coalesce concurrent single-system ``/rollout`` requests into one
    vmapped device program.

    Without this, concurrent requests serialize on the device lock — B
    clients pay B sequential rollouts. With it, requests sharing a
    (n_particles, n_steps) key that arrive within ``max_wait_s`` of each
    other run as ONE batched scan program (per-system masses supported),
    so B clients pay ~1 rollout of batch B.

    TPU-aware detail: each distinct batch size is a separate XLA
    compilation, so batches are padded up to fixed power-of-two buckets
    (1, 2, 4, ... max_batch) by repeating the last system and slicing the
    padding off the results — bounded compile count, warmable up front.
    """

    def __init__(self, service: RolloutService, max_batch: int = 8,
                 max_wait_s: float = 0.005):
        self.service = service
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        # Power-of-two buckets, PLUS max_batch itself so the lookup below
        # always succeeds for any non-power-of-two cap (e.g. max_batch=6
        # -> buckets (1, 2, 4, 6)).
        self.buckets = tuple(sorted(
            {2 ** i for i in range(max(1, max_batch).bit_length())
             if 2 ** i <= max_batch} | {max_batch}))
        self._lock = threading.Lock()
        self._pending = {}  # (n_particles, n_steps) -> list[_Job]

    def warmup(self, n_particles: int, n_steps: int,
               trajectories=(True, False)) -> None:
        """Compile every bucket size for a (N, n_steps) shape."""
        for b in self.buckets:
            self.service.warmup(n_particles, n_steps, batch=b,
                                trajectories=trajectories)

    def rollout(self, positions, velocities, masses, n_steps: int,
                trajectory: bool = True):
        pos = np.asarray(positions, np.float32)
        vel = np.asarray(velocities, np.float32)
        masses = np.asarray(masses, np.float32)
        key = (pos.shape[0], int(n_steps))
        job = _Job(pos, vel, masses, trajectory)
        with self._lock:
            queue = self._pending.setdefault(key, [])
            queue.append(job)
            leader = len(queue) == 1
        if leader:
            self._lead(key, int(n_steps))
        job.event.wait()
        if job.error is not None:
            raise job.error
        return job.result

    def _lead(self, key, n_steps: int) -> None:
        # Give followers a short window to join (they pile up naturally
        # while the device is busy with a previous batch).
        deadline = time.monotonic() + self.max_wait_s
        while time.monotonic() < deadline:
            with self._lock:
                # .get: a previous leader's drain tail may have taken this
                # leader's job and popped the key already.
                if len(self._pending.get(key, ())) >= self.max_batch:
                    break
            time.sleep(0.0005)
        # Drain in chunks of at most max_batch: requests beyond the cap
        # run as additional bucketed batches instead of one oversized batch
        # with an unwarmed, never-compiled shape. The key is popped whole
        # so a long-lived server doesn't accumulate one empty list per
        # request shape ever seen; arrivals after the pop elect their own
        # leader via setdefault.
        with self._lock:
            queue = self._pending.pop(key, [])
        chunks = [queue[i:i + self.max_batch]
                  for i in range(0, len(queue), self.max_batch)]
        if not chunks:
            return
        if len(chunks) == 1:
            self._dispatch(chunks[0], n_steps)
            return
        # Overflow chunks dispatch CONCURRENTLY: on a single device they
        # serialize harmlessly on the service lock; on a ReplicaPool each
        # chunk acquires its own replica, so a burst of 4x max_batch jobs
        # saturates 4 chips instead of queueing behind one.
        threads = [threading.Thread(target=self._dispatch,
                                    args=(chunk, n_steps))
                   for chunk in chunks]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    def _dispatch(self, jobs, n_steps: int) -> None:
        # Pad to the next bucket by repeating the last system; slice
        # off the padding after. One compile per bucket, not per batch
        # size. The bucket lookup cannot fail: len(jobs) <= max_batch
        # and max_batch is always a bucket.
        bucket = next(b for b in self.buckets if b >= len(jobs))
        pad = bucket - len(jobs)
        take = jobs + [jobs[-1]] * pad
        try:
            # If nobody in this batch wants the full trajectory, the
            # host-side conversion of (B, steps+1, N, 3) is skipped too.
            want_traj = any(j.trajectory for j in jobs)
            out = self.service.rollout_batch(
                np.stack([j.pos for j in take]),
                np.stack([j.vel for j in take]),
                np.stack([j.masses for j in take]), n_steps,
                trajectory=want_traj)
            for i, j in enumerate(jobs):
                sel = (slice(None) if j.trajectory or not want_traj
                       else -1)
                j.result = {"positions": out["positions"][i][sel],
                            "velocities": out["velocities"][i][sel]}
        except Exception as e:  # surface to every waiter
            for j in jobs:
                j.error = e
        for j in jobs:
            j.event.set()


def _short_repr(val, limit: int = 80) -> str:
    """Bounded repr for error messages: reflecting a multi-MB payload
    field back into the 400 body (and logs) is a request-amplification
    vector."""
    r = repr(val)
    return r if len(r) <= limit else r[:limit] + f"... ({len(r)} chars)"


def _require_int(val, name: str) -> int:
    """A JSON integer (an integral float is tolerated; a bool — which IS an
    int in Python — or a string is a client bug and must be a 400, not a
    silent coercion like int(True) == 1)."""
    if isinstance(val, bool) or not isinstance(val, (int, float)) \
            or (isinstance(val, float) and not val.is_integer()):
        raise ValueError(f"{name} must be a JSON integer, "
                         f"got {_short_repr(val)}")
    return int(val)


def _require_number(val, name: str) -> float:
    if isinstance(val, bool) or not isinstance(val, (int, float)):
        raise ValueError(f"{name} must be a JSON number, "
                         f"got {_short_repr(val)}")
    return float(val)


def _validate(payload: dict, batched: bool) -> Tuple[np.ndarray, np.ndarray,
                                                     np.ndarray, int]:
    try:
        pos = np.asarray(payload["positions"], np.float32)
        vel = np.asarray(payload["velocities"], np.float32)
        masses = np.asarray(payload["masses"], np.float32)
        n_steps = _require_int(payload["n_steps"], "n_steps")
    except (KeyError, TypeError, ValueError) as e:
        raise ValueError(f"bad request: {e}")
    want_dims = 3 if batched else 2
    masses_ok = (masses.ndim == 1 and masses.shape[0] == pos.shape[-2]) or \
        (batched and masses.ndim == 2 and pos.ndim == 3
         and masses.shape == pos.shape[:2])  # per-system masses (B, N)
    if pos.ndim != want_dims or pos.shape != vel.shape \
            or pos.shape[-1] != 3 or not masses_ok:
        raise ValueError(
            f"shape mismatch: positions {pos.shape}, velocities {vel.shape},"
            f" masses {masses.shape} (batched={batched})")
    if not (1 <= n_steps <= 100_000):
        raise ValueError(f"n_steps out of range: {n_steps}")
    if not (np.isfinite(pos).all() and np.isfinite(vel).all()
            and np.isfinite(masses).all()):
        raise ValueError("non-finite values in input arrays")
    return pos, vel, masses, n_steps


_COMPUTE_PATHS = ("/rollout", "/rollout_batch", "/simulate")


class _Inflight:
    """Thread-safe count of requests currently being handled — the signal
    a graceful shutdown drains on (daemon handler threads die with the
    process, so the supervisor loop must know when responses finished)."""

    def __init__(self):
        self._n = 0
        self._lock = threading.Lock()

    def __enter__(self):
        with self._lock:
            self._n += 1
        return self

    def __exit__(self, *exc):
        with self._lock:
            self._n -= 1

    def count(self) -> int:
        with self._lock:
            return self._n


def make_handler(service: RolloutService,
                 batcher: Optional[MicroBatcher] = None,
                 metrics: Optional[Metrics] = None,
                 max_inflight: Optional[int] = None):
    known_paths = _COMPUTE_PATHS + ("/healthz",)
    # Backpressure: ThreadingHTTPServer spawns one thread per connection,
    # so without a cap a burst piles unbounded threads (each holding its
    # decoded request arrays) onto the device lock. Beyond max_inflight
    # concurrent compute requests, shed load with 503 + Retry-After so
    # clients back off instead of queueing into timeout. /healthz and
    # /metrics never shed — probes must answer exactly when overloaded.
    gate = threading.Semaphore(max_inflight) if max_inflight else None
    inflight = _Inflight()  # exposed via serve() for graceful drain

    class Handler(BaseHTTPRequestHandler):
        _status = 0  # last response code, recorded by the _reply helpers

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _observed(self, inner) -> None:
            """Run a request handler, recording (endpoint, status, wall)
            into the metrics registry. Unknown paths collapse into one
            label so scrape cardinality stays bounded."""
            if metrics is None or self.path == "/metrics":
                inner()
                return
            t0 = time.perf_counter()
            self._status = 0
            try:
                inner()
            finally:
                endpoint = (self.path if self.path in known_paths
                            else "<other>")
                metrics.observe(endpoint, self._status,
                                time.perf_counter() - t0)

        def _reply(self, code: int, obj: dict) -> None:
            self._status = code
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_stream(self, chunks) -> None:
            """NDJSON streaming response: one JSON line per trajectory
            chunk, then a ``{"done": true}`` terminator line. No
            Content-Length — ``Connection: close`` delimits the body, so
            any HTTP client that reads lines incrementally can consume
            frames while later chunks are still being computed. The caller
            computes the FIRST chunk before invoking this, so input errors
            still produce a proper HTTP status code."""
            self._status = 200
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Connection", "close")
            self.end_headers()
            try:
                for obj in chunks:
                    line = json.dumps(
                        {k: v.tolist() if isinstance(v, np.ndarray) else v
                         for k, v in obj.items()})
                    self.wfile.write(line.encode() + b"\n")
                    self.wfile.flush()
                self.wfile.write(b'{"done": true}\n')
            except (BrokenPipeError, ConnectionResetError):
                # Client went away; stop computing further chunks. 499 is
                # the client-closed-request convention — the wire said 200
                # but the request did not complete.
                self._status = 499
            except Exception as e:
                # Headers are already out — surface the error in-band as
                # the final line (clients see no "done" terminator), and
                # record the request as failed in metrics despite the 200
                # status line.
                self._status = 500
                try:
                    self.wfile.write(json.dumps(
                        {"error": f"{type(e).__name__}: {e}"}).encode()
                        + b"\n")
                except OSError:
                    pass
            self.close_connection = True

        def _start_stream(self, chunks) -> None:
            """Compute the first chunk (so input errors still get a real
            HTTP status), then stream it plus the rest."""
            first = next(chunks)
            self._reply_stream(itertools.chain([first], chunks))

        def _reply_npz(self, arrays: dict) -> None:
            # Uncompressed npz of f32 arrays: the compute is f32, so the
            # cast is lossless, the body is ~5x smaller than the float-text
            # JSON, and no CPU is burnt compressing incompressible floats.
            import io
            buf = io.BytesIO()
            np.savez(buf, **{k: np.asarray(v, np.float32)
                             for k, v in arrays.items()})
            body = buf.getvalue()
            self._status = 200
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            self._observed(self._do_get)

        def _do_get(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok",
                                  "device": service.device,
                                  "model": service.model_info})
            elif self.path == "/metrics" and metrics is not None:
                body = metrics.render().encode()
                self._status = 200
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            with inflight:
                self._gated_post()

        def _gated_post(self):
            if gate is not None and not gate.acquire(blocking=False):
                def shed():
                    # Drain the request body first: closing the socket with
                    # unread receive data triggers a TCP RST that can
                    # discard the buffered 503 client-side — the client
                    # would see ConnectionReset instead of Retry-After.
                    self.rfile.read(int(self.headers.get("Content-Length",
                                                         0)))
                    self._status = 503
                    body = json.dumps({"error": "server busy: max_inflight "
                                       f"({max_inflight}) compute requests "
                                       "in flight"}).encode()
                    self.send_response(503)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Retry-After", "1")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)

                self._observed(shed)
                return
            try:
                self._observed(self._do_post)
            finally:
                if gate is not None:
                    gate.release()

        def _do_post(self):
            if self.path not in _COMPUTE_PATHS:
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length))
                batched = self.path == "/rollout_batch"
                pos, vel, masses, n_steps = _validate(payload, batched)
                fmt = payload.get("format", "json")
                if fmt not in ("json", "npz"):
                    raise ValueError(f"format must be 'json' or 'npz', "
                                     f"got {fmt!r}")
                stream = payload.get("stream", False)
                if not isinstance(stream, bool):
                    raise ValueError(f"stream must be a JSON bool, got "
                                     f"{type(stream).__name__}")
                if stream:
                    if batched:
                        raise ValueError("stream is supported on /rollout "
                                         "and /simulate only")
                    if fmt != "json":
                        raise ValueError("stream responses are NDJSON; "
                                         "use format 'json'")
                if self.path == "/simulate":
                    dt = _require_number(payload.get("dt", 0.001), "dt")
                    save_interval = _require_int(
                        payload.get("save_interval", 1), "save_interval")
                    trajectory = payload.get("trajectory", False)
                    if not isinstance(trajectory, bool):
                        raise ValueError(
                            f"trajectory must be a JSON bool, got "
                            f"{type(trajectory).__name__}")
                    if not (0.0 < dt <= 1.0) or not np.isfinite(dt):
                        raise ValueError(f"dt out of range: {dt}")
                    if not (1 <= save_interval <= n_steps):
                        raise ValueError(
                            f"save_interval out of range: {save_interval}")
                    if stream:
                        # Streamed trajectories buffer nothing and release
                        # the device lock between chunks, so they are
                        # exempt from the saved-frame cap below — streaming
                        # IS the sanctioned way to fetch big trajectories.
                        self._start_stream(service.simulate_stream(
                            pos, vel, masses, n_steps, dt=dt,
                            save_interval=save_interval))
                        return
                    # Trajectory mode buffers and JSON-serializes every
                    # saved frame while holding the device lock; cap the
                    # frame count so one request can't stall all traffic
                    # with a multi-hundred-MB response (final-state-only
                    # requests keep the full 100k n_steps range).
                    if trajectory and n_steps // save_interval > 4000:
                        raise ValueError(
                            "trajectory mode is capped at 4000 saved frames "
                            f"(n_steps/save_interval = "
                            f"{n_steps // save_interval}); raise "
                            "save_interval or lower n_steps")
                    out = service.simulate(
                        pos, vel, masses, n_steps, dt=dt,
                        trajectory=trajectory, save_interval=save_interval)
                else:
                    traj = payload.get("trajectory", True)
                    if not isinstance(traj, bool):
                        raise ValueError(
                            f"trajectory must be a JSON bool, got "
                            f"{type(traj).__name__}")
                    if stream:
                        chunk = _require_int(
                            payload.get("chunk", service.STREAM_CHUNK),
                            "chunk")
                        if not (1 <= chunk <= 1024):
                            raise ValueError(
                                f"chunk out of range [1, 1024]: {chunk}")
                        self._start_stream(service.rollout_stream(
                            pos, vel, masses, n_steps, chunk=chunk))
                        return
                    if batched:
                        out = service.rollout_batch(pos, vel, masses,
                                                    n_steps, trajectory=traj)
                    elif batcher is not None:
                        out = batcher.rollout(pos, vel, masses, n_steps,
                                              trajectory=traj)
                    else:
                        out = service.rollout(pos, vel, masses, n_steps,
                                              trajectory=traj)
                if fmt == "npz":
                    self._reply_npz(out)
                else:
                    self._reply(200,
                                {k: v.tolist() for k, v in out.items()})
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # keep the server alive on bad input
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    Handler.inflight = inflight
    return Handler


def serve(service: RolloutService, host: str = "127.0.0.1",
          port: int = 8742,
          batcher: Optional[MicroBatcher] = None,
          max_inflight: Optional[int] = None) -> ThreadingHTTPServer:
    """Start the HTTP server (returns it; call ``serve_forever`` to block).

    Pass a :class:`MicroBatcher` to coalesce concurrent ``/rollout``
    requests into shared device programs (recommended in production).

    ``max_inflight`` bounds concurrent compute requests; excess POSTs are
    shed with 503 + Retry-After instead of queueing into client timeouts
    (health/metrics probes always answer). Size it to a few times the
    replica count (or the micro-batch cap) so the shed point sits past the
    device's useful concurrency.

    Every server carries a :class:`Metrics` registry (``httpd.metrics``)
    scrapeable at ``GET /metrics`` in Prometheus text format."""
    metrics = Metrics()
    handler = make_handler(service, batcher, metrics,
                           max_inflight=max_inflight)
    httpd = ThreadingHTTPServer((host, port), handler)
    httpd.metrics = metrics
    # Graceful-drain signal: handler threads are daemons (killed at process
    # exit), so a supervisor shutdown should poll this to zero (bounded)
    # before exiting — scripts/serve.py does.
    httpd.inflight = handler.inflight
    return httpd
