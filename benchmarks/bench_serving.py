#!/usr/bin/env python3
"""Serving benchmark: concurrent-client latency/throughput for the rollout
HTTP service (nbody_gnn_hpc_tpu/serve.py).

The reference has no serving story (its inference path round-trips the host
twice per step — predict.py:142-147); this measures ours the way a
production client sees it: C concurrent clients fire R sequential
``POST /rollout`` requests each against the real ThreadingHTTPServer, and
we report per-request latency percentiles and aggregate throughput.

Compared configurations (same checkpoint, same load):
  - sequential device lock (no micro-batching), full-trajectory JSON
  - sequential, streamed NDJSON trajectory ("stream": true) — also reports
    time-to-first-chunk, streaming's headline metric (the client starts
    consuming frames after one chunk instead of after the whole rollout)
  - micro-batched (concurrent requests coalesced into one vmapped scan),
    with the three response modes: full-trajectory JSON (measured to be
    serialization-bound at 394 steps — ~10 MB of float text per request),
    full-trajectory npz (binary f32), and final-state-only JSON
  - optionally int8 weight-only quantized serving (--quantize int8)

Usage (real TPU; compile warmup included, excluded from timing):
    python benchmarks/bench_serving.py                      # f32, both modes
    python benchmarks/bench_serving.py --quantize int8      # + int8 column
    python benchmarks/bench_serving.py --clients 16 --requests 4

Note on latency on this host: every request pays the axon tunnel's ~30 ms
device->host readback, which bounds single-request latency regardless of
model speed; throughput under concurrency (the micro-batcher's job) is the
signal that transfers to a real TPU host.
"""

import argparse
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def _post(url: str, payload: dict, timeout: float = 600.0):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        body = resp.read()
        if resp.headers.get("Content-Type") == "application/octet-stream":
            import io
            return dict(np.load(io.BytesIO(body)))
        return json.loads(body)


def _post_stream(base_url: str, payload: dict, timeout: float = 600.0):
    """Streamed ``/rollout`` via the canonical RolloutClient parser (one
    wire-protocol implementation to keep in sync): returns
    (first_chunk_s, total_s, n_frames). first_chunk_s is the streaming
    mode's headline — the client starts consuming frames after ONE chunk
    instead of after the whole rollout."""
    from nbody_gnn_hpc_tpu.client import RolloutClient

    client = RolloutClient(base_url, timeout=timeout)
    t0 = time.perf_counter()
    first = None
    frames = 0
    for chunk in client.rollout_stream(payload["positions"],
                                       payload["velocities"],
                                       payload["masses"],
                                       payload["n_steps"]):
        if first is None:
            first = time.perf_counter() - t0
        frames += len(chunk["positions"])
    return first, time.perf_counter() - t0, frames


def run_load(base_url: str, n_particles: int, n_steps: int,
             clients: int, requests_per_client: int, seed: int = 0,
             trajectory: bool = True, fmt: str = "json") -> dict:
    """Fire ``clients`` threads x ``requests_per_client`` sequential
    ``/rollout`` requests; return latency percentiles + throughput.
    ``fmt="stream"`` uses NDJSON streaming and additionally reports
    time-to-first-chunk percentiles."""
    stream = fmt == "stream"
    rng = np.random.RandomState(seed)
    payloads = []
    for _ in range(clients):
        payloads.append({
            "positions": rng.randn(n_particles, 3).tolist(),
            "velocities": rng.randn(n_particles, 3).tolist(),
            "masses": rng.uniform(1e10, 1e12, n_particles).tolist(),
            "n_steps": n_steps,
            **({"stream": True} if stream
               else {"trajectory": trajectory, "format": fmt}),
        })
    want_frames = n_steps + 1 if trajectory else n_particles

    latencies = [[] for _ in range(clients)]
    first_chunk = [[] for _ in range(clients)]
    errors = []
    barrier = threading.Barrier(clients + 1)

    def client(i):
        barrier.wait()
        for _ in range(requests_per_client):
            t0 = time.perf_counter()
            try:
                if stream:
                    fc, total, frames = _post_stream(base_url, payloads[i])
                    assert frames == want_frames
                    first_chunk[i].append(fc)
                    latencies[i].append(total)
                    continue
                out = _post(f"{base_url}/rollout", payloads[i])
                assert len(out["positions"]) == want_frames
            except Exception as e:  # pragma: no cover - surfaced below
                errors.append(repr(e))
                return
            latencies[i].append(time.perf_counter() - t0)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    if errors:
        raise RuntimeError(f"{len(errors)} request(s) failed: {errors[0]}")
    lat = np.sort(np.concatenate([np.asarray(l) for l in latencies]))
    total = clients * requests_per_client
    out = {
        "requests": total,
        "wall_s": round(wall, 3),
        "requests_per_s": round(total / wall, 2),
        "rollout_steps_per_s": round(total * n_steps / wall, 1),
        "latency_ms": {
            "mean": round(1e3 * float(lat.mean()), 1),
            "p50": round(1e3 * float(np.percentile(lat, 50)), 1),
            "p95": round(1e3 * float(np.percentile(lat, 95)), 1),
            "p99": round(1e3 * float(np.percentile(lat, 99)), 1),
        },
    }
    if stream:
        fc = np.sort(np.concatenate([np.asarray(l) for l in first_chunk]))
        out["first_chunk_ms"] = {
            "p50": round(1e3 * float(np.percentile(fc, 50)), 1),
            "p95": round(1e3 * float(np.percentile(fc, 95)), 1),
        }
    return out


def start_server(model_path: str, config_path: str, micro_batch: int,
                 quantize, n_particles: int, n_steps: int,
                 replicas: int = 0):
    """In-process server on an ephemeral port, fully warmed (compiles paid
    here, not in the timed load). Built via serve.build_service /
    build_replica_pool so the benchmark measures exactly what
    scripts/serve.py serves."""
    from nbody_gnn_hpc_tpu.serve import (MicroBatcher, build_replica_pool,
                                         build_service, serve)

    if replicas:
        service = build_replica_pool(model_path, config_path,
                                     n_replicas=replicas, quantize=quantize)
    else:
        service = build_service(model_path, config_path, quantize=quantize)
    batcher = (MicroBatcher(service, max_batch=micro_batch)
               if micro_batch > 0 else None)
    if batcher is not None:
        # All /rollout traffic routes through the batcher's bucketed
        # batch programs; the unbatched programs would be dead compiles.
        batcher.warmup(n_particles, n_steps)
    else:
        service.warmup(n_particles, n_steps)
        # Streamed requests run the (N, STREAM_CHUNK) program instead.
        service.warmup(n_particles, service.STREAM_CHUNK,
                       trajectories=(True,))
    httpd = serve(service, host="127.0.0.1", port=0, batcher=batcher)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, f"http://127.0.0.1:{httpd.server_address[1]}"


def main():
    parser = argparse.ArgumentParser(description="Serving benchmark")
    parser.add_argument("--model-path", "-m",
                        default="./models/best_rollout_model.pt")
    parser.add_argument("--config-path", "-c",
                        default="./models/config.json")
    parser.add_argument("--particles", "-n", type=int, default=200)
    parser.add_argument("--steps", type=int, default=100,
                        help="Rollout steps per request")
    parser.add_argument("--clients", type=int, default=8)
    parser.add_argument("--requests", type=int, default=4,
                        help="Sequential requests per client")
    parser.add_argument("--micro-batch", type=int, default=8)
    parser.add_argument("--quantize", choices=("bf16", "int8"), default=None,
                        help="Also measure a quantized-serving column")
    parser.add_argument("--json", action="store_true",
                        help="Print one JSON line instead of the table")
    parser.add_argument("--replicas", type=int, default=0, metavar="R",
                        help="Also measure a device-replica pool of size R "
                             "(serving DP; needs >=R visible devices)")
    parser.add_argument("--sweep-clients", default=None, metavar="C1,C2,..",
                        help="Also sweep concurrency (final-only mode, "
                             "micro-batched server): e.g. 1,4,8,16 — shows "
                             "how coalescing scales with offered load")
    args = parser.parse_args()

    # (name, micro_batch, quantize, trajectory, fmt): the response modes
    # matter as much as the device config — full-trajectory JSON is ~10 MB
    # of float text per request and measured to dominate latency.
    mb = args.micro_batch
    configs = [("sequential, traj json", 0, None, True, "json", 0),
               ("sequential, traj stream", 0, None, True, "stream", 0),
               (f"micro-batch {mb}, traj json", mb, None, True, "json", 0),
               (f"micro-batch {mb}, traj npz", mb, None, True, "npz", 0),
               (f"micro-batch {mb}, final-only", mb, None, False, "json", 0)]
    if args.quantize:
        configs.append((f"micro-batch {mb} {args.quantize}, final-only",
                        mb, args.quantize, False, "json", 0))
    if args.replicas:
        # Serving DP vs the single device lock, at the same offered load.
        rp = args.replicas
        configs += [(f"replica-pool {rp}, traj json", 0, None, True,
                     "json", rp),
                    (f"replica-pool {rp}, final-only", 0, None, False,
                     "json", rp)]

    results = {}
    server_cache = {}
    for name, mbatch, quant, traj, fmt, replicas in configs:
        key = (mbatch, quant, replicas)
        if key not in server_cache:
            server_cache[key] = start_server(
                args.model_path, args.config_path, mbatch, quant,
                args.particles, args.steps, replicas=replicas)
        _, url = server_cache[key]
        # One untimed round so every thread's HTTP path is exercised.
        run_load(url, args.particles, args.steps, args.clients, 1,
                 trajectory=traj, fmt=fmt)
        results[name] = run_load(url, args.particles, args.steps,
                                 args.clients, args.requests,
                                 trajectory=traj, fmt=fmt)

    sweep = {}
    if args.sweep_clients:
        _, url = server_cache[(mb, None, 0)]  # warmed micro-batched server
        for c in (int(x) for x in args.sweep_clients.split(",")):
            run_load(url, args.particles, args.steps, c, 1,
                     trajectory=False)  # untimed warm round per thread count
            sweep[c] = run_load(url, args.particles, args.steps, c,
                                args.requests, trajectory=False)
    for httpd, _ in server_cache.values():
        httpd.shutdown()

    summary = {"n_particles": args.particles, "n_steps": args.steps,
               "clients": args.clients,
               "requests_per_client": args.requests, "results": results,
               "client_sweep_final_only": sweep}
    if args.json:
        print(json.dumps(summary))
        return
    print(f"\n/rollout load: {args.clients} clients x {args.requests} "
          f"requests, N={args.particles}, {args.steps} steps/request\n")
    print(f"{'config':<34} {'req/s':>7} {'steps/s':>9} {'p50 ms':>8} "
          f"{'p95 ms':>8} {'p99 ms':>8} {'1st-chunk':>10}")
    print("-" * 89)
    for name, r in results.items():
        fc = r.get("first_chunk_ms")
        print(f"{name:<34} {r['requests_per_s']:>7} "
              f"{r['rollout_steps_per_s']:>9} {r['latency_ms']['p50']:>8} "
              f"{r['latency_ms']['p95']:>8} {r['latency_ms']['p99']:>8} "
              f"{(str(fc['p50']) if fc else '-'):>10}")
    if sweep:
        print(f"\nConcurrency sweep (final-only, micro-batch {mb}):\n")
        print(f"{'clients':>8} {'req/s':>8} {'p50 ms':>8} {'p99 ms':>8}")
        print("-" * 36)
        for c, r in sweep.items():
            print(f"{c:>8} {r['requests_per_s']:>8} "
                  f"{r['latency_ms']['p50']:>8} {r['latency_ms']['p99']:>8}")


if __name__ == "__main__":
    main()
