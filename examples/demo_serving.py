#!/usr/bin/env python3
"""Demo: surrogate rollout serving — spin up the HTTP service in-process,
fire concurrent client requests, and show the micro-batcher coalescing them
into shared device programs.

Beyond-reference capability (the reference has no serving story): the
service wraps a trained checkpoint behind three endpoints —

    GET  /healthz          liveness + model info
    POST /rollout          one system  {positions, velocities, masses, n_steps}
    POST /rollout_batch    many systems in one call

and the MicroBatcher coalesces concurrent same-shape ``/rollout`` requests
into ONE vmapped device program (padded to power-of-two buckets so the
compile count stays bounded).

Usage:
    python examples/demo_serving.py [--clients 6] [--steps 20]

Runs fully self-contained (random-weight model, ephemeral port); point
``--checkpoint`` at a real ``best_model.pt`` to serve trained weights.
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


def post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as resp:
        return json.loads(resp.read())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--clients", type=int, default=6,
                        help="Concurrent rollout requests to fire")
    parser.add_argument("--particles", type=int, default=32)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="Trained .pt checkpoint (default: demo weights)")
    parser.add_argument("--k-neighbors", type=int, default=8)
    parser.add_argument("--quantize", choices=("bf16", "int8"), default=None,
                        help="Serve weight-only quantized params "
                             "(predict/quantize.py)")
    args = parser.parse_args()

    import jax

    from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
    from nbody_gnn_hpc_tpu.serve import MicroBatcher, RolloutService, serve

    n, k = args.particles, args.k_neighbors
    if args.checkpoint:
        ckpt = args.checkpoint
        # Rebuild the architecture from the persisted config.json next to
        # the checkpoint (train_model.py writes it for exactly this), so
        # any trained architecture loads; fall back to production defaults.
        cfg_path = Path(args.checkpoint).parent / "config.json"
        if cfg_path.exists():
            from nbody_gnn_hpc_tpu.models import model_from_config

            saved = json.loads(cfg_path.read_text())
            model = model_from_config(saved["model_config"],
                                      dtype_override="float32")
        else:
            print(f"! no config.json beside {ckpt}; assuming the "
                  "production architecture (hidden 256, 6 layers)")
            model = NBodyGNN(node_input_dim=7, hidden_dim=256, n_layers=6,
                             output_dim=6, dropout=0.1, remat=False)
    else:
        # Self-contained: a small random-weight model saved to a temp file.
        import tempfile

        from nbody_gnn_hpc_tpu.io.model_io import save_checkpoint

        model = NBodyGNN(node_input_dim=7, hidden_dim=32, n_layers=2,
                         output_dim=6, dropout=0.0, remat=False)
        params = init_model(model, jax.random.PRNGKey(0), n, n * k)
        ckpt = str(Path(tempfile.mkdtemp()) / "demo_model.pt")
        save_checkpoint(ckpt, params=params, opt_state=None,
                        scheduler_state=None, best_val_loss=0.0, history={},
                        norm_stats={"state_mean": np.zeros(6, np.float32),
                                    "state_std": np.ones(6, np.float32)},
                        model_config={})

    print(f"Starting service (N={n}, k={k}, backend={jax.default_backend()})")
    service = RolloutService(model, ckpt, k_neighbors=k,
                             quantize=args.quantize)
    batcher = MicroBatcher(service, max_batch=8, max_wait_s=0.05)
    httpd = serve(service, host="127.0.0.1", port=0, batcher=batcher)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"

    health = json.loads(
        urllib.request.urlopen(f"{base}/healthz", timeout=60).read())
    print("healthz:", health)

    rng = np.random.RandomState(0)

    def one_request(i, results):
        payload = {
            "positions": rng.uniform(-5, 5, (n, 3)).tolist(),
            "velocities": np.zeros((n, 3)).tolist(),
            "masses": rng.uniform(1e10, 1e12, n).tolist(),
            "n_steps": args.steps,
        }
        t0 = time.time()
        try:
            out = post(f"{base}/rollout", payload)
            results[i] = (time.time() - t0,
                          np.asarray(out["positions"]).shape)
        except Exception as e:  # surface per-client failures in the report
            results[i] = e

    # Warm the bucketed shapes once so the demo's timing isn't compile time
    # (including the stream-chunk program the streaming section runs).
    print("Warming rollout program...")
    batcher.warmup(n, args.steps)
    service.warmup(n, service.STREAM_CHUNK, trajectories=(True,))

    print(f"Firing {args.clients} concurrent /rollout requests...")
    results = [None] * args.clients
    threads = [threading.Thread(target=one_request, args=(i, results))
               for i in range(args.clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    failures = 0
    for i, res in enumerate(results):
        if isinstance(res, tuple):
            dt, shape = res
            print(f"  client {i}: {dt * 1e3:7.1f} ms   trajectory {shape}")
        else:
            failures += 1
            print(f"  client {i}: FAILED — {res}")
    if failures:
        sys.exit(f"{failures}/{args.clients} requests failed")
    print(f"Concurrent wall clock: {wall * 1e3:.1f} ms "
          f"(micro-batched; sequential would be ~{args.clients}x one rollout)")

    # Response modes: final-state-only (a separate compiled program that
    # never materializes the trajectory) and binary npz bodies — both cut
    # the dominant cost of long-rollout requests (response size).
    payload = {"positions": rng.uniform(-5, 5, (n, 3)).tolist(),
               "velocities": np.zeros((n, 3)).tolist(),
               "masses": rng.uniform(1e10, 1e12, n).tolist(),
               "n_steps": args.steps}
    final = post(f"{base}/rollout", {**payload, "trajectory": False})
    req = urllib.request.Request(
        f"{base}/rollout",
        data=json.dumps({**payload, "format": "npz"}).encode(),
        headers={"Content-Type": "application/json"})
    npz_bytes = urllib.request.urlopen(req, timeout=300).read()
    json_bytes = len(json.dumps(post(f"{base}/rollout", payload)).encode())
    print(f"final-only: state {np.asarray(final['positions']).shape}; "
          f"npz trajectory body {len(npz_bytes):,} B vs JSON "
          f"~{json_bytes:,} B")

    # Streaming via the typed client: the trajectory arrives as NDJSON
    # chunks while later chunks are still computing — first frames land
    # after ONE chunk, the device lock is released between chunks, and any
    # n_steps reuses one compiled chunk program.
    from nbody_gnn_hpc_tpu.client import RolloutClient

    client = RolloutClient(base)
    t0 = time.time()
    t_first, frames = None, 0
    for chunk in client.rollout_stream(
            np.asarray(payload["positions"]),
            np.asarray(payload["velocities"]),
            np.asarray(payload["masses"]), args.steps):  # warmed chunk size
        if t_first is None:
            t_first = time.time() - t0
        frames += len(chunk["positions"])
    print(f"streamed: {frames} frames, first chunk after "
          f"{t_first * 1e3:.1f} ms, done in {(time.time() - t0) * 1e3:.1f} ms")

    # The same service also exposes the exact-physics engine:
    sim_out = post(f"{base}/simulate", {
        "positions": rng.uniform(-5, 5, (n, 3)).tolist(),
        "velocities": np.zeros((n, 3)).tolist(),
        "masses": rng.uniform(1e10, 1e12, n).tolist(),
        "n_steps": args.steps, "dt": 0.001,
    })
    print(f"/simulate: exact-physics final state "
          f"{np.asarray(sim_out['positions']).shape}, finite="
          f"{np.isfinite(np.asarray(sim_out['positions'])).all()}")

    # Observability: everything above is already on the scrape endpoint.
    metrics = urllib.request.urlopen(f"{base}/metrics",
                                     timeout=60).read().decode()
    counters = [ln for ln in metrics.splitlines()
                if ln.startswith("nbody_requests_total{")]
    print("/metrics request counters:")
    for ln in counters:
        print(f"  {ln}")
    httpd.shutdown()


if __name__ == "__main__":
    main()
