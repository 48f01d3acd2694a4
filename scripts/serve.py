#!/usr/bin/env python3
"""Serve the GNN surrogate as a batched low-latency rollout HTTP service.

Beyond-reference capability (the reference's inference is a script with two
host<->device copies per rollout step); this wraps the scan-compiled
Predictor in a stdlib HTTP server with shape warmup. See
nbody_gnn_hpc_tpu/serve.py for the endpoint contract.

Usage:
    python scripts/serve.py --port 8742 --warm-particles 200 --warm-steps 394
    curl localhost:8742/healthz
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser(description="GNN rollout service")
    parser.add_argument("--model-path", "-m", type=str,
                        default="./models/best_model.pt")
    parser.add_argument("--config-path", "-c", type=str,
                        default="./models/config.json")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8742)
    parser.add_argument("--warm-particles", type=int, default=200,
                        help="Warm the compile cache for this N (0 = skip)")
    parser.add_argument("--warm-steps", type=int, default=394)
    parser.add_argument("--warm-batch", type=int, default=0,
                        help="Also warm a batched shape (0 = skip)")
    parser.add_argument("--micro-batch", type=int, default=0, metavar="B",
                        help="Coalesce concurrent /rollout requests into "
                             "shared device programs, up to B per batch "
                             "(power-of-two padding buckets; 0 = off)")
    parser.add_argument("--quantize", choices=("bf16", "int8"), default=None,
                        help="Weight-only serving quantization (smaller "
                             "resident model). MEASURED SLOWER at this "
                             "model scale on TPU (f32 5.3 vs int8 4.7 vs "
                             "bf16 3.8 req/s, final-only 394-step protocol "
                             "— RESULTS.md): the 2.5M-param weights are "
                             "not the bottleneck and the per-layer "
                             "dequant/cast adds scan work. Use only when "
                             "resident-memory pressure matters.")
    parser.add_argument("--replicas", type=int, default=0, metavar="R",
                        help="Serving DP on a multi-device host: one "
                             "device-pinned model replica per chip, up to R "
                             "(-1 = every visible device; 0 = single "
                             "service)")
    parser.add_argument("--micro-batch-wait-ms", type=float, default=5.0,
                        help="How long a micro-batch leader waits for "
                             "followers to join")
    parser.add_argument("--max-inflight", type=int, default=0, metavar="M",
                        help="Shed compute requests beyond M in flight with "
                             "503 + Retry-After (0 = unbounded); health/"
                             "metrics probes always answer")
    parser.add_argument("--grace-period", type=float, default=10.0,
                        metavar="S",
                        help="On SIGTERM/Ctrl-C: seconds to wait for "
                             "in-flight responses to finish before exiting")
    args = parser.parse_args()

    from nbody_gnn_hpc_tpu.serve import (MicroBatcher, build_replica_pool,
                                         build_service, serve)

    if args.replicas:
        service = build_replica_pool(
            args.model_path, args.config_path,
            n_replicas=None if args.replicas < 0 else args.replicas,
            quantize=args.quantize)
        print(f"Replica pool: {service.model_info['replicas']} "
              f"device-pinned replicas ({service.device})")
    else:
        service = build_service(args.model_path, args.config_path,
                                quantize=args.quantize)

    batcher = MicroBatcher(service, max_batch=args.micro_batch,
                           max_wait_s=args.micro_batch_wait_ms / 1e3) \
        if args.micro_batch > 0 else None

    # Graceful stop on SIGTERM (how a supervisor/orchestrator stops us).
    # Registered before warmup so a SIGTERM during the minutes-long remote
    # warmup window also exits cleanly instead of hard-killing.
    import signal
    import time

    def _term(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)
    httpd = None
    try:
        if args.warm_particles:
            print(f"Warming rollout program (N={args.warm_particles}, "
                  f"steps={args.warm_steps}"
                  + (f", batch={args.warm_batch}" if args.warm_batch else "")
                  + ")...")
            service.warmup(args.warm_particles, args.warm_steps,
                           batch=args.warm_batch or None)
            # Streamed requests run a (N, STREAM_CHUNK) program instead of
            # the (N, warm_steps) one; warm it so first streams are
            # compile-free.
            service.warmup(args.warm_particles, service.STREAM_CHUNK,
                           trajectories=(True,))
            if batcher is not None:
                print(f"Warming micro-batch buckets {batcher.buckets}...")
                batcher.warmup(args.warm_particles, args.warm_steps)

        httpd = serve(service, host=args.host, port=args.port,
                      batcher=batcher,
                      max_inflight=args.max_inflight or None)
        print(f"Serving on http://{args.host}:{args.port} "
              f"(endpoints: /healthz, /rollout, /rollout_batch, /simulate)")
        httpd.serve_forever()
    except KeyboardInterrupt:
        print("\nShutting down.")
        if httpd is not None:
            httpd.shutdown()  # stop accepting connections
            # Handler threads are daemons — killed at process exit — so
            # drain in-flight responses with a bounded grace period.
            deadline = time.time() + args.grace_period
            while httpd.inflight.count() and time.time() < deadline:
                time.sleep(0.1)
            left = httpd.inflight.count()
            if left:
                print(f"Grace period elapsed with {left} request(s) still "
                      "in flight; exiting anyway.")
            httpd.server_close()


if __name__ == "__main__":
    main()
