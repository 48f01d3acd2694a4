"""Serving benchmark harness: the load generator measures real requests
against the real server (benchmarks/bench_serving.py)."""

import importlib.util
import threading
from pathlib import Path

import jax
import numpy as np
import pytest

from nbody_gnn_hpc_tpu.io.model_io import save_checkpoint
from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
from nbody_gnn_hpc_tpu.serve import MicroBatcher, RolloutService, serve

REPO = Path(__file__).resolve().parent.parent
N, K = 12, 4


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_serving_module", REPO / "benchmarks" / "bench_serving.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bench_serve")
    model = NBodyGNN(node_input_dim=7, hidden_dim=8, n_layers=1,
                     output_dim=6, dropout=0.0, remat=False)
    params = init_model(model, jax.random.PRNGKey(0), N, N * K)
    ckpt = tmp / "model.pt"
    save_checkpoint(ckpt, params=params,
                    norm_stats={"state_mean": np.zeros(6, np.float32),
                                "state_std": np.ones(6, np.float32)})
    service = RolloutService(model, str(ckpt), k_neighbors=K)
    httpd = serve(service, host="127.0.0.1", port=0,
                  batcher=MicroBatcher(service, max_batch=2))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_run_load_measures_all_requests(server):
    bench = _load_bench()
    out = bench.run_load(server, N, n_steps=2, clients=2,
                         requests_per_client=2)
    assert out["requests"] == 4
    assert out["requests_per_s"] > 0
    assert out["rollout_steps_per_s"] == pytest.approx(
        out["requests_per_s"] * 2, rel=0.05)
    lat = out["latency_ms"]
    assert lat["p50"] <= lat["p95"] <= lat["p99"]
    assert lat["mean"] > 0


def test_run_load_stream_mode(server):
    """fmt='stream' consumes NDJSON streams and reports first-chunk
    percentiles alongside full-request latency."""
    bench = _load_bench()
    out = bench.run_load(server, N, n_steps=5, clients=2,
                         requests_per_client=2, fmt="stream")
    assert out["requests"] == 4
    fc = out["first_chunk_ms"]
    assert 0 < fc["p50"] <= fc["p95"]
    # first chunk can't take longer than the whole request
    assert fc["p50"] <= out["latency_ms"]["p99"]


def test_run_load_final_only_mode(server):
    bench = _load_bench()
    out = bench.run_load(server, N, n_steps=2, clients=2,
                         requests_per_client=1, trajectory=False)
    assert out["requests"] == 2
    assert "first_chunk_ms" not in out
