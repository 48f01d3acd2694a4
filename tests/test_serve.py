"""Rollout HTTP service: endpoint contract, shapes, error handling.

Runs the real ThreadingHTTPServer on an ephemeral port with a tiny model
(CPU) and exercises it through urllib — the same path a production client
takes.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from nbody_gnn_hpc_tpu.io.model_io import save_checkpoint
from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
from nbody_gnn_hpc_tpu.serve import RolloutService, serve

N, K = 12, 4


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    import jax

    model = NBodyGNN(node_input_dim=7, hidden_dim=8, n_layers=1,
                     output_dim=6, dropout=0.0, remat=False)
    params = init_model(model, jax.random.PRNGKey(0), N, N * K)
    ckpt = tmp / "model.pt"
    save_checkpoint(ckpt, params=params, opt_state=None,
                    scheduler_state=None, best_val_loss=0.0, history={},
                    norm_stats={"state_mean": np.zeros(6, np.float32),
                                "state_std": np.ones(6, np.float32)},
                    model_config={})
    service = RolloutService(model, str(ckpt), k_neighbors=K)
    httpd = serve(service, host="127.0.0.1", port=0)  # ephemeral port
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz", timeout=30) as resp:
        body = json.loads(resp.read())
    assert body["status"] == "ok"
    assert body["model"]["k_neighbors"] == K


def test_rollout_endpoint(server):
    rng = np.random.RandomState(0)
    out = post(f"{server}/rollout", {
        "positions": rng.randn(N, 3).tolist(),
        "velocities": rng.randn(N, 3).tolist(),
        "masses": rng.uniform(1e10, 1e12, N).tolist(),
        "n_steps": 3,
    })
    pos = np.asarray(out["positions"])
    assert pos.shape == (4, N, 3)  # initial state + 3 steps
    assert np.isfinite(pos).all()


def test_rollout_batch_endpoint(server):
    rng = np.random.RandomState(1)
    B = 2
    out = post(f"{server}/rollout_batch", {
        "positions": rng.randn(B, N, 3).tolist(),
        "velocities": rng.randn(B, N, 3).tolist(),
        "masses": rng.uniform(1e10, 1e12, N).tolist(),
        "n_steps": 2,
    })
    assert np.asarray(out["positions"]).shape == (B, 3, N, 3)


def test_bad_request_is_400_and_server_survives(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        post(f"{server}/rollout", {"positions": [[1.0, 2.0]],
                                   "velocities": [[1.0, 2.0]],
                                   "masses": [1.0], "n_steps": 1})
    assert exc.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as exc2:
        post(f"{server}/nope", {})
    assert exc2.value.code == 404
    # still serving after errors
    test_healthz(server)
