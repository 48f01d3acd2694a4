"""RolloutClient: the typed Python consumer of the serving API, exercised
against the real HTTP server (same fixture pattern as test_serve.py)."""

import json
import threading

import jax
import numpy as np
import pytest

from nbody_gnn_hpc_tpu.client import RolloutClient, ServiceError
from nbody_gnn_hpc_tpu.io.model_io import save_checkpoint
from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
from nbody_gnn_hpc_tpu.serve import RolloutService, serve

N, K = 12, 4


@pytest.fixture(scope="module")
def service_and_url(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("client")
    model = NBodyGNN(node_input_dim=7, hidden_dim=8, n_layers=1,
                     output_dim=6, dropout=0.0, remat=False)
    params = init_model(model, jax.random.PRNGKey(0), N, N * K)
    ckpt = tmp / "model.pt"
    save_checkpoint(ckpt, params=params,
                    norm_stats={"state_mean": np.zeros(6, np.float32),
                                "state_std": np.ones(6, np.float32)})
    service = RolloutService(model, str(ckpt), k_neighbors=K)
    httpd = serve(service, host="127.0.0.1", port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield service, f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _system(seed=0, n=N):
    rng = np.random.RandomState(seed)
    return (rng.randn(n, 3).astype(np.float32),
            rng.randn(n, 3).astype(np.float32),
            rng.uniform(1e10, 1e12, n).astype(np.float32))


def test_healthz(service_and_url):
    _, url = service_and_url
    h = RolloutClient(url).healthz()
    assert h["status"] == "ok"


@pytest.mark.parametrize("fmt", ["npz", "json"])
def test_rollout_matches_direct_service(service_and_url, fmt):
    service, url = service_and_url
    pos, vel, m = _system(1)
    client = RolloutClient(url, fmt=fmt)
    out = client.rollout(pos, vel, m, 4)
    direct = service.rollout(pos, vel, m, 4)
    assert out["positions"].shape == (5, N, 3)
    np.testing.assert_array_equal(
        np.asarray(out["positions"], np.float32), direct["positions"])
    # final-only
    fin = client.rollout(pos, vel, m, 4, trajectory=False)
    np.testing.assert_array_equal(np.asarray(fin["positions"], np.float32),
                                  direct["positions"][-1])


def test_rollout_batch(service_and_url):
    service, url = service_and_url
    s1, s2 = _system(2), _system(3)
    client = RolloutClient(url)
    out = client.rollout_batch(np.stack([s1[0], s2[0]]),
                               np.stack([s1[1], s2[1]]), s1[2], 3)
    assert out["positions"].shape == (2, 4, N, 3)
    direct = service.rollout(*s1, 3)
    np.testing.assert_allclose(np.asarray(out["positions"][0], np.float32),
                               direct["positions"], rtol=2e-4, atol=1e-5)


def test_rollout_stream_reassembles(service_and_url):
    service, url = service_and_url
    pos, vel, m = _system(4)
    client = RolloutClient(url)
    direct = service.rollout(pos, vel, m, 7)
    frames_p, nxt = [], 0
    for chunk in client.rollout_stream(pos, vel, m, 7, chunk=3):
        assert chunk["frame_start"] == nxt
        frames_p.append(chunk["positions"])
        nxt += chunk["positions"].shape[0]
    np.testing.assert_array_equal(np.concatenate(frames_p),
                                  direct["positions"])


def test_simulate_and_stream(service_and_url):
    service, url = service_and_url
    rng = np.random.RandomState(5)
    pos = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    vel = np.zeros((N, 3), np.float32)
    m = rng.uniform(1e10, 1e12, N).astype(np.float32)
    client = RolloutClient(url)
    fin = client.simulate(pos, vel, m, 10, dt=1e-3)
    assert fin["positions"].shape == (N, 3)
    traj = client.simulate(pos, vel, m, 10, dt=1e-3, trajectory=True,
                           save_interval=2)
    assert traj["positions"].shape == (6, N, 3)
    streamed = list(client.simulate_stream(pos, vel, m, 10, dt=1e-3,
                                           save_interval=2))
    np.testing.assert_array_equal(
        np.concatenate([c["positions"] for c in streamed]),
        np.asarray(traj["positions"], np.float32))


def test_http_errors_raise_service_error(service_and_url):
    _, url = service_and_url
    client = RolloutClient(url)
    pos, vel, m = _system(6)
    with pytest.raises(ServiceError) as exc:
        client.rollout(pos, vel, m, 0)  # n_steps below range
    assert exc.value.status == 400
    assert "n_steps" in str(exc.value)
    with pytest.raises(ServiceError) as exc2:
        list(client.rollout_stream(pos, vel, m, 2, chunk=0))
    assert exc2.value.status == 400
    with pytest.raises(ValueError):
        RolloutClient(url, fmt="csv")


def test_abandoned_stream_does_not_wedge_server(service_and_url):
    """Closing a stream early (client walks away) must (a) stop the server
    computing further chunks and (b) leave it able to answer subsequent
    requests. (a) is asserted by counting device dispatches through the
    predictor: a 50-step stream at chunk=2 would be 25 dispatches if the
    server ran to completion."""
    import time

    service, url = service_and_url
    pos, vel, m = _system(7)
    client = RolloutClient(url)

    calls = []
    real = service.predictor.predict_rollout

    def counting(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    service.predictor.predict_rollout = counting
    try:
        it = client.rollout_stream(pos, vel, m, 50, chunk=2)
        next(it)      # consume one chunk...
        it.close()    # ...then abandon the stream (closes the connection)
        # Give the handler thread time to hit the broken pipe and bail.
        deadline = time.time() + 10
        stable = len(calls)
        while time.time() < deadline:
            time.sleep(0.2)
            if len(calls) == stable:
                break
            stable = len(calls)
        # The write fails one chunk after the close at the latest; allow a
        # little slack but far below the 25 a completed stream would take.
        assert len(calls) <= 5, f"server kept computing: {len(calls)} chunks"
    finally:
        service.predictor.predict_rollout = real
    # server still answers
    assert client.healthz()["status"] == "ok"
    out = client.rollout(pos, vel, m, 3)
    assert out["positions"].shape == (4, N, 3)


def test_retries_503_honors_retry_after():
    """retries_503 re-sends after a shed (503 + Retry-After) and succeeds;
    the default client surfaces the 503 immediately."""
    import time
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    sheds = {"n": 2}
    times = []

    class Flaky(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def do_POST(self):
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            times.append(time.monotonic())
            if sheds["n"] > 0:
                sheds["n"] -= 1
                body = b'{"error": "server busy"}'
                self.send_response(503)
                self.send_header("Retry-After", "0.2")
            else:
                body = json.dumps({"positions": [[0.0] * 3],
                                   "velocities": [[0.0] * 3]}).encode()
                self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Flaky)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    pos, vel, m = _system(8)
    try:
        # default: immediate ServiceError
        with pytest.raises(ServiceError) as exc:
            RolloutClient(url, fmt="json").rollout(pos, vel, m, 1)
        assert exc.value.status == 503
        sheds["n"] = 2
        times.clear()
        out = RolloutClient(url, fmt="json",
                            retries_503=3).rollout(pos, vel, m, 1)
        assert np.asarray(out["positions"]).shape == (1, 3)
        assert len(times) == 3  # 2 sheds + 1 success
        # Retry-After honored (~0.2 s between attempts)
        assert times[1] - times[0] >= 0.15
        # retries exhausted -> ServiceError
        sheds["n"] = 5
        with pytest.raises(ServiceError) as exc2:
            RolloutClient(url, fmt="json",
                          retries_503=2).rollout(pos, vel, m, 1)
        assert exc2.value.status == 503
    finally:
        httpd.shutdown()
