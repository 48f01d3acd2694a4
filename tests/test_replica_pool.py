"""ReplicaPool: multi-device serving DP on the 8-virtual-device CPU mesh.

One device-pinned RolloutService replica per device behind the single
service interface — requests acquire free replicas instead of serializing
on one device lock (SURVEY §2.3: the model replicates trivially at 2.5M
params, so serving parallelism is DP).
"""

import json
import threading
import time

import jax
import numpy as np
import pytest

from nbody_gnn_hpc_tpu.io.model_io import save_checkpoint
from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
from nbody_gnn_hpc_tpu.serve import build_replica_pool, build_service, serve

N, K = 12, 4
MODEL_CONFIG = {"node_input_dim": 7, "hidden_dim": 8, "n_layers": 1,
                "output_dim": 6, "dropout": 0.0}


@pytest.fixture(scope="module")
def ckpt_paths(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pool")
    model = NBodyGNN(**MODEL_CONFIG, remat=False)
    params = init_model(model, jax.random.PRNGKey(0), N, N * K)
    save_checkpoint(tmp / "model.pt", params=params,
                    norm_stats={"state_mean": np.zeros(6, np.float32),
                                "state_std": np.ones(6, np.float32)})
    (tmp / "config.json").write_text(json.dumps(
        {"model_config": MODEL_CONFIG,
         "training_config": {"k_neighbors": K}}))
    return str(tmp / "model.pt"), str(tmp / "config.json")


def _system(seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(N, 3).astype(np.float32),
            rng.randn(N, 3).astype(np.float32),
            rng.uniform(1e10, 1e12, N).astype(np.float32))


@pytest.mark.slow  # fast-mode budget (r5): certified variants of equalities a fast sibling still pins
def test_pool_matches_single_service(ckpt_paths):
    """Every endpoint through the pool equals the single-service result
    exactly (replicas are the same program on identical devices)."""
    pool = build_replica_pool(*ckpt_paths, n_replicas=2)
    single = build_service(*ckpt_paths)
    pos, vel, m = _system(1)

    for kwargs in ({}, {"trajectory": False}):
        a = pool.rollout(pos, vel, m, 4, **kwargs)
        b = single.rollout(pos, vel, m, 4, **kwargs)
        np.testing.assert_array_equal(a["positions"], b["positions"])

    bp = pool.rollout_batch(np.stack([pos, pos]), np.stack([vel, vel]),
                            m, 3)
    bs = single.rollout_batch(np.stack([pos, pos]), np.stack([vel, vel]),
                              m, 3)
    np.testing.assert_array_equal(bp["positions"], bs["positions"])

    sp = pool.simulate(pos, vel, m, 6, dt=1e-3, trajectory=True,
                       save_interval=2)
    ss = single.simulate(pos, vel, m, 6, dt=1e-3, trajectory=True,
                         save_interval=2)
    np.testing.assert_array_equal(sp["positions"], ss["positions"])

    stream = np.concatenate([c["positions"] for c in
                             pool.rollout_stream(pos, vel, m, 5, chunk=2)])
    full = single.rollout(pos, vel, m, 5)
    np.testing.assert_array_equal(stream, full["positions"])


def test_pool_params_pinned_to_distinct_devices(ckpt_paths):
    pool = build_replica_pool(*ckpt_paths, n_replicas=3)
    devs = []
    for svc in pool.services:
        leaf = jax.tree_util.tree_leaves(svc.predictor.params)[0]
        (dev,) = leaf.devices()
        devs.append(dev)
    assert len(set(devs)) == 3, devs
    assert pool.model_info["replicas"] == 3


def test_pool_concurrent_requests_fan_out(ckpt_paths):
    """Truly concurrent requests run on distinct replicas — the pool's
    reason to exist. Each replica's rollout is wrapped to record usage and
    hold the replica briefly so concurrency is observable."""
    pool = build_replica_pool(*ckpt_paths, n_replicas=2)
    used = []

    for svc in pool.services:
        def make(svc=svc, real=None):
            real = svc.rollout

            def wrapped(*a, **k):
                used.append(svc.device)
                time.sleep(0.3)
                return real(*a, **k)

            return wrapped

        svc.rollout = make()

    pos, vel, m = _system(2)
    barrier = threading.Barrier(4)
    results = [None] * 4

    def work(i):
        barrier.wait()
        results[i] = pool.rollout(pos, vel, m, 2)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    wall = time.time() - t0

    assert all(r is not None for r in results)
    assert len(set(used)) == 2, used  # both replicas carried load
    # 4 requests x 0.3 s hold over 2 replicas ~= 2 waves, not 4 serialized
    assert wall < 4 * 0.3 + 2.0, wall
    # every replica returned to the pool
    assert pool._free.qsize() == 2


def test_pool_rollout_stream_balances_across_replicas(ckpt_paths):
    """GNN stream chunks acquire a replica each (host-side carry): a
    2-chunk stream on a 2-replica pool uses BOTH replicas (FIFO rotation),
    and no replica stays pinned between chunks or after abandonment."""
    pool = build_replica_pool(*ckpt_paths, n_replicas=2)
    used = []
    for svc in pool.services:
        def make(svc=svc):
            real = svc.predictor.predict_rollout

            def wrapped(*a, **k):
                used.append(svc.device)
                return real(*a, **k)

            return wrapped

        svc.predictor.predict_rollout = make()

    pos, vel, m = _system(3)
    it = pool.rollout_stream(pos, vel, m, 6, chunk=3)
    next(it)
    assert pool._free.qsize() == 2  # replica returned between chunks
    it.close()
    assert pool._free.qsize() == 2
    used.clear()
    chunks = list(pool.rollout_stream(pos, vel, m, 6, chunk=3))
    assert len(chunks) == 2
    assert len(set(used)) == 2, used  # chunk 1 and 2 on different replicas
    assert pool._free.qsize() == 2


def test_pool_simulate_stream_pins_one_replica(ckpt_paths):
    """/simulate streams carry device state, so they pin their replica for
    the stream's lifetime and release it on exhaustion or abandonment."""
    pool = build_replica_pool(*ckpt_paths, n_replicas=2)
    rng = np.random.RandomState(4)
    pos = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
    vel = np.zeros((N, 3), np.float32)
    m = rng.uniform(1e10, 1e12, N).astype(np.float32)
    old = [s.SIM_CHUNK for s in pool.services]
    for s in pool.services:
        s.SIM_CHUNK = 4  # force several chunks
    try:
        it = pool.simulate_stream(pos, vel, m, 12, dt=1e-3, save_interval=2)
        next(it)
        assert pool._free.qsize() == 1  # pinned mid-stream
        it.close()
        assert pool._free.qsize() == 2  # abandonment releases
        list(pool.simulate_stream(pos, vel, m, 8, dt=1e-3, save_interval=2))
        assert pool._free.qsize() == 2  # exhaustion releases
    finally:
        for s, v in zip(pool.services, old):
            s.SIM_CHUNK = v


def test_pool_through_http_server(ckpt_paths):
    import urllib.request

    pool = build_replica_pool(*ckpt_paths, n_replicas=2)
    httpd = serve(pool, host="127.0.0.1", port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        health = json.loads(urllib.request.urlopen(
            f"{url}/healthz", timeout=30).read())
        assert health["model"]["replicas"] == 2
        pos, vel, m = _system(4)
        req = urllib.request.Request(
            f"{url}/rollout", data=json.dumps({
                "positions": pos.tolist(), "velocities": vel.tolist(),
                "masses": m.tolist(), "n_steps": 3}).encode(),
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert np.asarray(out["positions"]).shape == (4, N, 3)
    finally:
        httpd.shutdown()


def test_pool_validation(ckpt_paths):
    with pytest.raises(ValueError):
        build_replica_pool(*ckpt_paths, n_replicas=999)
    with pytest.raises(ValueError):
        build_replica_pool(*ckpt_paths, n_replicas=0)


def test_micro_batcher_overflow_fans_out_across_pool():
    """Overflow chunks (more jobs than max_batch) dispatch concurrently:
    over a ReplicaPool each chunk acquires its own replica, so a burst
    saturates the pool instead of queueing behind one device."""
    from nbody_gnn_hpc_tpu.serve import MicroBatcher, ReplicaPool

    class _SlowStub:
        STREAM_CHUNK = 64

        def __init__(self, name):
            self.device = name
            self.model_info = {"stub": name}
            self.calls = []

        def rollout_batch(self, pos, vel, masses, n_steps,
                          trajectory=True):
            self.calls.append(time.time())
            time.sleep(0.3)
            return {"positions": np.stack(
                        [pos + t for t in range(n_steps + 1)], 1),
                    "velocities": np.stack(
                        [vel] * (n_steps + 1), 1)}

    stubs = [_SlowStub("cpu:0"), _SlowStub("cpu:1")]
    pool = ReplicaPool(stubs)
    batcher = MicroBatcher(pool, max_batch=2, max_wait_s=0.25)

    rng = np.random.RandomState(0)
    jobs = [(rng.randn(6, 3).astype(np.float32),
             rng.randn(6, 3).astype(np.float32),
             rng.uniform(1.0, 2.0, 6).astype(np.float32))
            for _ in range(4)]
    results = [None] * 4
    barrier = threading.Barrier(4)

    def work(i):
        barrier.wait()
        results[i] = batcher.rollout(*jobs[i], 3)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    wall = time.time() - t0

    # 4 jobs -> 2 chunks of 2; both replicas used, concurrently (one
    # sequential drain would be >= 0.6 s of stub time + the join wait)
    assert len(stubs[0].calls) == 1 and len(stubs[1].calls) == 1, \
        (stubs[0].calls, stubs[1].calls)
    assert wall < 0.25 + 0.3 + 0.25, wall
    for job, res in zip(jobs, results):
        np.testing.assert_array_equal(res["positions"][-1], job[0] + 3)
