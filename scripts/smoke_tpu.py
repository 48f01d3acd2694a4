#!/usr/bin/env python3
"""Real-TPU smoke workflow: quick PASS/FAIL checks on the attached chip.

The test suite (tests/) deliberately runs CPU-only with 8 virtual devices;
this script is its hardware complement — it drives the surfaces whose
behavior can differ on a real TPU (Pallas kernels, bf16 matmuls, the axon
dispatch path) and exits nonzero on any failure. Runtime is dominated by
a handful of compiles (~1-3 min cold, seconds warm via .jax_cache).

Checks:
  1. device sanity        — a TPU backend is attached and executes
  2. force kernel         — f32 XLA kernel vs the f64 NumPy oracle (N=200)
  3. symmetric Pallas     — large-N kernel vs the plain XLA kernel (N=2048)
  4. blocked energy       — get_energy at N=10k in bounded memory vs a
                            chunked f64 host oracle
  5. trajectory physics   — momentum conservation over a 50-step scan
  6. large-N datagen      — BH-regime ensemble (N=2048) through the full
                            vmap + scan + planes-fetch composition
  7. fused edge kernel    — fused Pallas stream vs the XLA branch, seeded
                            in-kernel dropout determinism
  8. batched edge kernel  — batch-folded kernel vs vmapped per-graph,
                            seeded dropout, finite training grad
  9. fused_full layer     — whole-layer kernel vs the XLA branch (opt-in
                            edge_impl="fused_full")
 10. train step           — bf16 GNN step runs, loss finite and decreasing
 11. rollout              — scan-compiled predictor rollout, finite output
 12. quantized rollout    — int8 weight-only rollout close to f32 on-chip
 13. stream chunks        — serving stream chunk program reassembles to
                            exactly the non-streamed rollout (pre-warms the
                            chunk shape the server compiles)
 14. blocked k-NN         — row-blocked large-N k-NN == dense on-chip, and
                            a BH-regime (N=4096) rollout through it
 15. replica warm path    — build_replica_pool + warmup + dispatch on the
                            attached device (the serving DP path)
 16. large-N surrogate    — the production-architecture GNN (2,550,150
                            params) at N=5000: blocked k-NN edge build +
                            forward + short scan rollout on-chip; pre-warms
                            the shapes the large-N pipeline compiles

Usage:
    python scripts/smoke_tpu.py            # all checks
    python scripts/smoke_tpu.py --fast     # skip the large-N Pallas check
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_RESULTS = []


def check(name):
    def deco(fn):
        def run(*a, **k):
            t0 = time.time()
            try:
                detail = fn(*a, **k) or ""
                _RESULTS.append((name, True, detail, time.time() - t0))
                print(f"  PASS  {name:24s} {detail}  [{time.time()-t0:.1f}s]")
            except Exception as e:  # noqa: BLE001 - reported, exit nonzero
                _RESULTS.append((name, False, f"{type(e).__name__}: {e}",
                                 time.time() - t0))
                print(f"  FAIL  {name:24s} {type(e).__name__}: {e}")
        return run
    return deco


@check("device")
def check_device():
    import jax

    dev = jax.devices()[0]
    if jax.default_backend() == "cpu":
        raise RuntimeError("no accelerator attached (backend is cpu)")
    # Prove the device actually executes: a readback forces completion on
    # the axon tunnel (block_until_ready does not — CLAUDE.md).
    import jax.numpy as jnp
    got = float(jnp.arange(1024.0).sum())
    assert got == 1024 * 1023 / 2, got
    return f"{dev} ({jax.default_backend()})"


@check("force kernel vs f64")
def check_forces():
    import jax.numpy as jnp

    from nbody_gnn_hpc_tpu.sim import accelerations
    from nbody_gnn_hpc_tpu.sim.reference_f64 import accelerations_f64

    rng = np.random.RandomState(42)
    pos = rng.uniform(-5, 5, (200, 3))
    m = rng.uniform(1e10, 1e12, 200)
    a32 = np.asarray(accelerations(jnp.asarray(pos, jnp.float32),
                                   jnp.asarray(m, jnp.float32)), np.float64)
    a64 = accelerations_f64(pos.astype(np.float32).astype(np.float64),
                            m.astype(np.float32).astype(np.float64))
    rel = np.abs(a32 - a64).max() / (np.abs(a64).max() + 1e-30)
    assert rel < 1e-3, f"rel err {rel:.2e}"
    return f"rel err {rel:.1e}"


@check("symmetric Pallas N=2048")
def check_pallas():
    import jax.numpy as jnp

    from nbody_gnn_hpc_tpu.ops.pairwise import pallas_accelerations_symmetric
    from nbody_gnn_hpc_tpu.sim.forces import pairwise_accelerations

    rng = np.random.RandomState(7)
    pos = jnp.asarray(rng.uniform(-20, 20, (2048, 3)), jnp.float32)
    m = jnp.asarray(rng.uniform(1e10, 1e12, 2048), jnp.float32)
    a_pl = np.asarray(pallas_accelerations_symmetric(pos, m))
    a_ref = np.asarray(pairwise_accelerations(pos, m))
    rel = np.abs(a_pl - a_ref).max() / (np.abs(a_ref).max() + 1e-30)
    assert np.isfinite(a_pl).all(), "non-finite output"
    assert rel < 1e-4, f"rel err {rel:.2e}"
    return f"rel err {rel:.1e}"


@check("blocked energy N=10k")
def check_blocked_energy():
    """get_energy at Barnes-Hut-regime N runs in bounded memory on-chip
    (row-blocked PE, sim/energy.py) and agrees with the f64 oracle."""
    import jax.numpy as jnp

    from nbody_gnn_hpc_tpu.sim import total_energy
    from nbody_gnn_hpc_tpu.sim.forces import G, SOFTENING

    rng = np.random.RandomState(5)
    n = 10_000
    pos = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    vel = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    m = rng.uniform(1e10, 1e12, n).astype(np.float32)
    ke, pe, te = total_energy(jnp.asarray(pos), jnp.asarray(vel),
                              jnp.asarray(m))
    ke, pe, te = float(ke), float(pe), float(te)
    # Chunked f64 host oracle (the dense (N, N, 3) oracle would need
    # ~2.4 GB host RAM at this N).
    p64f, m64 = pos.astype(np.float64), m.astype(np.float64)
    s = 0.0
    for lo in range(0, n, 1000):
        d = p64f[lo:lo + 1000, None, :] - p64f[None, :, :]
        inv_r = 1.0 / np.sqrt(np.einsum("ijk,ijk->ij", d, d)
                              + SOFTENING ** 2)
        idx = np.arange(lo, min(lo + 1000, n))
        inv_r[np.arange(len(idx)), idx] = 0.0
        s += float(np.einsum("i,ij,j->", m64[lo:lo + 1000], inv_r, m64))
    p64 = -0.5 * G * s
    rel = abs(pe - p64) / (abs(p64) + 1e-30)
    assert np.isfinite(te), "non-finite energy"
    assert rel < 1e-3, f"PE rel err vs f64: {rel:.2e}"
    return f"PE rel err {rel:.1e}"


@check("trajectory momentum")
def check_trajectory():
    import jax.numpy as jnp

    from nbody_gnn_hpc_tpu.parallel import simulate_ensemble
    from nbody_gnn_hpc_tpu.sim import shared_masses

    traj = simulate_ensemble([42, 43], 200, 50, box_size=10.0, dt=0.001,
                             shared_masses=shared_masses(200))
    # velocities: (B, T, N, 3); masses: (B, N)
    p = np.asarray(traj.velocities, np.float64) \
        * np.asarray(traj.masses, np.float64)[:, None, :, None]
    net = np.abs(p.sum(axis=2)).max()
    scale = np.abs(p).sum(axis=2).max()
    assert np.isfinite(np.asarray(traj.positions)).all()
    # Per-eval force neutrality is ~1e-5 relative (tests/test_properties),
    # but 50 integrated f32 kick steps accumulate rounding drift; ~7e-4
    # measured on the v5e with these chaotic ICs. 5e-3 flags real breakage
    # (a sign error or mask bug shows up at O(1)).
    assert net / scale < 5e-3, f"momentum drift {net/scale:.2e}"
    return f"drift {net/scale:.1e}"


@check("fused edge kernel")
def check_fused_edge():
    """Fused Pallas edge stream vs the XLA branch on the real chip, plus
    in-kernel dropout semantics (keep rate, determinism, seed sensitivity)."""
    import jax
    import jax.numpy as jnp

    from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
    from nbody_gnn_hpc_tpu.models.gnn import target_adjacency
    from nbody_gnn_hpc_tpu.ops.fused_edge import fused_edge_layer
    from nbody_gnn_hpc_tpu.ops.knn import knn_edge_index

    n, k, h = 16, 4, 32
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(n, 7), jnp.float32)
    pos = jnp.asarray(rng.randn(n, 3), jnp.float32)
    edges = knn_edge_index(pos, k)
    kw = dict(node_input_dim=7, hidden_dim=h, n_layers=2, output_dim=6,
              dropout=0.1, remat=False, dtype=jnp.float32)
    params = init_model(NBodyGNN(edge_impl="xla", **kw),
                        jax.random.PRNGKey(0), n, n * k)
    out_x = np.asarray(NBodyGNN(edge_impl="xla", **kw).apply(
        {"params": params}, x, edges, pos, deterministic=True))
    out_f = np.asarray(NBodyGNN(edge_impl="fused", **kw).apply(
        {"params": params}, x, edges, pos, deterministic=True))
    rel = np.abs(out_f - out_x).max() / (np.abs(out_x).max() + 1e-30)
    assert rel < 1e-2, f"fused vs xla rel err {rel:.2e}"

    # dropout: ~10% of the aggregate inputs masked; deterministic per seed
    tp = jnp.asarray(rng.randn(n, h), jnp.float32)
    ea = jnp.asarray(rng.randn(n * k, 5), jnp.float32)
    we = jnp.asarray(rng.randn(5, h), jnp.float32)
    adj, _ = target_adjacency(edges, n, jnp.float32)
    args = (tp, tp, ea, we, jnp.ones(h), jnp.zeros(h), adj.T)
    s1 = jnp.array([[123]], jnp.int32)
    d1 = np.asarray(fused_edge_layer(*args, s1, k=k, dropout_p=0.1,
                                     deterministic=False))
    d1b = np.asarray(fused_edge_layer(*args, s1, k=k, dropout_p=0.1,
                                      deterministic=False))
    d2 = np.asarray(fused_edge_layer(*args, s1 + 1, k=k, dropout_p=0.1,
                                     deterministic=False))
    assert (d1 == d1b).all(), "dropout not deterministic per seed"
    assert (d1 != d2).any(), "dropout ignores seed"
    return f"rel err {rel:.1e}, dropout seeded"


@check("batched edge kernel")
def check_batched_edge():
    """Batch-folded fused kernel (ops/fused_edge_batched.py) vs the
    vmapped per-graph kernel on the real chip, incl. seeded in-kernel
    dropout determinism and a finite training gradient."""
    import jax
    import jax.numpy as jnp

    from nbody_gnn_hpc_tpu.models.gnn import target_adjacency
    from nbody_gnn_hpc_tpu.ops.fused_edge import fused_edge_layer
    from nbody_gnn_hpc_tpu.ops.fused_edge_batched import \
        fused_edge_layer_batched
    from nbody_gnn_hpc_tpu.ops.knn import knn_edge_index

    b, n, k, h = 4, 16, 4, 32
    rng = np.random.RandomState(3)
    pos = jnp.asarray(rng.randn(n, 3), jnp.float32)
    edges = knn_edge_index(pos, k)
    adj, _ = target_adjacency(edges, n, jnp.float32)
    tp = jnp.asarray(rng.randn(b, n, h), jnp.float32)
    sp = jnp.asarray(rng.randn(b, n, h), jnp.float32)
    ea = jnp.asarray(rng.randn(b, n * k, 5), jnp.float32)
    we = jnp.asarray(rng.randn(5, h) * 0.3, jnp.float32)
    gam, bet = jnp.ones(h), jnp.zeros(h)
    s0 = jnp.zeros((1, 1), jnp.int32)
    want = np.asarray(jax.vmap(
        lambda a, b_, c: fused_edge_layer(a, b_, c, we, gam, bet, adj.T, s0,
                                          k=k, deterministic=True))(
        tp, sp, ea))
    got = np.asarray(fused_edge_layer_batched(tp, sp, ea, we, gam, bet,
                                              adj.T, s0, k=k,
                                              deterministic=True))
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-30)
    assert rel < 1e-4, f"batched vs per-graph rel err {rel:.2e}"

    # seeded dropout: deterministic per seed, sensitive to seed
    s1 = jnp.array([[123]], jnp.int32)
    kw = dict(k=k, dropout_p=0.1, deterministic=False)
    d1 = np.asarray(fused_edge_layer_batched(tp, sp, ea, we, gam, bet,
                                             adj.T, s1, **kw))
    d1b = np.asarray(fused_edge_layer_batched(tp, sp, ea, we, gam, bet,
                                              adj.T, s1, **kw))
    d2 = np.asarray(fused_edge_layer_batched(tp, sp, ea, we, gam, bet,
                                             adj.T, s1 + 1, **kw))
    assert (d1 == d1b).all(), "batched dropout not deterministic per seed"
    assert (d1 != d2).any(), "batched dropout ignores seed"

    # training-mode custom VJP runs and is finite
    g = jax.grad(lambda t_: fused_edge_layer_batched(
        t_, sp, ea, we, gam, bet, adj.T, s1, **kw).sum())(tp)
    assert np.isfinite(np.asarray(g)).all(), "non-finite batched grad"
    return f"rel err {rel:.1e}, dropout seeded, grad finite"


@check("fused_full layer")
def check_fused_full():
    """Whole-layer Pallas kernel (ops/fused_edge_full.py) vs the XLA branch
    on the real chip — same params tree, deterministic forward."""
    import jax
    import jax.numpy as jnp

    from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
    from nbody_gnn_hpc_tpu.ops.knn import knn_edge_index

    n, k, h = 16, 4, 32
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(n, 7), jnp.float32)
    pos = jnp.asarray(rng.randn(n, 3), jnp.float32)
    edges = knn_edge_index(pos, k)
    kw = dict(node_input_dim=7, hidden_dim=h, n_layers=2, output_dim=6,
              dropout=0.1, remat=False, dtype=jnp.float32)
    params = init_model(NBodyGNN(edge_impl="xla", **kw),
                        jax.random.PRNGKey(0), n, n * k)
    out_x = np.asarray(NBodyGNN(edge_impl="xla", **kw).apply(
        {"params": params}, x, edges, pos, deterministic=True))
    out_f = np.asarray(NBodyGNN(edge_impl="fused_full", **kw).apply(
        {"params": params}, x, edges, pos, deterministic=True))
    rel = np.abs(out_f - out_x).max() / (np.abs(out_x).max() + 1e-30)
    assert rel < 1e-2, f"fused_full vs xla rel err {rel:.2e}"
    return f"rel err {rel:.1e}"


@check("train step (bf16)")
def check_train_step():
    import jax
    import jax.numpy as jnp
    import optax

    from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
    from nbody_gnn_hpc_tpu.train.steps import make_train_step
    from nbody_gnn_hpc_tpu.ops.knn import knn_edge_index

    rng = np.random.RandomState(0)
    n, k = 64, 8
    model = NBodyGNN(7, 32, 2, 6, 0.1, remat=False, dtype=jnp.bfloat16)
    edges = np.asarray(knn_edge_index(jnp.asarray(rng.randn(n, 3)), k))
    params = init_model(model, jax.random.PRNGKey(0), n, n * k)
    tx = optax.adamw(1e-3)
    masses = rng.uniform(1e10, 1e12, n).astype(np.float32)
    step = make_train_step(model, tx, edges,
                           np.zeros(6, np.float32), np.ones(6, np.float32),
                           (masses / masses.mean())[:, None], masses=masses)
    jstep = jax.jit(step)
    opt_state = tx.init(params)
    s = jnp.asarray(rng.randn(8, n, 6), jnp.float32)
    t = jnp.asarray(s + 0.01 * rng.randn(8, n, 6), jnp.float32)
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(12):
        key, sub = jax.random.split(key)
        params, opt_state, loss = jstep(params, opt_state, s, t, sub)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), "non-finite loss"
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    return f"loss {losses[0]:.3f} -> {losses[-1]:.3f}"


@check("large-N datagen")
def check_large_n_datagen():
    """The BH-regime datagen composition (VERDICT r2 item 7): the Pallas
    symmetric kernel must compose with vmap + the trajectory scan + the
    planes-consumer fetch path at N above LANES_MAX_N — VMEM/HBM pressure
    inside scan differs from the isolated-step benchmark.  Reference
    regime: ``generate_data.py:41`` (use_barnes_hut = N > 500)."""
    import jax.numpy as jnp

    from nbody_gnn_hpc_tpu.parallel import (fetch_host_trajectory,
                                            simulate_ensemble)
    from nbody_gnn_hpc_tpu.sim import shared_masses
    from nbody_gnn_hpc_tpu.sim.energy import total_momentum

    n, steps = 2048, 10
    sm = shared_masses(n)
    obj = simulate_ensemble(seeds=[42, 43], n_particles=n, n_steps=steps,
                            box_size=10.0, dt=0.001, save_interval=1,
                            shared_masses=sm, layout="planes")
    traj = fetch_host_trajectory(obj)
    assert traj.positions.shape == (2, steps + 1, n, 3), traj.positions.shape
    assert np.isfinite(traj.positions).all()
    # Newton's 3rd law: total momentum conserved across the scan.
    p0 = np.asarray(total_momentum(jnp.asarray(traj.velocities[:, 0]),
                                   jnp.asarray(sm)[None]))
    pT = np.asarray(total_momentum(jnp.asarray(traj.velocities[:, -1]),
                                   jnp.asarray(sm)[None]))
    scale = np.abs(np.asarray(sm)[None, :, None]
                   * traj.velocities[:, 0]).sum(axis=1).max()
    drift = np.abs(pT - p0).max() / scale
    assert drift < 1e-5, f"momentum drift {drift:.2e}"
    return f"N={n} B=2 x{steps} steps, momentum drift {drift:.1e}"


@check("rollout")
def check_rollout():
    import jax

    from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
    from nbody_gnn_hpc_tpu.predict import Predictor

    rng = np.random.RandomState(1)
    n, k = 64, 8
    model = NBodyGNN(7, 32, 2, 6, 0.0, remat=False)
    params = init_model(model, jax.random.PRNGKey(0), n, n * k)
    pred = Predictor(model, k_neighbors=k, params=params)
    pred.norm_stats = {"state_mean": np.zeros(6, np.float32),
                       "state_std": np.ones(6, np.float32)}
    out = pred.predict_rollout(rng.randn(n, 3).astype(np.float32),
                               rng.randn(n, 3).astype(np.float32),
                               rng.uniform(1e10, 1e12, n).astype(np.float32),
                               n_steps=10)
    assert out["positions"].shape == (11, n, 3)
    assert np.isfinite(out["positions"]).all()
    return "10 steps, finite"


@check("quantized rollout")
def check_quantized_rollout():
    """int8 weight-only serving quantization (predict/quantize.py) on the
    real chip: quantized rollout must track the f32 rollout."""
    import jax

    from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
    from nbody_gnn_hpc_tpu.predict import Predictor

    rng = np.random.RandomState(2)
    n, k = 64, 8
    model = NBodyGNN(7, 32, 2, 6, 0.0, remat=False)
    params = init_model(model, jax.random.PRNGKey(0), n, n * k)
    # perturb away from the zero-init head so the rollout moves
    params = jax.tree_util.tree_map(
        lambda l: l + 0.05 * np.random.RandomState(4).randn(
            *l.shape).astype(np.asarray(l).dtype), params)
    pred = Predictor(model, k_neighbors=k, params=params)
    pred.norm_stats = {"state_mean": np.zeros(6, np.float32),
                       "state_std": np.ones(6, np.float32)}
    pos = rng.randn(n, 3).astype(np.float32)
    vel = 0.1 * rng.randn(n, 3).astype(np.float32)
    m = rng.uniform(1e10, 1e12, n).astype(np.float32)
    base = pred.predict_rollout(pos, vel, m, n_steps=5)["positions"]
    pred.quantize("int8")
    quant = pred.predict_rollout(pos, vel, m, n_steps=5)["positions"]
    rel = float(np.sqrt(np.mean((quant - base) ** 2))
                / (np.sqrt(np.mean(base ** 2)) + 1e-30))
    assert rel < 5e-2, f"int8 rollout rel-RMSE {rel:.2e}"
    return f"int8 vs f32 rel-RMSE {rel:.1e}"


@check("stream chunks")
def check_stream_chunks():
    """Serving stream path on-chip: rollout_stream's chunked frames must
    reassemble to exactly the one-program rollout (the chunk program is a
    different compiled shape — pre-warming it here keeps serving sessions
    from paying the slow remote Mosaic compile mid-request)."""
    import jax
    import tempfile
    from pathlib import Path as _Path

    from nbody_gnn_hpc_tpu.io.model_io import save_checkpoint
    from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
    from nbody_gnn_hpc_tpu.serve import RolloutService

    rng = np.random.RandomState(6)
    n, k, steps = 64, 8, 40  # spans >1 chunk even at chunk=32
    model = NBodyGNN(7, 32, 2, 6, 0.0, remat=False)
    params = init_model(model, jax.random.PRNGKey(0), n, n * k)
    with tempfile.TemporaryDirectory() as tmp:
        ckpt = _Path(tmp) / "model.pt"
        save_checkpoint(ckpt, params=params,
                        norm_stats={"state_mean": np.zeros(6, np.float32),
                                    "state_std": np.ones(6, np.float32)})
        svc = RolloutService(model, str(ckpt), k_neighbors=k)
        pos = rng.randn(n, 3).astype(np.float32)
        vel = rng.randn(n, 3).astype(np.float32)
        m = rng.uniform(1e10, 1e12, n).astype(np.float32)
        want = svc.rollout(pos, vel, m, steps)
        frames = list(svc.rollout_stream(pos, vel, m, steps, chunk=32))
        got_pos = np.concatenate([f["positions"] for f in frames])
        got_vel = np.concatenate([f["velocities"] for f in frames])
    assert got_pos.shape == np.asarray(want["positions"]).shape, \
        (got_pos.shape, np.asarray(want["positions"]).shape)
    np.testing.assert_allclose(got_pos, want["positions"], rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(got_vel, want["velocities"], rtol=2e-4,
                               atol=2e-4)
    return f"{len(frames)} chunks == one-program rollout"


@check("blocked k-NN N=4096")
def check_blocked_knn():
    """Row-blocked large-N k-NN (ops/knn.py) on-chip: identical neighbor
    selection to the dense path, then a BH-regime rollout through the
    automatic dispatch (the reference's any-N equivalent is a host cKDTree
    per step, predict.py:54-91)."""
    import jax
    import jax.numpy as jnp

    from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
    from nbody_gnn_hpc_tpu.ops.knn import KNN_DENSE_MAX, knn_edge_index
    from nbody_gnn_hpc_tpu.predict import Predictor

    rng = np.random.RandomState(8)
    n, k = 4096, 40
    assert n > KNN_DENSE_MAX
    pos = jnp.asarray(rng.uniform(-20, 20, (n, 3)), jnp.float32)
    dense = np.asarray(knn_edge_index(pos, k, block_size=n))  # force dense
    blocked = np.asarray(knn_edge_index(pos, k))  # auto: blocked at this N
    np.testing.assert_array_equal(blocked, dense)

    model = NBodyGNN(7, 32, 2, 6, 0.0, remat=False)
    params = init_model(model, jax.random.PRNGKey(0), n, n * k)
    pred = Predictor(model, k_neighbors=k, params=params)
    pred.norm_stats = {"state_mean": np.zeros(6, np.float32),
                       "state_std": np.ones(6, np.float32)}
    out = pred.predict_rollout(np.asarray(pos),
                               rng.randn(n, 3).astype(np.float32),
                               rng.uniform(1e10, 1e12, n).astype(np.float32),
                               n_steps=3)
    assert np.isfinite(out["positions"]).all()
    return f"N={n} k={k} blocked == dense; 3-step rollout finite"


@check("large-N surrogate N=5000")
def check_large_n_surrogate():
    """The BH-regime surrogate at the reference's benchmark scale (N=5000,
    the scripts/benchmark_bh_temp.py regime): row-blocked k-NN edge build,
    the PRODUCTION architecture (hidden 256, 6 layers, k=40 — 2,550,150
    params, unlike check 14's tiny model), and a short scan rollout, all
    on-chip.  The reference's any-N inference path is a host cKDTree +
    forward per step (predict.py:54-91); here the whole rollout is one
    device program.  Running this pre-warms the N=5000 Mosaic/XLA compiles
    (fused edge kernel at E=200,000, blocked k-NN) that the large-N
    pipeline (generate_data -> train -> evaluate at N>2048) reuses from
    .jax_cache."""
    import jax
    import jax.numpy as jnp

    from nbody_gnn_hpc_tpu.models import (NBodyGNN, count_parameters,
                                          init_model)
    from nbody_gnn_hpc_tpu.ops.knn import KNN_DENSE_MAX
    from nbody_gnn_hpc_tpu.predict import Predictor

    rng = np.random.RandomState(11)
    n, k = 5000, 40
    assert n > KNN_DENSE_MAX and n % 8 == 0  # blocked k-NN + fused kernel
    model = NBodyGNN(7, 256, 6, 6, 0.0)
    params = init_model(model, jax.random.PRNGKey(0), n, n * k)
    n_params = count_parameters(params)
    assert n_params == 2_550_150, n_params

    pred = Predictor(model, k_neighbors=k, params=params)
    pred.norm_stats = {"state_mean": np.zeros(6, np.float32),
                       "state_std": np.ones(6, np.float32)}
    out = pred.predict_rollout(
        rng.uniform(-20, 20, (n, 3)).astype(np.float32),
        rng.randn(n, 3).astype(np.float32),
        rng.uniform(1e10, 1e12, n).astype(np.float32),
        n_steps=3)
    assert np.isfinite(out["positions"]).all()
    assert out["positions"].shape[-2] == n
    return f"N={n} k={k}, production arch ({n_params:,} params), 3-step rollout finite"


@check("replica warm path")
def check_replica_pool():
    """Serving DP surface on the attached device: build_replica_pool +
    warmup + dispatch (on one chip this is a 1-replica pool — the code
    path real multi-chip serving uses, minus the extra devices)."""
    import jax
    import tempfile
    from pathlib import Path as _Path

    from nbody_gnn_hpc_tpu.io.model_io import save_checkpoint
    from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
    from nbody_gnn_hpc_tpu.serve import build_replica_pool

    rng = np.random.RandomState(9)
    n, k, steps = 32, 4, 5
    model = NBodyGNN(7, 8, 1, 6, 0.0, remat=False)
    params = init_model(model, jax.random.PRNGKey(0), n, n * k)
    with tempfile.TemporaryDirectory() as tmp:
        ckpt = _Path(tmp) / "model.pt"
        save_checkpoint(ckpt, params=params,
                        norm_stats={"state_mean": np.zeros(6, np.float32),
                                    "state_std": np.ones(6, np.float32)})
        cfg = _Path(tmp) / "config.json"
        cfg.write_text(
            '{"model_config": {"node_input_dim": 7, "hidden_dim": 8, '
            '"n_layers": 1, "output_dim": 6, "dropout": 0.0}, '
            '"training_config": {"k_neighbors": 4}}')
        pool = build_replica_pool(str(ckpt), str(cfg), n_replicas=1)
        pool.warmup(n, steps)
        out = pool.rollout(rng.randn(n, 3).astype(np.float32),
                           rng.randn(n, 3).astype(np.float32),
                           rng.uniform(1e10, 1e12, n).astype(np.float32),
                           steps)
    assert np.isfinite(np.asarray(out["positions"])).all()
    return f"{pool.model_info['replicas']} replica(s), rollout finite"


def main():
    parser = argparse.ArgumentParser(description="Real-TPU smoke workflow")
    parser.add_argument("--fast", action="store_true",
                        help="Skip the large-N Pallas check (slowest compile)")
    args = parser.parse_args()

    import jax

    print("=" * 60)
    print(f"TPU SMOKE  —  backend={jax.default_backend()}, "
          f"devices={jax.devices()}")
    print("=" * 60)
    check_device()
    check_forces()
    if not args.fast:
        check_pallas()
        check_blocked_energy()
    check_trajectory()
    if not args.fast:
        check_large_n_datagen()
        check_fused_edge()
        check_batched_edge()
        check_fused_full()
    check_train_step()
    check_rollout()
    check_quantized_rollout()
    check_stream_chunks()
    if not args.fast:
        check_blocked_knn()
        check_large_n_surrogate()
    check_replica_pool()

    n_fail = sum(1 for _, ok, _, _ in _RESULTS if not ok)
    print("=" * 60)
    print(f"{len(_RESULTS) - n_fail}/{len(_RESULTS)} checks passed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
