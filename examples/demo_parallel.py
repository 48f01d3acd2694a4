#!/usr/bin/env python3
"""Demo: the parallelism layer on a device mesh — sharded ensemble datagen,
data-parallel training, and replica-pool serving, end to end.

The reference's entire distributed story is an mp.Pool of forked processes
(SURVEY §2.3); here the same fan-outs are XLA device programs over a
``jax.sharding.Mesh``:

  1. ensemble datagen: N independent sims batched into ONE sharded program
     (equality-checked against the unsharded result),
  2. a gspmd data-parallel training step (batch sharded over the mesh,
     loss equality-checked against the 1-device step),
  3. serving DP: one device-pinned model replica per chip, concurrent
     requests fanning out across them.

Runs anywhere: with one visible device pass ``--virtual-devices 8`` to get
an 8-device virtual CPU mesh (the same mechanism the test suite and the
driver's multichip dryrun use).

Usage:
    python examples/demo_parallel.py --virtual-devices 8
"""

import argparse
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--virtual-devices", type=int, default=0,
                        help="Force an N-device virtual CPU mesh (use when "
                             "only one real device is visible)")
    parser.add_argument("--particles", type=int, default=24)
    parser.add_argument("--sims", type=int, default=16)
    parser.add_argument("--steps", type=int, default=50)
    args = parser.parse_args()

    if args.virtual_devices:
        # Must happen before jax import; the package conftest does the same.
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count="
            f"{args.virtual_devices}").strip()

    import jax

    if args.virtual_devices:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from nbody_gnn_hpc_tpu.parallel import make_mesh, simulate_ensemble
    from nbody_gnn_hpc_tpu.sim import shared_masses

    devices = jax.devices()
    print(f"devices: {len(devices)} x {devices[0].platform}")
    mesh = make_mesh()

    # -- 1. sharded ensemble datagen -----------------------------------------
    n, steps = args.particles, args.steps
    seeds = list(range(42, 42 + args.sims))
    masses = shared_masses(n, seed=42)
    t0 = time.time()
    traj = simulate_ensemble(seeds, n, steps, box_size=10.0, dt=1e-3,
                             shared_masses=masses, mesh=mesh)
    sharded = np.asarray(traj.positions)
    t_mesh = time.time() - t0
    traj_1 = simulate_ensemble(seeds, n, steps, box_size=10.0, dt=1e-3,
                               shared_masses=masses, mesh=make_mesh(1))
    np.testing.assert_allclose(sharded, np.asarray(traj_1.positions),
                               rtol=2e-5, atol=1e-5)
    print(f"1. datagen: {args.sims} sims x {steps} steps sharded over "
          f"{len(devices)} devices in {t_mesh:.2f}s — equals unsharded")

    # -- 2. data-parallel training step ---------------------------------------
    import jax.numpy as jnp
    import optax

    from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
    from nbody_gnn_hpc_tpu.ops import fully_connected_edge_index
    from nbody_gnn_hpc_tpu.parallel import make_dp_train_step

    model = NBodyGNN(node_input_dim=7, hidden_dim=32, n_layers=2,
                     output_dim=6, dropout=0.1)
    edge_index = jnp.asarray(fully_connected_edge_index(n))
    params = init_model(model, jax.random.PRNGKey(0), n,
                        int(edge_index.shape[1]))
    tx = optax.adamw(5e-4, weight_decay=1e-4)
    opt_state = tx.init(params)

    rng = np.random.RandomState(0)
    batch = 2 * len(devices)
    states = jnp.asarray(rng.randn(batch, n, 6), jnp.float32)
    targets = jnp.asarray(rng.randn(batch, n, 6), jnp.float32)
    mean = jnp.zeros(6)
    std = jnp.ones(6)
    mass_feat = (jnp.asarray(masses) / jnp.asarray(masses).mean())[:, None]

    step_n = make_dp_train_step(model, tx, edge_index, mean, std, mass_feat,
                                mesh, noise_std=0.003,
                                masses=jnp.asarray(masses))
    _, _, loss_n = step_n(params, opt_state, states, targets,
                          jax.random.PRNGKey(1))
    step_1 = make_dp_train_step(model, tx, edge_index, mean, std, mass_feat,
                                make_mesh(1), noise_std=0.003,
                                masses=jnp.asarray(masses))
    _, _, loss_1 = step_1(params, opt_state, states, targets,
                          jax.random.PRNGKey(1))
    assert abs(float(loss_n) - float(loss_1)) <= 1e-5 * abs(float(loss_1))
    print(f"2. DP train step: batch {batch} sharded over {len(devices)} "
          f"devices, loss {float(loss_n):.6f} == 1-device "
          f"{float(loss_1):.6f}")

    # -- 3. replica-pool serving ----------------------------------------------
    import json
    import tempfile

    from nbody_gnn_hpc_tpu.client import RolloutClient
    from nbody_gnn_hpc_tpu.io.model_io import save_checkpoint
    from nbody_gnn_hpc_tpu.serve import build_replica_pool, serve

    tmp = Path(tempfile.mkdtemp())
    save_checkpoint(tmp / "model.pt", params=params,
                    norm_stats={"state_mean": np.zeros(6, np.float32),
                                "state_std": np.ones(6, np.float32)})
    (tmp / "config.json").write_text(json.dumps({
        "model_config": {"node_input_dim": 7, "hidden_dim": 32,
                         "n_layers": 2, "output_dim": 6, "dropout": 0.1},
        "training_config": {"k_neighbors": 8}}))
    pool = build_replica_pool(str(tmp / "model.pt"),
                              str(tmp / "config.json"),
                              n_replicas=min(4, len(devices)))
    httpd = serve(pool, host="127.0.0.1", port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    client = RolloutClient(f"http://127.0.0.1:{httpd.server_address[1]}")

    n_req = 2 * pool.model_info["replicas"]
    results = [None] * n_req
    barrier = threading.Barrier(n_req)

    def work(i):
        barrier.wait()
        results[i] = client.rollout(rng.randn(n, 3), rng.randn(n, 3),
                                    masses, 5)

    threads = [threading.Thread(target=work, args=(i,))
               for i in range(n_req)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None and r["positions"].shape == (6, n, 3)
               for r in results)
    print(f"3. serving DP: {n_req} concurrent rollouts across "
          f"{pool.model_info['replicas']} device-pinned replicas "
          f"in {time.time() - t0:.2f}s")
    httpd.shutdown()
    print("All three parallel layers agree with their single-device "
          "equivalents.")


if __name__ == "__main__":
    main()
