"""predict_rollout_batch == stacked single rollouts."""

import jax
import numpy as np

from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
from nbody_gnn_hpc_tpu.predict import Predictor


def test_batch_rollout_matches_single(rng):
    model = NBodyGNN(node_input_dim=7, hidden_dim=16, n_layers=2,
                     output_dim=6, dropout=0.0)
    n, k, b, steps = 10, 4, 3, 5
    params = init_model(model, jax.random.PRNGKey(0), n, n * k)
    # Perturb so rollouts actually move.
    params = jax.tree_util.tree_map(lambda p: p + 0.01, params)
    pred = Predictor(model, k_neighbors=k, params=params)
    pred.norm_stats = {
        "state_mean": np.zeros(6, np.float32),
        "state_std": np.ones(6, np.float32) * 2.0,
    }

    pos0 = rng.randn(b, n, 3).astype(np.float32)
    vel0 = rng.randn(b, n, 3).astype(np.float32)
    masses = rng.uniform(1e10, 1e12, n).astype(np.float32)

    batch = pred.predict_rollout_batch(pos0, vel0, masses, steps)
    assert batch["positions"].shape == (b, steps + 1, n, 3)
    for i in range(b):
        single = pred.predict_rollout(pos0[i], vel0[i], masses, steps)
        np.testing.assert_allclose(batch["positions"][i],
                                   single["positions"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(batch["velocities"][i],
                                   single["velocities"], rtol=1e-5, atol=1e-6)

    # Final-state-only programs (serving mode: the scan carries no
    # per-step outputs) must agree with the last trajectory frame exactly
    # (identical step math, identical iteration count).
    final_b = pred.predict_rollout_batch(pos0, vel0, masses, steps,
                                         trajectory=False)
    assert final_b["positions"].shape == (b, n, 3)
    np.testing.assert_array_equal(final_b["positions"],
                                  batch["positions"][:, -1])
    final_s = pred.predict_rollout(pos0[0], vel0[0], masses, steps,
                                   trajectory=False)
    assert final_s["positions"].shape == (n, 3)
    np.testing.assert_array_equal(
        final_s["positions"],
        pred.predict_rollout(pos0[0], vel0[0], masses,
                             steps)["positions"][-1])
