"""PhysicsInformedLoss: manual-formula parity (train.py:187-279)."""

import jax.numpy as jnp
import numpy as np

from nbody_gnn_hpc_tpu.train import PhysicsInformedLoss, mse_loss


def test_matches_manual_computation(rng):
    b, n = 3, 5
    pred = rng.randn(b, n, 6).astype(np.float32)
    tgt = rng.randn(b, n, 6).astype(np.float32)
    masses = rng.uniform(1e10, 1e12, n).astype(np.float32)

    loss = PhysicsInformedLoss()
    total, details = loss(jnp.asarray(pred), jnp.asarray(tgt),
                          jnp.asarray(masses))

    pos = np.mean((pred[..., :3] - tgt[..., :3]) ** 2)
    vel = np.mean((pred[..., 3:] - tgt[..., 3:]) ** 2)
    nm = masses / masses.mean()
    p_mom = (nm[None, :, None] * pred[..., 3:]).sum(1)
    t_mom = (nm[None, :, None] * tgt[..., 3:]).sum(1)
    mom = np.mean((p_mom - t_mom) ** 2)
    p_ke = (0.5 * nm[None, :] * (pred[..., 3:] ** 2).sum(-1)).sum(1)
    t_ke = (0.5 * nm[None, :] * (tgt[..., 3:] ** 2).sum(-1)).sum(1)
    en = np.mean((p_ke - t_ke) ** 2)

    np.testing.assert_allclose(float(details["position"]), pos, rtol=1e-5)
    np.testing.assert_allclose(float(details["velocity"]), vel, rtol=1e-5)
    np.testing.assert_allclose(float(details["momentum"]), mom, rtol=1e-4)
    np.testing.assert_allclose(float(details["energy"]), en, rtol=1e-4)
    np.testing.assert_allclose(float(total),
                               pos + vel + 0.1 * en + 0.1 * mom, rtol=1e-4)


def test_no_masses_drops_physics_terms(rng):
    pred = jnp.asarray(rng.randn(2, 4, 6), jnp.float32)
    tgt = jnp.asarray(rng.randn(2, 4, 6), jnp.float32)
    total, details = PhysicsInformedLoss()(pred, tgt, None)
    assert float(details["energy"]) == 0.0
    assert float(details["momentum"]) == 0.0
    np.testing.assert_allclose(
        float(total), float(details["position"]) + float(details["velocity"]),
        rtol=1e-6)


def test_perfect_prediction_zero_loss(rng):
    x = jnp.asarray(rng.randn(2, 4, 6), jnp.float32)
    m = jnp.asarray(rng.rand(4), jnp.float32)
    total, details = PhysicsInformedLoss()(x, x, m)
    assert float(total) == 0.0


def test_weights_respected(rng):
    pred = jnp.asarray(rng.randn(2, 4, 6), jnp.float32)
    tgt = jnp.asarray(rng.randn(2, 4, 6), jnp.float32)
    m = jnp.asarray(rng.rand(4), jnp.float32)
    loss = PhysicsInformedLoss(position_weight=2.0, velocity_weight=0.0,
                               energy_weight=0.0, momentum_weight=0.0)
    total, details = loss(pred, tgt, m)
    np.testing.assert_allclose(float(total), 2 * float(details["position"]),
                               rtol=1e-6)
    # Zero-weight terms are skipped entirely (reference train.py:241,254).
    assert float(details["energy"]) == 0.0
    assert float(details["momentum"]) == 0.0


def test_mse_loss(rng):
    a = jnp.asarray(rng.randn(3, 4), jnp.float32)
    b = jnp.asarray(rng.randn(3, 4), jnp.float32)
    np.testing.assert_allclose(float(mse_loss(a, b)),
                               np.mean((np.asarray(a) - np.asarray(b)) ** 2),
                               rtol=1e-6)
