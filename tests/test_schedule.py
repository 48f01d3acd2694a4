"""LR schedule parity with torch CosineAnnealingWarmRestarts (T_0=20,
T_mult=2, eta_min=1e-6) stepped per epoch — the reference's scheduler
(train.py:368-370).  torch (CPU) is used here as the oracle only."""

import numpy as np
import pytest

from nbody_gnn_hpc_tpu.train import cosine_warm_restarts, make_step_schedule

BASE, ETA = 5e-4, 1e-6


def torch_lrs(n_epochs):
    torch = pytest.importorskip("torch")
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=BASE)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=20, T_mult=2, eta_min=ETA)
    lrs = []
    for _ in range(n_epochs):
        lrs.append(opt.param_groups[0]["lr"])  # LR used during this epoch
        sched.step()
    return np.array(lrs)


@pytest.mark.slow  # fast-mode budget (r5): the full 200-epoch torch sweep is
# slow-marked; test_restart_boundaries + test_traced_matches_python keep the
# warm-restart schedule pinned in fast mode.
def test_matches_torch_over_200_epochs():
    want = torch_lrs(200)
    got = np.array([cosine_warm_restarts(e, BASE) for e in range(200)])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)


def test_restart_boundaries():
    assert cosine_warm_restarts(0, BASE) == pytest.approx(BASE)
    assert cosine_warm_restarts(20, BASE) == pytest.approx(BASE)
    assert cosine_warm_restarts(60, BASE) == pytest.approx(BASE)
    assert cosine_warm_restarts(140, BASE) == pytest.approx(BASE)
    # Just before restarts: near eta_min.
    assert cosine_warm_restarts(19, BASE) < BASE * 0.02
    assert cosine_warm_restarts(59, BASE) < BASE * 0.005


def test_step_schedule_constant_within_epoch():
    import jax.numpy as jnp

    sched = make_step_schedule(BASE, steps_per_epoch=10)
    lr0 = float(sched(jnp.asarray(0)))
    lr9 = float(sched(jnp.asarray(9)))
    lr10 = float(sched(jnp.asarray(10)))
    assert lr0 == lr9 == pytest.approx(BASE)
    assert lr10 == pytest.approx(float(cosine_warm_restarts(1, BASE)), rel=1e-5)


def test_traced_matches_python():
    import jax.numpy as jnp

    for e in [0, 1, 19, 20, 21, 59, 60, 139, 140, 199]:
        py = cosine_warm_restarts(e, BASE)
        tr = float(cosine_warm_restarts(jnp.asarray(float(e)), BASE))
        np.testing.assert_allclose(tr, py, rtol=1e-5)
