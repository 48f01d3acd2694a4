"""Orbax async checkpoint backend round-trip."""

import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("orbax.checkpoint")

from nbody_gnn_hpc_tpu.io.orbax_io import OrbaxCheckpointer  # noqa: E402


def test_async_save_restore_roundtrip(tmp_path):
    mgr = OrbaxCheckpointer(str(tmp_path / "ckpt"), max_to_keep=2)
    tree = {"params": {"w": jnp.arange(12.0).reshape(3, 4)},
            "step": jnp.asarray(7)}
    assert mgr.save(0, tree, force=True)
    mgr.wait()
    restored = mgr.restore(0, like=tree)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(12.0).reshape(3, 4))
    assert int(restored["step"]) == 7

    # max_to_keep retention
    for s in (1, 2):
        mgr.save(s, tree, force=True)
    mgr.wait()
    assert mgr.latest_step() == 2
    assert len(list(mgr.all_steps())) <= 2
    mgr.close()


def test_restore_latest_and_missing(tmp_path):
    mgr = OrbaxCheckpointer(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        mgr.restore()
    mgr.close()
