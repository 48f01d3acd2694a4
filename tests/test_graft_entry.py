"""Driver entry points compile and run (single virtual device / 8-device)."""

import pytest
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, example_args = graft.entry()
    out = jax.jit(fn)(*example_args)
    assert out.shape == (200, 6)
    assert bool(jax.numpy.isfinite(out).all())
    # Zero-init flagship model: identity prediction.
    params, x = example_args
    np.testing.assert_allclose(np.asarray(out), np.asarray(x[:, :6]),
                               atol=1e-6)


@pytest.mark.slow
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
