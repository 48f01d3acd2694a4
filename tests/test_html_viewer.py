"""Interactive HTML viewer export: structure, embedding, subsampling."""

import json
import re

import numpy as np

from nbody_gnn_hpc_tpu.utils import export_interactive_html


def test_export_embeds_trajectory(tmp_path, rng):
    T, N = 30, 10
    pos = np.cumsum(rng.randn(T, N, 3), axis=0)
    masses = rng.uniform(1e10, 1e12, N)
    out = export_interactive_html(pos, masses, tmp_path / "viewer.html",
                                  times=np.arange(T) * 0.001,
                                  title="Test Run")
    html = open(out).read()
    assert "<canvas" in html and "Test Run" in html
    data = json.loads(re.search(r"const DATA = (\{.*?\});\n", html,
                                re.S).group(1))
    assert len(data["positions"]) == T
    assert len(data["positions"][0]) == N
    assert len(data["masses"]) == N
    assert len(data["times"]) == T


def test_export_subsamples_big_trajectories(tmp_path, rng):
    T, N = 1000, 8
    pos = rng.randn(T, N, 3)
    out = export_interactive_html(pos, np.ones(N), tmp_path / "big.html",
                                  max_steps=100)
    data = json.loads(re.search(r"const DATA = (\{.*?\});\n",
                                open(out).read(), re.S).group(1))
    assert len(data["positions"]) == 100  # stride-10 subsample


def test_export_rejects_bad_shape(tmp_path):
    import pytest

    with pytest.raises(ValueError):
        export_interactive_html(np.zeros((5, 3)), np.ones(3),
                                tmp_path / "x.html")
