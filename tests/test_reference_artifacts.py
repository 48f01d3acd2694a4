"""Interop against the REFERENCE's own committed artifacts.

Every other interop test round-trips files this framework wrote itself;
these consume ``/root/reference/models/{config,training_history}.json`` —
genuinely reference-produced files — through the same readers the CLIs use,
mirroring the reference's own consumers
(``/root/reference/scripts/evaluate.py:50-63`` reconstructs the model from
config.json; ``/root/reference/scripts/export_csv.py:144-169`` exports the
training history).
"""

import importlib.util
import json
import sys
from pathlib import Path

import pytest

REF_MODELS = Path("/root/reference/models")

pytestmark = pytest.mark.skipif(
    not (REF_MODELS / "config.json").exists(),
    reason="reference-produced artifacts not available on this host")


@pytest.fixture(scope="module")
def ref_config():
    return json.loads((REF_MODELS / "config.json").read_text())


@pytest.fixture(scope="module")
def ref_history():
    return json.loads((REF_MODELS / "training_history.json").read_text())


def test_reference_config_reconstructs_flagship_model(ref_config):
    """evaluate.py's loader pattern on the reference's config.json must
    rebuild the exact flagship architecture (2,550,150 params)."""
    import jax

    from nbody_gnn_hpc_tpu.models import (count_parameters, init_model,
                                          model_from_config)

    assert ref_config["model_type"] == "gnn"
    model = model_from_config(ref_config["model_config"],
                              dtype_override="float32")
    k = ref_config.get("training_config", {}).get("k_neighbors", 40)
    assert k == 40
    params = init_model(model, jax.random.PRNGKey(0), 200, 200 * k)
    assert count_parameters(params) == 2_550_150


def test_reference_training_config_roundtrip(ref_config):
    """The reference's persisted training_config must round-trip through
    TrainingConfig with no field renamed, dropped, or defaulted away."""
    from nbody_gnn_hpc_tpu import TrainingConfig

    ref_tc = ref_config["training_config"]
    cfg = TrainingConfig.from_dict(ref_tc)
    ours = cfg.to_dict()
    for key, value in ref_tc.items():
        assert key in ours, f"field {key} missing from TrainingConfig"
        assert ours[key] == value, f"field {key} changed in round-trip"


def test_reference_history_plots(ref_history, tmp_path):
    """Visualizer.plot_training_history must render the reference's real
    training_history.json (62 epochs, no epoch_time_s key)."""
    from nbody_gnn_hpc_tpu.utils import Visualizer

    viz = Visualizer(output_dir=str(tmp_path))
    viz.plot_training_history(ref_history,
                              save_name="training_history.png", show=False)
    out = tmp_path / "training_history.png"
    assert out.exists() and out.stat().st_size > 0


def test_reference_history_csv_export(ref_history, tmp_path):
    """export_csv's history exporter must consume the reference's real
    training_history.json and emit one row per epoch."""
    scripts = Path(__file__).resolve().parent.parent / "scripts"
    spec = importlib.util.spec_from_file_location(
        "export_csv_mod", scripts / "export_csv.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["export_csv_mod"] = spec.loader.exec_module(mod) or mod

    model_dir = tmp_path / "models"
    model_dir.mkdir()
    (model_dir / "training_history.json").write_text(json.dumps(ref_history))

    tables = list(mod.history_tables(model_dir))
    assert len(tables) == 1
    name, header, rows, _label = tables[0]
    assert name == "training_history.csv"
    assert header == ("epoch", "train_loss", "val_loss", "learning_rate")
    assert len(rows) == len(ref_history["train_loss"]) == 62
    # Every row fully populated: the reference history has equal-length
    # train/val/lr series.
    assert all(r[1] and r[2] and r[3] for r in rows)
