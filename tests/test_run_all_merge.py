"""benchmarks/run_all.py must MERGE into results.json, not clobber it —
other harnesses (bench_serving.py's serving table, hand-recorded notes)
keep sections there that run_all does not measure."""

import importlib.util
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_run_all():
    spec = importlib.util.spec_from_file_location(
        "run_all_module", REPO / "benchmarks" / "run_all.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_merge_preserves_unmeasured_sections(tmp_path):
    mod = _load_run_all()
    out = tmp_path / "results.json"
    out.write_text(json.dumps({
        "serving_394step_protocol": {"microbatch8_final_only": 5.27},
        "gnn_rollout_394steps": {"seconds": 0.9},
    }))
    merged = mod.merge_write({"gnn_rollout_394steps": {"seconds": 0.2},
                              "backend": "tpu"}, out)
    on_disk = json.loads(out.read_text())
    assert merged == on_disk
    # measured key overwritten + freshness-stamped, unmeasured preserved
    assert on_disk["gnn_rollout_394steps"]["seconds"] == 0.2
    assert "measured_at" in on_disk["gnn_rollout_394steps"]
    assert on_disk["serving_394step_protocol"] == {
        "microbatch8_final_only": 5.27}  # untouched: no stamp injected
    assert on_disk["backend"] == "tpu"
    assert not (tmp_path / "results.json.tmp").exists()  # atomic write


def test_merge_tolerates_missing_and_corrupt_file(tmp_path):
    mod = _load_run_all()
    out = tmp_path / "results.json"
    assert mod.merge_write({"a": 1}, out) == {"a": 1}
    out.write_text("{not json")
    assert mod.merge_write({"b": 2}, out) == {"b": 2}
    assert json.loads(out.read_text()) == {"b": 2}
