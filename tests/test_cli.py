"""CLI smoke tests: the full pipeline through the scripts, tiny sizes, CPU.

The reference's de-facto integration test is run_demo.py (SURVEY §4); this
drives the same stage sequence through subprocesses in a tmpdir.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import h5py
import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = REPO / "scripts"


def cli_env():
    """Subprocess env forcing local CPU (see conftest docstring)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    return env


def run(args, cwd):
    result = subprocess.run([sys.executable, *args], cwd=cwd, env=cli_env(),
                            capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, \
        f"{args} failed:\nSTDOUT:{result.stdout[-2000:]}\n" \
        f"STDERR:{result.stderr[-2000:]}"
    return result


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("cli")


# Stage argv shared by test_full_pipeline and the bootstrap fixture, so a
# dependent test run standalone sees exactly the state the full run leaves.
DATAGEN_ARGV = ["--particles", "12", "--simulations", "5", "--steps", "30",
                "--sequence-length", "5", "-o", "./data"]
TRAIN_ARGV = ["--epochs", "2", "--hidden-dim", "16", "--n-layers", "1",
              "--k-neighbors", "4", "--batch-size", "16",
              "-d", "./data", "-o", "./models"]


@pytest.fixture(scope="module")
def trained_workdir(workdir):
    """workdir with datagen + a 2-epoch training run present.

    Idempotent: a no-op when test_full_pipeline already ran here (the usual
    file-order case), a bootstrap when a dependent test is invoked
    standalone (``pytest tests/test_cli.py::test_train_resume_auto -m ''``)
    — dependent tests must not fail confusingly on sibling-test ordering.
    """
    if not (workdir / "data/train_dataset.h5").exists():
        run([str(SCRIPTS / "generate_data.py"), *DATAGEN_ARGV], workdir)
    if not (workdir / "models/final_model.pt").exists():
        run([str(SCRIPTS / "train_model.py"), *TRAIN_ARGV], workdir)
    return workdir


@pytest.mark.slow
def test_full_pipeline(workdir):
    # 1. generate_data
    run([str(SCRIPTS / "generate_data.py"), *DATAGEN_ARGV], workdir)
    with h5py.File(workdir / "data/train_dataset.h5") as f:
        # 4 train sims x (31 saved states - 5) windows — the initial state
        # is saved too (nbody.py:234), mirroring the reference's 391 = 401-10.
        assert f.attrs["n_samples"] == 4 * 26
        assert "masses" in f
    assert (workdir / "data/val_dataset.h5").exists()
    assert (workdir / "data/checkpoints/sim_0000_trajectory.h5").exists()

    # resumability: rerun skips existing sims
    out = run([str(SCRIPTS / "generate_data.py"), *DATAGEN_ARGV], workdir)
    assert "skipped 5" in out.stdout

    # 2. train_model
    run([str(SCRIPTS / "train_model.py"), *TRAIN_ARGV], workdir)
    assert (workdir / "models/best_model.pt").exists()
    assert (workdir / "models/final_model.pt").exists()
    with open(workdir / "models/config.json") as f:
        cfg = json.load(f)
    assert cfg["model_config"]["hidden_dim"] == 16
    with open(workdir / "models/training_history.json") as f:
        hist = json.load(f)
    assert len(hist["train_loss"]) == 2

    # 3. evaluate (--watchdog armed: must never fire on a healthy run)
    run([str(SCRIPTS / "evaluate.py"), "--n-test-sims", "2", "--particles",
         "12", "--steps", "30", "--watchdog", "300"], workdir)
    with open(workdir / "results/evaluation_results.json") as f:
        results = json.load(f)
    assert results["n_test_simulations"] == 2
    assert "position_rmse" in results["average_metrics"]
    assert len(results["per_simulation_metrics"]) == 2

    # 4. export_csv
    run([str(SCRIPTS / "export_csv.py")], workdir)
    for name in ("metrics_summary.csv", "metrics_per_simulation.csv",
                 "sample_trajectory.csv", "simulation_info.csv",
                 "training_history.csv"):
        assert (workdir / "results/csv" / name).exists(), name


@pytest.mark.slow
def test_large_n_composition(tmp_path):
    """The surrogate composed end-to-end ABOVE the blocked-kernel cutoffs
    (VERDICT r4 weak #2): datagen -> train -> evaluate at N=2085 —
    > KNN_DENSE_MAX=2048 (row-blocked k-NN in dataset prep AND rollout),
    >= PALLAS_MIN_N=2048 (blocked large-N force path), odd N (fused-kernel
    padding). Pins that the pieces the components-tests cover individually
    actually compose into a measured rollout RMSE at BH-regime N."""
    from nbody_gnn_hpc_tpu.ops.knn import KNN_DENSE_MAX
    from nbody_gnn_hpc_tpu.sim.forces import PALLAS_MIN_N

    n = 2085
    assert n > KNN_DENSE_MAX and n >= PALLAS_MIN_N

    run([str(SCRIPTS / "generate_data.py"), "--particles", str(n),
         "--simulations", "3", "--steps", "14", "--sequence-length", "5",
         "-o", "./data"], tmp_path)
    with h5py.File(tmp_path / "data/train_dataset.h5") as f:
        assert f["inputs"].shape[-2] == n

    run([str(SCRIPTS / "train_model.py"), "--epochs", "1",
         "--hidden-dim", "16", "--n-layers", "1", "--k-neighbors", "40",
         "--batch-size", "8", "-d", "./data", "-o", "./models"], tmp_path)
    assert (tmp_path / "models/final_model.pt").exists()

    run([str(SCRIPTS / "evaluate.py"), "--n-test-sims", "1",
         "--particles", str(n), "--steps", "14"], tmp_path)
    with open(tmp_path / "results/evaluation_results.json") as f:
        results = json.load(f)
    metrics = results["average_metrics"]
    assert results["n_particles"] == n
    import math
    assert math.isfinite(metrics["position_rmse"])
    # The chunked energy metric must have survived BH-regime N (it OOMed
    # pre-round-5): a real number, not the NaN fallback.
    assert math.isfinite(metrics["target_energy_error"])


@pytest.mark.slow
def test_select_checkpoint(trained_workdir):
    """Rollout-aware selection ranks the saved checkpoints on held-out val
    trajectories and promotes the winner. --watchdog armed — it must never
    fire on a healthy run."""
    workdir = trained_workdir
    out = run([str(SCRIPTS / "select_checkpoint.py"), "--horizon", "8",
               "--n-sims", "1", "--promote", "--watchdog", "300"], workdir)
    assert "selected" in out.stdout
    with open(workdir / "models/checkpoint_selection.json") as f:
        report = json.load(f)
    assert report["selected"] in [s["path"] for s in report["scores"]]
    assert len(report["scores"]) >= 2  # best_model + final_model
    assert (workdir / "models/selected_model.pt").exists()


@pytest.mark.slow
def test_train_resume_auto(trained_workdir):
    """Crash recovery: --resume auto picks the newest checkpoint and trains
    only the REMAINING epochs to the --epochs total (the fixture's models/
    holds an epoch-2 run). --watchdog armed end-to-end — it must never fire
    on a healthy run."""
    workdir = trained_workdir
    out = run([str(SCRIPTS / "train_model.py"), "--epochs", "4",
               "--hidden-dim", "16", "--n-layers", "1", "--k-neighbors", "4",
               "--batch-size", "16", "--resume", "auto", "--watchdog", "300",
               "-d", "./data", "-o", "./models"], workdir)
    assert "Resumed from:" in out.stdout
    assert "Remaining:     2 of 4 epochs" in out.stdout
    with open(workdir / "models/training_history.json") as f:
        hist = json.load(f)
    assert len(hist["train_loss"]) == 4  # 2 original + 2 resumed

    # Already at the budget: loads, trains nothing, exits cleanly.
    out = run([str(SCRIPTS / "train_model.py"), "--epochs", "4",
               "--hidden-dim", "16", "--n-layers", "1", "--k-neighbors", "4",
               "--batch-size", "16", "--resume", "auto",
               "-d", "./data", "-o", "./models"], workdir)
    assert "Remaining:     0 of 4 epochs" in out.stdout


@pytest.mark.slow
def test_merge_dataset(trained_workdir):
    """merge_dataset rebuilds train/val sets from trajectory files, with
    masses (fixing the reference's omission)."""
    workdir = trained_workdir
    run([str(SCRIPTS / "merge_dataset.py"), "-o", "./data",
         "--sequence-length", "5"], workdir)
    with h5py.File(workdir / "data/train_dataset.h5") as f:
        assert "masses" in f  # reference's merge omits them (SURVEY §7)
        assert f.attrs["n_samples"] > 0


@pytest.mark.slow
def test_benchmark_script(workdir):
    out = run([str(SCRIPTS / "benchmark_bh_temp.py"), "-n", "64",
               "--steps", "1"], workdir)
    assert "Average step time" in out.stdout


@pytest.mark.slow
def test_no_windows_pipeline(workdir):
    """--no-windows datagen writes a manifest instead of the (10x-redundant)
    windowed HDF5 files; train_model builds the dataset straight from the
    trajectory files."""
    run([str(SCRIPTS / "generate_data.py"), "--particles", "12",
         "--simulations", "5", "--steps", "30", "--sequence-length", "5",
         "--no-windows", "-o", "./data_nw"], workdir)
    assert (workdir / "data_nw/dataset_manifest.json").exists()
    assert not (workdir / "data_nw/train_dataset.h5").exists()
    assert (workdir / "data_nw/checkpoints/sim_0004_trajectory.h5").exists()
    with open(workdir / "data_nw/dataset_manifest.json") as f:
        spec = json.load(f)
    assert spec["train_sims"] == [f"sim_{i:04d}" for i in range(4)]
    assert spec["val_sims"] == ["sim_0004"]

    run([str(SCRIPTS / "train_model.py"), "--epochs", "1", "--hidden-dim",
         "16", "--n-layers", "1", "--k-neighbors", "4", "--batch-size", "16",
         "-d", "./data_nw", "-o", "./models_nw"], workdir)
    assert (workdir / "models_nw/final_model.pt").exists()


@pytest.mark.slow  # fast-mode budget (r5): spawns a subprocess server; the
# serve surface keeps 30+ fast in-process tests (tests/test_serve.py).
def test_serve_cli_sigterm_graceful_shutdown(tmp_path):
    """scripts/serve.py exits cleanly on SIGTERM (how a supervisor stops
    it), after actually serving a request."""
    import json as _json
    import signal
    import time
    import urllib.request

    import jax
    import numpy as np

    from nbody_gnn_hpc_tpu.io.model_io import save_checkpoint
    from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model

    model_config = {"node_input_dim": 7, "hidden_dim": 8, "n_layers": 1,
                    "output_dim": 6, "dropout": 0.0}
    model = NBodyGNN(**model_config, remat=False)
    params = init_model(model, jax.random.PRNGKey(0), 8, 8 * 3)
    save_checkpoint(tmp_path / "model.pt", params=params,
                    norm_stats={"state_mean": np.zeros(6, np.float32),
                                "state_std": np.ones(6, np.float32)})
    (tmp_path / "config.json").write_text(_json.dumps(
        {"model_config": model_config, "training_config":
         {"k_neighbors": 3}}))

    port = 8901
    proc = subprocess.Popen(
        [sys.executable, str(SCRIPTS / "serve.py"),
         "-m", str(tmp_path / "model.pt"),
         "-c", str(tmp_path / "config.json"),
         "--port", str(port), "--warm-particles", "0"],
        env=cli_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        deadline = time.time() + 120
        up = False
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=5) as r:
                    up = _json.loads(r.read())["status"] == "ok"
                    break
            except OSError:
                if proc.poll() is not None:
                    break
                time.sleep(0.5)
        assert up, f"server never came up: {proc.stdout and ''}"
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=30)
        out = proc.stdout.read()
        assert rc == 0, out[-2000:]
        assert "Shutting down." in out
    finally:
        if proc.poll() is None:
            proc.kill()


def test_run_demo_production_mode_wiring():
    """--production pins rollout-aware checkpoint selection ON (the measured
    fix for the best-val lottery: 580.7 -> 93.4 posRMSE on one run's own
    checkpoints — RESULTS.md), plus the rest of the measured recipe. The
    bare reference protocol stays the no-flag default."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_demo", SCRIPTS / "run_demo.py")
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)

    import argparse

    def parse(argv):
        # Re-create main()'s parser by calling through parse-only paths is
        # not exposed; build the namespace the way main() does.
        ns = argparse.Namespace(
            production=False, reference_protocol=False, skip_training=False,
            skip_datagen=False, no_clean=False, max_samples=None,
            epochs=None, no_windows=False, compression=None,
            f64_ground_truth=False, rollout_select=False,
            finetune_rollout=False, no_finetune_rollout=False,
            resume=False, watchdog=None)
        for flag in argv:
            setattr(ns, flag.lstrip("-").replace("-", "_"), True)
        return demo.resolve_mode(ns)

    cfg = demo.TrainingConfig()

    # Production: selection + fine-tune active (round-5 default: +9.0 min
    # measured for 93.35 -> 33.54 posRMSE), fine-tune FROM the selection
    # winner, evaluation on the fine-tuned model.
    args = parse(["--production"])
    assert args.rollout_select and args.no_windows and args.f64_ground_truth
    assert args.finetune_rollout
    assert args.compression == "lzf"
    assert args.epochs == demo.PRODUCTION_EPOCHS
    select_stage = next(s for s in demo.PIPELINE if "Selecting" in s.title)
    assert select_stage.skip(args) is None  # not skipped
    ft_argv = demo._finetune_argv(args, cfg)
    assert "./models/selected_model.pt" in ft_argv
    eval_argv = demo._evaluate_argv(args, cfg)
    assert "./models/best_rollout_model.pt" in eval_argv
    assert "--f64-ground-truth" in eval_argv
    assert "--no-windows" in demo._datagen_argv(args, cfg)
    assert "lzf" in demo._datagen_argv(args, cfg)

    # Opt-out: --no-finetune-rollout evaluates the selected checkpoint.
    args = parse(["--production", "--no-finetune-rollout"])
    assert args.rollout_select and not args.finetune_rollout
    assert "./models/selected_model.pt" in demo._evaluate_argv(args, cfg)

    # Bare default = reference protocol: selection skipped, best_model used.
    args = parse([])
    assert not args.rollout_select
    assert args.compression == "gzip"
    assert select_stage.skip(args) is not None
    assert "-m" not in demo._evaluate_argv(args, cfg)

    # The two mode switches are mutually exclusive.
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        parse(["--production", "--reference-protocol"])


@pytest.mark.slow
def test_multichip_smoke_cli(tmp_path):
    """One-command multi-chip readiness check (VERDICT r3 item 4): DP
    certification + multi-slice hybrid-mesh certification + replica-pool
    serving on the virtual 8-device CPU mesh. Scaling table skipped here
    (it re-times every mesh size; the wiring is the same code path
    certify/scale share)."""
    out = run([str(SCRIPTS / "multichip_smoke.py"), "--platform", "cpu",
               "--devices", "8", "--skip-scaling"], tmp_path)
    assert "MULTICHIP SMOKE: ALL 3 STAGES PASSED" in out.stdout
    assert "certify_hybrid(8)" in out.stdout
