"""Example scripts run end-to-end (tiny sizes, CPU subprocess)."""

import subprocess
import sys
from pathlib import Path

import pytest

from tests.test_cli import cli_env

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_solar_system_demo(tmp_path):
    result = subprocess.run(
        [sys.executable, str(REPO / "examples/demo_solar_system.py"),
         "--days", "30", "-o", str(tmp_path)],
        env=cli_env(), capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, result.stderr[-1500:]
    assert "energy drift" in result.stdout
    # 30 days in: Earth ~30/365 of an orbit, x = cos(2pi*30/365) ~ 0.86 AU.
    assert (tmp_path / "solar_system.png").exists()


@pytest.mark.slow
def test_galaxy_collision_demo(tmp_path):
    result = subprocess.run(
        [sys.executable, str(REPO / "examples/demo_galaxy_collision.py"),
         "--per-galaxy", "15", "--steps", "5", "-o", str(tmp_path)],
        env=cli_env(), capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, result.stderr[-1500:]
    assert (tmp_path / "galaxy_collision.png").exists()


@pytest.mark.slow
def test_serving_demo(tmp_path):
    result = subprocess.run(
        [sys.executable, str(REPO / "examples/demo_serving.py"),
         "--clients", "3", "--particles", "16", "--k-neighbors", "4",
         "--steps", "4"],
        env=cli_env(), capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, result.stderr[-1500:]
    assert "Concurrent wall clock" in result.stdout
    assert result.stdout.count("client ") == 3


@pytest.mark.slow
def test_parallel_demo():
    result = subprocess.run(
        [sys.executable, str(REPO / "examples/demo_parallel.py"),
         "--virtual-devices", "4", "--particles", "12", "--sims", "8",
         "--steps", "20"],
        env=cli_env(), capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, result.stderr[-1500:]
    assert "equals unsharded" in result.stdout
    assert "== 1-device" in result.stdout
    assert "device-pinned replicas" in result.stdout
