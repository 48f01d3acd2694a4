#!/usr/bin/env python3
"""Measure the host-CPU baseline that anchors bench.py's BASELINE constant.

The reference's Numba pipeline cannot run here (numba is not installed), so
bench.py's ``vs_baseline`` divides by a documented estimate. This script
produces the measured half of that estimate: single-core vectorized-NumPy
float64 throughput of the same KDK loop (see bench.py's header for how the
12,000 sim-steps/s figure is derived from it).

Usage:
    python scripts/calibrate_baseline.py [-n PARTICLES] [--steps STEPS]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser(
        description="Measure the single-core NumPy f64 sim baseline")
    parser.add_argument("--particles", "-n", type=int, default=200)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()

    from nbody_gnn_hpc_tpu.sim import measure_numpy_baseline

    rate = measure_numpy_baseline(n_particles=args.particles,
                                  n_steps=args.steps, repeats=args.repeats)
    print(json.dumps({
        "metric": f"numpy-f64 single-core sim-steps/sec "
                  f"(N={args.particles})",
        "value": round(rate, 1),
        "unit": "sim-steps/sec",
        "anchors": "bench.py BASELINE_SIM_STEPS_PER_SEC = 12000 "
                   "(see bench.py header for the derivation)",
    }))


if __name__ == "__main__":
    main()
