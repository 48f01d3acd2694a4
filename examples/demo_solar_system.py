#!/usr/bin/env python3
"""Demo: the built-in solar-system scene (reference ``nbody.py:275-303``).

Integrates the 9-body system for one Earth year of simulated time and plots
the trajectories + energy conservation.

Usage:
    python examples/demo_solar_system.py [--days 365] [-o ./results/demo]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from nbody_gnn_hpc_tpu.sim import NBodySimulator
from nbody_gnn_hpc_tpu.utils.metrics import compute_energy_error


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--days", type=float, default=365.0)
    parser.add_argument("-o", "--output-dir", default="./results/demo")
    args = parser.parse_args()

    sim = NBodySimulator.create_solar_system()
    # One day per step (dt in seconds; scene units are SI).
    sim.dt = 86400.0
    n_steps = int(args.days)

    print(f"Integrating solar system for {n_steps} days...")
    traj = sim.run_trajectory(n_steps)
    pos = np.asarray(traj.positions)
    vel = np.asarray(traj.velocities)
    masses = np.asarray(traj.masses)

    energies, max_err = compute_energy_error(pos, vel, masses)
    print(f"Relative energy drift over {n_steps} days: {max_err:.3e}")

    # Earth should complete ~days/365 of an orbit.
    earth = pos[:, 3] / 1.496e11  # AU
    print(f"Earth start: ({earth[0, 0]:.3f}, {earth[0, 1]:.3f}) AU, "
          f"end: ({earth[-1, 0]:.3f}, {earth[-1, 1]:.3f}) AU")

    try:
        from nbody_gnn_hpc_tpu.utils import Visualizer

        viz = Visualizer(args.output_dir)
        viz.plot_trajectory_3d(pos, title="Solar System (1 year)",
                               save_name="solar_system.png", show=False)
        print(f"Plot: {Path(args.output_dir) / 'solar_system.png'}")
    except Exception as e:
        print(f"(plotting skipped: {e})")


if __name__ == "__main__":
    main()
