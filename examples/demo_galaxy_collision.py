#!/usr/bin/env python3
"""Demo: two colliding galaxies (reference ``nbody.py:305-337``).

Usage:
    python examples/demo_galaxy_collision.py [--per-galaxy 500] [--steps 300]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from nbody_gnn_hpc_tpu.sim import NBodySimulator


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--per-galaxy", type=int, default=500)
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("-o", "--output-dir", default="./results/demo")
    parser.add_argument("--gif", action="store_true",
                        help="Also render an animation GIF")
    args = parser.parse_args()

    np.random.seed(0)
    sim = NBodySimulator.create_galaxy_collision(n_per_galaxy=args.per_galaxy)
    print(f"Integrating {sim.n_particles} particles for {args.steps} steps...")
    traj = sim.run_trajectory(args.steps)
    pos = np.asarray(traj.positions)

    try:
        from nbody_gnn_hpc_tpu.utils import Visualizer

        viz = Visualizer(args.output_dir)
        viz.plot_trajectory_3d(pos, title="Galaxy Collision",
                               save_name="galaxy_collision.png", show=False)
        viz.plot_particle_distribution(
            pos, title="Final Distribution",
            save_name="galaxy_distribution.png", show=False)
        if args.gif:
            viz.create_animation(pos[::5], save_name="galaxy_collision.gif")
        print(f"Plots in {args.output_dir}")
    except Exception as e:
        print(f"(plotting skipped: {e})")


if __name__ == "__main__":
    main()
