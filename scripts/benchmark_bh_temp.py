#!/usr/bin/env python3
"""Large-N step benchmark (the reference's Barnes-Hut regime).

CLI parity: reference ``scripts/benchmark_bh_temp.py`` — N=5000 default,
init timing, warmup (compilation) step, mean of 5 timed steps.  The BH
octree is replaced by the blocked all-pairs Pallas kernel (SURVEY §2.2), so
this times the TPU large-N path end to end.

Timing note: on tunneled TPU platforms ``block_until_ready`` may not block;
every timed step forces a host readback of a scalar.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    parser = argparse.ArgumentParser(description="Benchmark large-N step")
    parser.add_argument("-n", "--particles", type=int, default=5000)
    parser.add_argument("--steps", type=int, default=5)
    args = parser.parse_args()

    import jax

    from nbody_gnn_hpc_tpu.sim import NBodySimulator
    from nbody_gnn_hpc_tpu.sim.integrator import rollout_steps

    print(f"Benchmarking blocked all-pairs (BH-equivalent regime) with "
          f"N={args.particles} on {jax.default_backend()}...")

    t0 = time.time()
    sim = NBodySimulator(n_particles=args.particles, use_barnes_hut=True)
    float(sim.state.accelerations.sum())
    print(f"Initialization: {time.time() - t0:.2f}s")

    print("Warming up (compiling)...")
    t_warm = time.time()
    state = rollout_steps(sim.state, sim.dt, 1)
    float(state.positions.sum())
    print(f"Warmup step: {time.time() - t_warm:.2f}s")

    # Chain CHUNK steps per measurement: a per-step host readback would
    # time the network round-trip, not the kernel (~30ms tunnel latency vs
    # sub-ms step compute).
    chunk = 50
    state = rollout_steps(state, sim.dt, chunk)  # compile the chunked form
    float(state.positions.sum())

    times = []
    print("Measuring...")
    for i in range(args.steps):
        start = time.time()
        state = rollout_steps(state, sim.dt, chunk)
        float(state.positions.sum())  # force execution
        dt = (time.time() - start) / chunk
        times.append(dt)
        print(f"Round {i + 1} ({chunk} steps): {dt * 1000:.3f} ms/step")

    avg_step = sum(times) / len(times)
    print(f"Average step time: {avg_step:.4f}s "
          f"({args.particles ** 2 / avg_step / 1e9:.2f} Gpairs/s)")


if __name__ == "__main__":
    main()
