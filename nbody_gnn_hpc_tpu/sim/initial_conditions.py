"""Host-side initial-condition generation with exact reference RNG parity.

The reference seeds NumPy's global RNG and draws, in order: positions,
velocities, masses (``src/hpc/nbody.py:174-181``).  Reproducing those exact
MT19937 streams matters because the published evaluation protocol keys on
seeds 42+i (datagen) and 9999+i (eval) with shared masses from seed 42
(``generate_data.py:108-109,133``; ``evaluate.py:76-88``).

These draws stay host-side NumPy (float64), exactly like the reference; only
the dynamics run on device.
"""

from typing import Optional, Tuple

import numpy as np


def random_initial_conditions(
    n_particles: int,
    box_size: float = 1.0,
    mass_range: Tuple[float, float] = (1e10, 1e12),
    seed: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Positions/velocities/masses drawn identically to the reference ctor.

    Reference draw order (``nbody.py:176-181``):
      1. positions  = (rand(n, 3) - 0.5) * box_size
      2. velocities = (rand(n, 3) - 0.5) * 0.1 * box_size
      3. masses     = uniform(mass_lo, mass_hi, n)

    ``np.random.seed(s)`` + global draws is stream-identical to
    ``RandomState(s)`` draws, which we use to avoid mutating global RNG state.
    With ``seed=None`` we fall back to the global RNG (reference behavior).
    """
    rng = np.random.RandomState(seed) if seed is not None else np.random
    positions = (rng.rand(n_particles, 3) - 0.5) * box_size
    velocities = (rng.rand(n_particles, 3) - 0.5) * 0.1 * box_size
    masses = rng.uniform(mass_range[0], mass_range[1], n_particles)
    return positions, velocities, masses


def shared_masses(n_particles: int, seed: int = 42,
                  mass_range: Tuple[float, float] = (1e10, 1e12)) -> np.ndarray:
    """The shared float32 mass array used across all sims in datagen and
    evaluation (reference ``generate_data.py:108-109``, ``evaluate.py:76-77``)."""
    rng = np.random.RandomState(seed)
    return rng.uniform(mass_range[0], mass_range[1], n_particles).astype(np.float32)
