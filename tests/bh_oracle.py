"""Test-only NumPy Barnes-Hut oracle.

The production framework computes EXACT blocked all-pairs forces in the
reference's Barnes-Hut regime (N>500) — see `ops/pairwise.py` and the theta
warning in `sim/simulator.py`. This little octree exists solely to
cross-check that choice: at small theta, Barnes-Hut must converge to the
exact kernel, so our exact kernel is a superset of the reference's
theta-approximated answers (reference regime:
/root/reference/src/hpc/barnes_hut.py:317-431).

Written from the textbook algorithm, not ported: a recursive dict-free
octree with per-node (mass, center-of-mass), multipole acceptance
``cell_size / distance < theta``, and softened monopole contributions
matching the direct kernel's ``r² = |Δ|² + softening²``.
"""

import numpy as np

from nbody_gnn_hpc_tpu.sim.forces import G, SOFTENING


class _Cell:
    __slots__ = ("center", "half", "mass", "com", "kids", "body")

    def __init__(self, center, half):
        self.center = center      # (3,) geometric center of the cube
        self.half = half          # half side length
        self.mass = 0.0
        self.com = np.zeros(3)    # mass-weighted; normalized after build
        self.kids = None          # None => leaf
        self.body = None          # index of the single body in a leaf


def _octant(center, p):
    return (int(p[0] > center[0]) | (int(p[1] > center[1]) << 1)
            | (int(p[2] > center[2]) << 2))


def _subcell(cell, oct_idx):
    q = cell.half / 2.0
    offset = np.array([q if (oct_idx >> k) & 1 else -q for k in range(3)])
    return _Cell(cell.center + offset, q)


def _insert(cell, idx, pos):
    p = pos[idx]
    if cell.kids is None and cell.body is None:
        cell.body = idx
        return
    if cell.kids is None:               # occupied leaf: split
        prev, cell.body = cell.body, None
        cell.kids = [None] * 8
        for moved in (prev, idx):
            o = _octant(cell.center, pos[moved])
            if cell.kids[o] is None:
                cell.kids[o] = _subcell(cell, o)
            _insert(cell.kids[o], moved, pos)
    else:
        o = _octant(cell.center, p)
        if cell.kids[o] is None:
            cell.kids[o] = _subcell(cell, o)
        _insert(cell.kids[o], idx, pos)


def _summarize(cell, pos, masses):
    if cell.kids is None:
        m = masses[cell.body]
        cell.mass, cell.com = float(m), pos[cell.body].astype(float)
        return
    acc_m, acc_mx = 0.0, np.zeros(3)
    for kid in cell.kids:
        if kid is not None:
            _summarize(kid, pos, masses)
            acc_m += kid.mass
            acc_mx += kid.mass * kid.com
    cell.mass, cell.com = acc_m, acc_mx / acc_m


def build_octree(positions, masses):
    pos = np.asarray(positions, float)
    lo, hi = pos.min(axis=0), pos.max(axis=0)
    center = (lo + hi) / 2.0
    half = float((hi - lo).max()) / 2.0 + 1e-9
    root = _Cell(center, half)
    for i in range(len(pos)):
        _insert(root, i, pos)
    _summarize(root, pos, np.asarray(masses, float))
    return root


def _accel_on(i, p, cell, theta, softening):
    """Iterative tree walk accumulating the softened monopole force on p."""
    acc = np.zeros(3)
    stack = [cell]
    while stack:
        c = stack.pop()
        if c.kids is None:          # leaf
            if c.body == i:
                continue
            d = c.com - p
            r2 = d @ d + softening * softening
            acc += (G * c.mass / r2 ** 1.5) * d
            continue
        d = c.com - p
        dist = np.sqrt(d @ d)
        if dist > 0 and (2.0 * c.half) / dist < theta:  # accept multipole
            r2 = dist * dist + softening * softening
            acc += (G * c.mass / r2 ** 1.5) * d
        else:
            stack.extend(k for k in c.kids if k is not None)
    return acc


def barnes_hut_accelerations(positions, masses, theta=0.5,
                             softening=SOFTENING):
    """(N, 3) float64 accelerations via Barnes-Hut at opening angle theta."""
    pos = np.asarray(positions, float)
    root = build_octree(pos, masses)
    return np.stack([_accel_on(i, pos[i], root, theta, softening)
                     for i in range(len(pos))])
