"""Property-based physics tests (hypothesis) — VERDICT round 1, item 10.

Invariants that must hold for ANY particle configuration, not just the
seeded fixtures: Newton's-3rd-law momentum neutrality, Galilean invariance
of the forces, translation invariance, zero-mass-padding neutrality, and
mass linearity. Each property is checked on the production force kernel
(`sim.accelerations` dispatch) at small N (CPU path) — the Pallas kernels
are cross-checked against the same reference in tests/test_ops.py.
"""

import pytest

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from nbody_gnn_hpc_tpu.sim import accelerations, total_momentum
from nbody_gnn_hpc_tpu.sim.reference_f64 import accelerations_f64

# Heavy equivalence/property sweeps: full-suite only (pyproject addopts
# deselects 'slow' by default; run with -m '').
pytestmark = pytest.mark.slow

# Particle systems: modest N, positions within a few orders of magnitude of
# the production box, strictly positive masses.
N_RANGE = st.integers(min_value=2, max_value=24)


def system(draw, n):
    pos = draw(arrays(np.float64, (n, 3),
                      elements=st.floats(-100.0, 100.0, allow_nan=False)))
    masses = draw(arrays(np.float64, (n,),
                         elements=st.floats(1e8, 1e12, allow_nan=False)))
    return pos, masses


@st.composite
def systems(draw):
    n = draw(N_RANGE)
    return system(draw, n)


@settings(max_examples=40, deadline=None)
@given(systems())
def test_momentum_neutrality(sys_):
    """Σ m_i a_i == 0 (Newton's 3rd law) for any configuration."""
    pos, m = sys_
    acc = np.asarray(accelerations(jnp.asarray(pos, jnp.float32),
                                   jnp.asarray(m, jnp.float32)), np.float64)
    net = (m[:, None] * acc).sum(0)
    scale = np.abs(m[:, None] * acc).sum() + 1e-30
    assert np.abs(net).max() / scale < 1e-5


@settings(max_examples=40, deadline=None)
@given(systems(),
       arrays(np.float64, (3,), elements=st.floats(-1e3, 1e3,
                                                   allow_nan=False)))
def test_translation_invariance(sys_, shift):
    """Rigidly translating the system leaves accelerations unchanged up to
    f32 coordinate rounding."""
    pos, m = sys_
    a0 = np.asarray(accelerations(jnp.asarray(pos, jnp.float32),
                                  jnp.asarray(m, jnp.float32)), np.float64)
    a1 = np.asarray(accelerations(jnp.asarray(pos + shift, jnp.float32),
                                  jnp.asarray(m, jnp.float32)), np.float64)
    scale = np.abs(a0).max() + 1e-30

    # f32 coordinates round under translation, so each displacement carries
    # an absolute error ~ ulp(|coord|); relative to the closest pair's
    # separation that is eps32 * max|coord| / d_min — and the acceleration
    # scale is set by that same closest pair, so the invariance can only
    # hold to that ratio. Bound it per example (hypothesis generates pairs
    # separated by less than f32 ulp of the shifted coordinates, where the
    # rounding error is O(1) and the property is vacuous).
    def _dmin(p):
        d = np.linalg.norm(p[:, None] - p[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min()

    pos32 = np.asarray(pos, np.float32).astype(np.float64)
    shifted32 = np.asarray(pos + shift, np.float32).astype(np.float64)
    coord_max = max(float(np.abs(pos32).max()), float(np.abs(shifted32).max()),
                    1.0)
    d_min = max(float(min(_dmin(pos32), _dmin(shifted32))), 1e-30)
    tol = 5e-2 + 16 * float(np.finfo(np.float32).eps) * coord_max / d_min
    assert np.abs(a1 - a0).max() / scale < tol


@settings(max_examples=40, deadline=None)
@given(systems())
def test_zero_mass_padding_neutrality(sys_):
    """Appending zero-mass particles changes nothing for the real ones —
    the property the Pallas padding scheme relies on (ops/pairwise.py)."""
    pos, m = sys_
    n_pad = 5
    rng = np.random.RandomState(0)
    pos_p = np.concatenate([pos, rng.uniform(-50, 50, (n_pad, 3))])
    m_p = np.concatenate([m, np.zeros(n_pad)])
    a0 = np.asarray(accelerations(jnp.asarray(pos, jnp.float32),
                                  jnp.asarray(m, jnp.float32)), np.float64)
    a1 = np.asarray(accelerations(jnp.asarray(pos_p, jnp.float32),
                                  jnp.asarray(m_p, jnp.float32)), np.float64)
    scale = np.abs(a0).max() + 1e-30
    assert np.abs(a1[:len(pos)] - a0).max() / scale < 1e-6


@settings(max_examples=40, deadline=None)
@given(systems(), st.floats(0.25, 4.0))
def test_mass_linearity(sys_, k):
    """Scaling every mass by k scales every acceleration by k."""
    pos, m = sys_
    a0 = np.asarray(accelerations(jnp.asarray(pos, jnp.float32),
                                  jnp.asarray(m, jnp.float32)), np.float64)
    a1 = np.asarray(accelerations(jnp.asarray(pos, jnp.float32),
                                  jnp.asarray(m * k, jnp.float32)),
                    np.float64)
    scale = np.abs(a0).max() * k + 1e-30
    assert np.abs(a1 - k * a0).max() / scale < 1e-5


@settings(max_examples=30, deadline=None)
@given(systems())
def test_f32_kernel_tracks_f64_oracle(sys_):
    """The f32 production kernel agrees with the f64 oracle to f32
    precision for arbitrary configurations (not just seeded ICs).

    Scoped to separations whose square is representable in f32: below
    d ~ 1e-12 the f32 kernel's d^2 underflows toward zero while the f64
    oracle still resolves the (softening-dominated) force — a regime ~13
    orders of magnitude below the production box and outside the f32
    kernel's contract.
    """
    pos, m = sys_
    pos32 = np.asarray(pos, np.float32).astype(np.float64)
    d = np.linalg.norm(pos32[:, None] - pos32[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    d_min_nonzero = float(d[d > 0].min()) if (d > 0).any() else np.inf
    if d_min_nonzero <= 1e-12:
        return  # underflow band: outside the f32 kernel's contract (above)
    a32 = np.asarray(accelerations(jnp.asarray(pos, jnp.float32),
                                   jnp.asarray(m, jnp.float32)), np.float64)
    # Feed the oracle the same f32-rounded inputs the kernel sees: the
    # property under test is arithmetic precision, not input rounding.
    a64 = accelerations_f64(pos32, np.asarray(m, np.float32).astype(np.float64))
    scale = np.abs(a64).max() + 1e-30
    assert np.abs(a32 - a64).max() / scale < 1e-3


@settings(max_examples=20, deadline=None)
@given(systems(),
       arrays(np.float64, (3,), elements=st.floats(-10.0, 10.0,
                                                   allow_nan=False)))
def test_galilean_invariance_of_momentum(sys_, boost):
    """A velocity boost shifts total momentum by exactly M·v (and forces,
    which depend only on positions, are untouched)."""
    pos, m = sys_
    rng = np.random.RandomState(1)
    vel = rng.randn(len(m), 3)
    p0 = np.asarray(total_momentum(jnp.asarray(vel, jnp.float32),
                                   jnp.asarray(m, jnp.float32)), np.float64)
    p1 = np.asarray(total_momentum(jnp.asarray(vel + boost, jnp.float32),
                                   jnp.asarray(m, jnp.float32)), np.float64)
    expected = p0 + m.sum() * boost
    scale = np.abs(expected).max() + np.abs(p0).max() + 1e-30
    assert np.abs(p1 - expected).max() / scale < 1e-3


@settings(max_examples=25, deadline=None)
@given(systems(), st.integers(min_value=1, max_value=400))
def test_lanes_layout_matches_vmap_kernel(sys_, b_seed):
    """The sims-in-lanes force (sim/lanes.py) agrees with the production
    vmap kernel for ANY ensemble assembled from hypothesis-drawn systems —
    the lane transposition is a pure layout change."""
    from nbody_gnn_hpc_tpu.sim import G, lanes_accelerations, \
        pairwise_accelerations
    from nbody_gnn_hpc_tpu.sim.lanes import _pad_lanes, from_planes, to_planes

    pos, masses = sys_
    rng = np.random.RandomState(b_seed)
    b = rng.randint(1, 5)
    # build a small ensemble by jittering the drawn system
    pos_b = np.stack([pos + rng.randn(*pos.shape) for _ in range(b)])
    m_b = np.broadcast_to(masses, (b,) + masses.shape)
    a_ref = np.asarray(pairwise_accelerations(
        jnp.asarray(pos_b, jnp.float32), jnp.asarray(m_b, jnp.float32)))

    b_pad = _pad_lanes(b)
    gm = jnp.pad(jnp.float32(G) * jnp.asarray(m_b, jnp.float32).T,
                 ((0, 0), (0, b_pad - b)))
    planes = to_planes(jnp.asarray(pos_b, jnp.float32), b_pad)
    a = np.asarray(from_planes(lanes_accelerations(planes, gm), b))
    scale = np.abs(a_ref).max() + 1e-30
    np.testing.assert_allclose(a, a_ref, rtol=1e-4, atol=2e-5 * scale)


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=2, max_value=21), st.integers(min_value=1,
                                                           max_value=4),
       st.integers(min_value=0, max_value=10_000))
def test_fused_padding_any_shape(n, k, seed):
    """The fused edge op (interpret mode) matches the plain-jnp reference
    for ANY (N, k) with k < N — including every N % 8 residue."""
    import jax

    from nbody_gnn_hpc_tpu.models.gnn import target_adjacency
    from nbody_gnn_hpc_tpu.ops.fused_edge import fused_edge_layer
    from nbody_gnn_hpc_tpu.ops.knn import knn_edge_index

    if k >= n - 1:
        k = max(1, n - 2)
    h = 16
    rng = np.random.RandomState(seed)
    tp = jnp.asarray(rng.randn(n, h), jnp.float32)
    sp = jnp.asarray(rng.randn(n, h), jnp.float32)
    ea = jnp.asarray(rng.randn(n * k, 5), jnp.float32)
    we = jnp.asarray(rng.randn(5, h), jnp.float32)
    gamma = jnp.asarray(rng.randn(h), jnp.float32)
    beta = jnp.asarray(rng.randn(h), jnp.float32)
    pos = jnp.asarray(rng.randn(n, 3), jnp.float32)
    edges = knn_edge_index(pos, k)
    adj, _ = target_adjacency(edges, n, jnp.float32)

    got = np.asarray(fused_edge_layer(
        tp, sp, ea, we, gamma, beta, adj.T, jnp.zeros((1, 1), jnp.int32),
        k=k, deterministic=True, interpret=True))

    z = (jnp.take(tp, edges[1], axis=0) + jnp.repeat(sp, k, axis=0)
         + ea @ we)
    mu = z.mean(axis=1, keepdims=True)
    var = (z * z).mean(axis=1, keepdims=True) - mu * mu
    y = (z - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta
    a = y * jax.nn.sigmoid(y)
    want = np.asarray(adj @ a)
    scale = np.abs(want).max() + 1e-30
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5 * scale)
