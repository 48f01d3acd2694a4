"""Property-based layout tests (hypothesis) — ROADMAP round-5 testing item.

The planes (lanes) layout (`sim/lanes.py`) and the fused edge kernel's
padding path are the two places where a TPU-motivated data layout differs
from the logical one; these properties pin that the transformation is
invisible at every batch/particle residue, not just the fixtures in
tests/test_lanes.py and tests/test_fused_edge.py:

- to_planes/from_planes round-trip for ANY (B, N), including B on, just
  below, and just above lane (128) boundaries;
- leading-axis handling of from_planes (the (T, 3N, L) trajectory stack);
- lane-padding neutrality: zero-GM pad lanes contribute nothing, and each
  real lane's forces equal the standard-layout kernel for that sim alone
  (reference force math: src/hpc/nbody.py:22-66);
- fused edge kernel forward equality across N % 8 residues (interpret
  mode; the production odd-N case N=500 is pinned in test_fused_edge.py).
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from nbody_gnn_hpc_tpu.sim import accelerations
from nbody_gnn_hpc_tpu.sim.forces import G
from nbody_gnn_hpc_tpu.sim.lanes import (LANE, _pad_lanes, from_planes,
                                         lanes_accelerations, to_planes)

# Heavy sweeps: full-suite only (pyproject addopts deselects 'slow').
pytestmark = pytest.mark.slow

# Batch sizes straddling lane boundaries plus arbitrary residues.
B_EDGES = st.sampled_from([1, 2, 127, 128, 129, 255, 256, 257])
B_ANY = st.integers(min_value=1, max_value=300)
B_RANGE = st.one_of(B_EDGES, B_ANY)
N_RANGE = st.integers(min_value=1, max_value=6)


@st.composite
def batched_positions(draw):
    b = draw(B_RANGE)
    n = draw(N_RANGE)
    pos = draw(arrays(np.float32, (b, n, 3),
                      elements=st.floats(-100.0, 100.0, allow_nan=False,
                                         width=32)))
    return pos


@settings(max_examples=30, deadline=None)
@given(batched_positions())
def test_planes_round_trip_any_residue(pos):
    """from_planes(to_planes(x)) == x bitwise for any (B, N); the pad
    lanes introduced by to_planes are exactly zero."""
    b, n = pos.shape[0], pos.shape[1]
    b_pad = _pad_lanes(b)
    assert b_pad % LANE == 0 and b_pad >= b
    planes = to_planes(jnp.asarray(pos), b_pad)
    assert planes.shape == (3 * n, b_pad)
    np.testing.assert_array_equal(np.asarray(planes[:, b:]), 0.0)
    back = from_planes(planes, b)
    np.testing.assert_array_equal(np.asarray(back), pos)


@settings(max_examples=20, deadline=None)
@given(batched_positions(), st.integers(min_value=1, max_value=4))
def test_from_planes_leading_axis(pos, t):
    """from_planes on a (T, 3N, L) trajectory stack == stacking the
    per-step conversions: time slots in behind the sim axis."""
    b = pos.shape[0]
    b_pad = _pad_lanes(b)
    # Build T distinct steps by shifting positions.
    steps = [jnp.asarray(pos) + k for k in range(t)]
    stack = jnp.stack([to_planes(s, b_pad) for s in steps])  # (T, 3N, L)
    out = from_planes(stack, b)                              # (B, T, N, 3)
    want = jnp.stack([from_planes(to_planes(s, b_pad), b) for s in steps],
                     axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


@st.composite
def batched_systems(draw):
    b = draw(st.one_of(st.sampled_from([1, 127, 128, 129]),
                       st.integers(min_value=1, max_value=140)))
    n = draw(st.integers(min_value=2, max_value=5))
    pos = draw(arrays(np.float32, (b, n, 3),
                      elements=st.floats(-50.0, 50.0, allow_nan=False,
                                         width=32)))
    masses = draw(arrays(np.float32, (b, n),
                         elements=st.floats(1e8, 999999995904.0,
                                            allow_nan=False, width=32)))
    return pos, masses


@settings(max_examples=15, deadline=None)
@given(batched_systems())
def test_lane_padding_neutral_and_lane_independent(sys_):
    """Each real lane of lanes_accelerations equals the standard-layout
    kernel run on that sim alone (zero-GM pad lanes change nothing, and
    no information leaks between lanes)."""
    pos, masses = sys_
    b, n = pos.shape[0], pos.shape[1]
    b_pad = _pad_lanes(b)
    pos_planes = to_planes(jnp.asarray(pos), b_pad)
    gm = jnp.pad(jnp.asarray(G, jnp.float32) * jnp.asarray(masses).T,
                 ((0, 0), (0, b_pad - b)))
    acc_planes = lanes_accelerations(pos_planes, gm)
    acc = np.asarray(from_planes(acc_planes, b))        # (B, N, 3)
    # Spot-check a handful of lanes (first, last, and a middle one) —
    # vmapping the dense kernel over all B would dominate the test.
    for i in sorted({0, b // 2, b - 1}):
        want = np.asarray(accelerations(jnp.asarray(pos[i]),
                                        jnp.asarray(masses[i])))
        scale = np.abs(want).max() + 1e-30
        np.testing.assert_allclose(acc[i], want, rtol=5e-5,
                                   atol=5e-5 * scale)


@pytest.mark.parametrize("n", [9, 12, 15])  # residues 1, 4, 7 (mod 8)
def test_fused_edge_forward_all_padding_residues(n):
    """Fused edge kernel forward == XLA branch at N % 8 residues not
    covered by the fixed odd-N test (n=10, residue 2)."""
    from nbody_gnn_hpc_tpu.models import NBodyGNN, init_model
    from nbody_gnn_hpc_tpu.ops.knn import knn_edge_index

    k = 3
    rng = np.random.RandomState(n)
    x = jnp.asarray(rng.randn(n, 7), jnp.float32)
    pos = x[:, :3]
    edges = knn_edge_index(pos, k)
    kw = dict(node_input_dim=7, hidden_dim=8, n_layers=2, output_dim=6,
              dropout=0.1, remat=False, dtype=jnp.float32)
    xla_m = NBodyGNN(edge_impl="xla", **kw)
    fused_m = NBodyGNN(edge_impl="fused", **kw)
    params = init_model(xla_m, jax.random.PRNGKey(1), n, n * k)
    out_x = xla_m.apply({"params": params}, x, edges, pos,
                        deterministic=True)
    out_f = fused_m.apply({"params": params}, x, edges, pos,
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)
