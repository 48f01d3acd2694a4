"""Force-kernel correctness: oracle comparisons + physics invariants.

Oracles per SURVEY §4: (a) an independent float64 NumPy loop implementation
of the softened-gravity law, (b) Newton's-3rd-law momentum conservation,
(c) padding invariance (zero-mass particles are force-neutral).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody_gnn_hpc_tpu.sim import (G, SOFTENING, accelerations,
                                   blocked_accelerations,
                                   pairwise_accelerations)


def numpy_reference_accels(positions, masses, softening=SOFTENING):
    """Independent float64 oracle: direct transcription of the physics
    a_i = sum_{j!=i} G m_j (x_j - x_i) / (r^2 + eps^2)^1.5."""
    n = positions.shape[0]
    acc = np.zeros((n, 3), dtype=np.float64)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = positions[j] - positions[i]
            r2 = float(d @ d) + softening * softening
            acc[i] += G * masses[j] * d / r2 ** 1.5
    return acc


@pytest.fixture
def system(rng):
    n = 32
    pos = (rng.rand(n, 3) - 0.5) * 10.0
    vel = (rng.rand(n, 3) - 0.5)
    m = rng.uniform(1e10, 1e12, n)
    return pos, vel, m


def test_matches_float64_oracle(system):
    pos, _, m = system
    got = np.asarray(pairwise_accelerations(
        jnp.asarray(pos, jnp.float32), jnp.asarray(m, jnp.float32)))
    want = numpy_reference_accels(pos, m)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_momentum_conservation(system):
    """Newton's third law: sum_i m_i a_i == 0 (pairwise antisymmetry)."""
    pos, _, m = system
    acc = np.asarray(pairwise_accelerations(
        jnp.asarray(pos, jnp.float32), jnp.asarray(m, jnp.float32)),
        dtype=np.float64)
    net_force = (m[:, None] * acc).sum(axis=0)
    scale = np.abs(m[:, None] * acc).sum()
    assert np.abs(net_force).max() < 1e-6 * scale


def test_zero_mass_padding_is_force_neutral(system):
    pos, _, m = system
    base = np.asarray(pairwise_accelerations(
        jnp.asarray(pos, jnp.float32), jnp.asarray(m, jnp.float32)))
    pos_pad = np.concatenate([pos, np.zeros((8, 3))])
    m_pad = np.concatenate([m, np.zeros(8)])
    padded = np.asarray(pairwise_accelerations(
        jnp.asarray(pos_pad, jnp.float32), jnp.asarray(m_pad, jnp.float32)))
    np.testing.assert_allclose(padded[:len(pos)], base, rtol=1e-6)


def test_self_interaction_is_exactly_zero():
    """A single particle feels no force (softened self-term is 0*finite)."""
    acc = pairwise_accelerations(jnp.zeros((1, 3)), jnp.asarray([1e12]))
    assert np.all(np.asarray(acc) == 0.0)


def test_blocked_matches_broadcast(rng):
    n = 300  # not a multiple of the block size
    pos = jnp.asarray((rng.rand(n, 3) - 0.5) * 10.0, jnp.float32)
    m = jnp.asarray(rng.uniform(1e10, 1e12, n), jnp.float32)
    a = np.asarray(pairwise_accelerations(pos, m))
    b = np.asarray(blocked_accelerations(pos, m, block=128))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=0)


def test_batched_vmap_consistency(rng):
    import jax

    pos = jnp.asarray((rng.rand(4, 16, 3) - 0.5) * 10.0, jnp.float32)
    m = jnp.asarray(rng.uniform(1e10, 1e12, (4, 16)), jnp.float32)
    batched = np.asarray(jax.vmap(pairwise_accelerations)(pos, m))
    for b in range(4):
        single = np.asarray(pairwise_accelerations(pos[b], m[b]))
        np.testing.assert_allclose(batched[b], single, rtol=1e-6)


def test_dispatch_small_n(system):
    pos, _, m = system
    got = np.asarray(accelerations(jnp.asarray(pos, jnp.float32),
                                   jnp.asarray(m, jnp.float32)))
    want = np.asarray(pairwise_accelerations(jnp.asarray(pos, jnp.float32),
                                             jnp.asarray(m, jnp.float32)))
    np.testing.assert_allclose(got, want)


def test_solar_scale_masses_no_overflow():
    """Regression: at solar masses (~2e30), G*m/soft^3 overflows f32 for the
    softened self-pair; the explicit coincident-pair mask must keep forces
    finite and the self-force zero."""
    pos = jnp.asarray([[0, 0, 0], [1.496e11, 0, 0]], jnp.float32)
    m = jnp.asarray([1.989e30, 5.97e24], jnp.float32)
    acc = np.asarray(pairwise_accelerations(pos, m))
    assert np.all(np.isfinite(acc))
    # Earth's acceleration toward the sun: G*Msun/r^2 ~ 5.9e-3 m/s^2.
    np.testing.assert_allclose(acc[1, 0], -G * 1.989e30 / 1.496e11 ** 2,
                               rtol=1e-4)


def test_solar_scale_energy_no_overflow():
    from nbody_gnn_hpc_tpu.sim import total_energy

    pos = jnp.asarray([[0, 0, 0], [1.496e11, 0, 0]], jnp.float32)
    vel = jnp.asarray([[0, 0, 0], [0, 2.978e4, 0]], jnp.float32)
    m = jnp.asarray([1.989e30, 5.97e24], jnp.float32)
    ke, pe, te = total_energy(pos, vel, m)
    assert np.isfinite(float(te))
    # Bound orbit: total energy = -KE for a circular orbit (virial).
    np.testing.assert_allclose(float(pe), -2 * float(ke), rtol=1e-3)


def test_two_body_circular_orbit():
    """Closed-form Kepler oracle: circular two-body orbit acceleration
    magnitude a = G M / r^2 toward the companion."""
    m1, m2, r = 1e12, 1e12, 2.0
    pos = jnp.asarray([[-r / 2, 0, 0], [r / 2, 0, 0]], jnp.float32)
    m = jnp.asarray([m1, m2], jnp.float32)
    acc = np.asarray(pairwise_accelerations(pos, m))
    a_expected = G * m2 / r ** 2
    np.testing.assert_allclose(acc[0], [a_expected, 0, 0], rtol=1e-5)
    np.testing.assert_allclose(acc[1], [-a_expected, 0, 0], rtol=1e-5)


@pytest.mark.slow  # fast-mode budget (r5): the 5-residue sweep is slow-marked;
# test_blocked_potential_energy_batched_and_dispatch keeps the blocked path
# (batching + dispatch) pinned in fast mode.
def test_blocked_potential_energy_matches_dense():
    """The row-blocked large-N PE (sim/energy.py) must agree with the dense
    formulation — exercised across padding residues (N % PE_BLOCK) and with
    solar-scale masses (overflow-safe scaling shared with the dense path)."""
    from nbody_gnn_hpc_tpu.sim.energy import (_potential_energy_blocked,
                                              potential_energy)

    rng = np.random.RandomState(7)
    for n in (3, 17, 200, 512, 513):
        pos = jnp.asarray(rng.uniform(-10, 10, (n, 3)), jnp.float32)
        m = jnp.asarray(rng.uniform(1e10, 1e12, n), jnp.float32)
        dense = float(potential_energy(pos, m))
        blocked = float(_potential_energy_blocked(pos, m))
        np.testing.assert_allclose(blocked, dense, rtol=2e-6,
                                   err_msg=f"N={n}")
    # solar masses: no overflow in the blocked path either
    pos = jnp.asarray([[0, 0, 0], [1.496e11, 0, 0]], jnp.float32)
    m = jnp.asarray([1.989e30, 5.97e24], jnp.float32)
    np.testing.assert_allclose(float(_potential_energy_blocked(pos, m)),
                               float(potential_energy(pos, m)), rtol=1e-6)


def test_blocked_potential_energy_batched_and_dispatch():
    """Leading batch dims flatten+vmap correctly, and potential_energy
    dispatches to the blocked path at BLOCKED_MIN_N (checked by jaxpr: the
    blocked path contains a scan, the dense path does not)."""
    import jax

    from nbody_gnn_hpc_tpu.sim.energy import (BLOCKED_MIN_N,
                                              _potential_energy_blocked,
                                              potential_energy)

    rng = np.random.RandomState(8)
    pos = jnp.asarray(rng.uniform(-10, 10, (2, 3, 12, 3)), jnp.float32)
    m = jnp.asarray(rng.uniform(1e10, 1e12, (2, 3, 12)), jnp.float32)
    got = np.asarray(_potential_energy_blocked(pos, m))
    want = np.asarray(potential_energy(pos, m))
    assert got.shape == (2, 3)
    np.testing.assert_allclose(got, want, rtol=2e-6)

    # Shared (N,) masses broadcast against batched positions, like the
    # dense path (review r3: previously raised in vmap flattening).
    m1 = jnp.asarray(rng.uniform(1e10, 1e12, 12), jnp.float32)
    got = np.asarray(_potential_energy_blocked(pos, m1))
    want = np.asarray(potential_energy(pos, m1))
    assert got.shape == (2, 3)
    np.testing.assert_allclose(got, want, rtol=2e-6)

    def has_scan(n):
        p = jnp.zeros((n, 3), jnp.float32)
        mm = jnp.ones((n,), jnp.float32)
        jaxpr = jax.make_jaxpr(potential_energy)(p, mm)
        return "scan" in str(jaxpr)

    assert not has_scan(64)
    assert has_scan(BLOCKED_MIN_N)
