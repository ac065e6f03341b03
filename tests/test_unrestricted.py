"""Unrestricted (spin-resolved) RDMs and up-then-down JW ordering.

The reference supports restricted=False RDMs (pqc.py:192-218) and both
JW orderings in its operator algebra (utils/active_space.py:29-57);
round 1 raised NotImplementedError for both.  Ground truth here is the
sparse operator algebra (ops/fermion.py), itself pinned by the reference
golden statevector/RDM fixtures in tests/test_pqc.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from auto_oo_tpu.models import Parameterized_circuit
from auto_oo_tpu.ops import fermion
from auto_oo_tpu.ops import rdms as _rdms


@pytest.fixture(scope="module")
def uccd_state_22():
    pqc = Parameterized_circuit(2, 2, ansatz="ucc")
    theta = jnp.array([0.4217])
    return pqc, theta, np.asarray(pqc.state(theta))


def test_unrestricted_gamma_matches_sparse(uccd_state_22):
    pqc, theta, psi = uccd_state_22
    gamma_u, Gamma_u = pqc.get_rdms(theta, restricted=False)
    nm = 2 * pqc.ncas
    assert gamma_u.shape == (nm, nm)
    for p in range(nm):
        for q in range(nm):
            ref = psi @ (fermion.apq_sparse(p, q, pqc.ncas) @ psi)
            assert abs(float(gamma_u[p, q]) - ref) < 1e-12, (p, q)


def test_unrestricted_gamma_two_matches_sparse(uccd_state_22):
    pqc, theta, psi = uccd_state_22
    _, Gamma_u = pqc.get_rdms(theta, restricted=False)
    nm = 2 * pqc.ncas
    rng = np.random.RandomState(0)
    # spot-check a random subset plus all diagonal-degenerate patterns
    quads = {tuple(rng.randint(0, nm, size=4)) for _ in range(40)}
    quads |= {(0, 0, 1, 2), (0, 1, 1, 0), (0, 1, 2, 2), (1, 0, 0, 1)}
    for p, q, r, s in quads:
        ref = psi @ (fermion.apqrs_sparse(p, q, r, s, pqc.ncas) @ psi)
        assert abs(float(Gamma_u[p, q, r, s]) - ref) < 1e-12, (p, q, r, s)


def test_restricted_from_unrestricted_sum_rule(uccd_state_22):
    """gamma^R_pq = sum_sigma gamma^U_(p sigma)(q sigma); the restricted
    chemist Gamma contracts the unrestricted one as
    Gamma^R_pqrs = sum_st Gamma^U_(ps)(rt)(st)(qs) ordering-mapped."""
    pqc, theta, psi = uccd_state_22
    g_r, G_r = pqc.get_rdms(theta, restricted=True)
    g_u, G_u = pqc.get_rdms(theta, restricted=False)
    n = pqc.ncas
    for p in range(n):
        for q in range(n):
            s = float(g_u[2 * p, 2 * q] + g_u[2 * p + 1, 2 * q + 1])
            assert abs(float(g_r[p, q]) - s) < 1e-12
    # restricted e_pqrs = sum_{sigma tau} a+_{p sig} a+_{r tau} a_{s tau}
    # a_{q sig}  (chemist order, reference active_space.py:57-84)
    for p in range(n):
        for q in range(n):
            for r in range(n):
                for s in range(n):
                    acc = 0.0
                    for sg in range(2):
                        for tu in range(2):
                            acc += float(G_u[2 * p + sg, 2 * r + tu,
                                             2 * s + tu, 2 * q + sg])
                    assert abs(float(G_r[p, q, r, s]) - acc) < 1e-12


def test_up_then_down_hamiltonian_spectrum_invariance():
    """A CAS Hamiltonian built from up-then-down operators has the same
    spectrum as the interleaved one — mode relabeling is a (signed)
    unitary, so physics is ordering-invariant (reference
    active_space.py:43-50 supports both conventions)."""
    ncas = 2
    rng = np.random.RandomState(5)
    c1 = rng.randn(ncas, ncas)
    c1 = c1 + c1.T
    c2 = rng.randn(ncas, ncas, ncas, ncas)
    c2 = c2 + c2.transpose(1, 0, 3, 2)  # hermiticity of sum c2 E E

    def ham(utd):
        D = 1 << (2 * ncas)
        H = np.zeros((D, D))
        for p in range(ncas):
            for q in range(ncas):
                H += c1[p, q] * fermion.epq_sparse(
                    p, q, ncas, utd).toarray()
                for r in range(ncas):
                    for s in range(ncas):
                        H += c2[p, q, r, s] * fermion.epqrs_sparse(
                            p, q, r, s, ncas, utd).toarray()
        return H

    w_int = np.linalg.eigvalsh(ham(False))
    w_utd = np.linalg.eigvalsh(ham(True))
    assert np.allclose(w_int, w_utd, atol=1e-10)


def test_up_then_down_rdms_kernel():
    """The device gather-map kernel with up_then_down=True matches the
    sparse up-then-down operators element-wise."""
    ncas = 2
    nm = 2 * ncas
    D = 1 << nm
    rng = np.random.RandomState(7)
    psi = rng.randn(D)
    psi /= np.linalg.norm(psi)
    gamma, Gamma = _rdms.rdms_from_state(jnp.asarray(psi), ncas,
                                         up_then_down=True)
    for p in range(ncas):
        for q in range(ncas):
            ref = psi @ (fermion.epq_sparse(p, q, ncas, True) @ psi)
            assert abs(float(gamma[p, q]) - ref) < 1e-12
    for p in range(ncas):
        for q in range(ncas):
            for r in range(ncas):
                for s in range(ncas):
                    ref = psi @ (fermion.epqrs_sparse(p, q, r, s, ncas,
                                                      True) @ psi)
                    assert abs(float(Gamma[p, q, r, s]) - ref) < 1e-12


def test_onthefly_epq_maps_equal_tables():
    """The bit-arithmetic E_pq gather maps (used for large statevectors,
    O(1) memory) are semantically identical to the host-built tables:
    same sign everywhere, same source index wherever sign != 0."""
    import jax
    import auto_oo_tpu.ops.rdms as R

    for ncas in (2, 3):
        D = 1 << (2 * ncas)
        for utd in (False, True):
            for s in (0, 1):
                t_src, t_sign = R._epq_tables_spin(ncas, utd, s,
                                                   "float64")
                old = R._ONTHEFLY_MIN_DIM
                try:
                    R._ONTHEFLY_MIN_DIM = 1
                    f_src, f_sign = jax.jit(
                        lambda: R._epq_maps_spin(ncas, utd, s, D,
                                                 jnp.float64))()
                finally:
                    R._ONTHEFLY_MIN_DIM = old
                t_src, t_sign, f_src, f_sign = map(
                    np.asarray, (t_src, t_sign, f_src, f_sign))
                assert np.array_equal(t_sign, f_sign), (ncas, utd, s)
                live = t_sign != 0.0
                assert np.array_equal(t_src[live], f_src[live]), \
                    (ncas, utd, s)


def test_onthefly_rdms_match_table_rdms():
    """Full RDM extraction through the on-the-fly path equals the table
    path on a real ansatz state."""
    import auto_oo_tpu.ops.rdms as R
    pqc = Parameterized_circuit(2, 2, ansatz="ucc")
    psi = pqc.state(jnp.array([0.4217]))
    g_t, G_t = R.rdms_from_state(psi, 2)
    old = R._ONTHEFLY_MIN_DIM
    try:
        R._ONTHEFLY_MIN_DIM = 1
        g_f, G_f = R.rdms_from_state(psi, 2)
    finally:
        R._ONTHEFLY_MIN_DIM = old
    assert np.allclose(np.asarray(g_t), np.asarray(g_f), atol=1e-14)
    assert np.allclose(np.asarray(G_t), np.asarray(G_f), atol=1e-14)


@pytest.mark.parametrize("ncas,nelecas", [(4, 3), (4, 4)])
def test_sector_unrestricted_rdms_match_full_space(ncas, nelecas):
    """Unrestricted RDMs computed in the sector basis (cross-sector
    pair-annihilation maps, VERDICT r2 item 5) equal the full-space
    kernel on the same physical state."""
    pqc_s = Parameterized_circuit(ncas, nelecas, ansatz="np_fabric",
                                  n_layers=1, sector=True)
    pqc_f = Parameterized_circuit(ncas, nelecas, ansatz="np_fabric",
                                  n_layers=1)
    theta = 0.07 * jnp.arange(pqc_s.theta_shape, dtype=jnp.float64) + 0.1
    g_s, G_s = pqc_s.get_rdms(theta, restricted=False)
    g_f, G_f = pqc_f.get_rdms(theta, restricted=False)
    assert np.allclose(np.asarray(g_s), np.asarray(g_f), atol=1e-12)
    assert np.allclose(np.asarray(G_s), np.asarray(G_f), atol=1e-12)


def test_sector_unrestricted_from_state_api():
    """get_rdms_from_state(..., restricted=False) accepts sector vectors."""
    pqc_s = Parameterized_circuit(3, 2, ansatz="ucc", sector=True)
    pqc_f = Parameterized_circuit(3, 2, ansatz="ucc")
    theta = 0.3 * jnp.ones(pqc_s.theta_shape, dtype=jnp.float64)
    g_s, G_s = pqc_s.get_rdms_from_state(pqc_s.state(theta),
                                         restricted=False)
    g_f, G_f = pqc_f.get_rdms_from_state(pqc_f.state(theta),
                                         restricted=False)
    assert np.allclose(np.asarray(g_s), np.asarray(g_f), atol=1e-12)
    assert np.allclose(np.asarray(G_s), np.asarray(G_f), atol=1e-12)


def test_reorder_unrestricted_rdms_roundtrip_and_oracle():
    """Sector circuits fix the interleaved convention; utd-ordered
    unrestricted RDMs come from the exact mode permutation
    (ops/fermion.reorder_unrestricted_rdms) — pinned against the
    full-space utd extraction (reference active_space.py:29-57 ordering
    flag) and as an exact round trip."""
    from auto_oo_tpu.ops import fermion, rdms as R

    ncas = 2
    rng = np.random.RandomState(5)
    psi = rng.randn(1 << (2 * ncas))
    psi = jnp.asarray(psi / np.linalg.norm(psi))
    g_i, G_i = R.rdms_from_state_unrestricted(psi, ncas)
    nm = 2 * ncas
    g_p, G_p = fermion.reorder_unrestricted_rdms(g_i, G_i, ncas)
    # round trip is exact
    g_b, G_b = fermion.reorder_unrestricted_rdms(
        g_p, G_p, ncas, to_up_then_down=False)
    assert float(jnp.max(jnp.abs(g_b - g_i))) == 0.0
    assert float(jnp.max(jnp.abs(G_b - G_i))) == 0.0
    # oracle: <a^dag_P a_Q> computed directly from sparse mode operators
    # in the utd labeling equals the permuted gamma
    from auto_oo_tpu.ops.fermion import mode_of
    import scipy.sparse as sp

    def a_op(mode, nm):
        # annihilation with JW signs on nm modes (dense small space)
        D = 1 << nm
        rows, cols, vals = [], [], []
        for det in range(D):
            if (det >> (nm - 1 - mode)) & 1:
                out = det ^ (1 << (nm - 1 - mode))
                sgn = (-1) ** bin(det >> (nm - mode)).count("1")
                rows.append(out); cols.append(det); vals.append(sgn)
        return sp.csr_matrix((vals, (rows, cols)), shape=(D, D))

    psi_np = np.asarray(psi)
    for P in range(nm):
        for Q in range(nm):
            # utd mode labels mapped onto the interleaved state
            aP = a_op(mode_of(P % ncas, P // ncas, ncas, False), nm)
            aQ = a_op(mode_of(Q % ncas, Q // ncas, ncas, False), nm)
            val = psi_np @ (aP.T.conj() @ (aQ @ psi_np))
            assert abs(val - float(g_p[P, Q])) < 1e-12


def test_sector_rejects_up_then_down():
    """sector=True fixes the interleaved convention loudly (the two
    orderings select different determinant sets for one sector)."""
    from auto_oo_tpu.models import Parameterized_circuit

    full = np.zeros(16)
    full[3] = 1.0
    fn = lambda th: jnp.asarray(full)
    fn.theta_shape = 1
    with pytest.raises(ValueError, match="interleaved"):
        Parameterized_circuit(2, 2, ansatz=fn, up_then_down=True,
                              sector=True)
