"""Operator-algebra tests (the reference stubbed this file out,
test/utils/test_active_space.py:14-15; here it is real): E_pq/e_pqrs
matrix identities, S^2/S_z spectra, Hamiltonian construction vs FCI.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import auto_oo_tpu
from auto_oo_tpu.ops import fermion
from auto_oo_tpu.models import s2, sz, fermionic_cas_hamiltonian


def test_epq_commutation_structure():
    """[E_pq, E_rs] = delta_qr E_ps - delta_sp E_rq (spin-summed su(n))."""
    ncas = 2
    E = [[fermion.epq_sparse(p, q, ncas).toarray() for q in range(ncas)]
         for p in range(ncas)]
    for p in range(ncas):
        for q in range(ncas):
            for r in range(ncas):
                for s in range(ncas):
                    comm = E[p][q] @ E[r][s] - E[r][s] @ E[p][q]
                    expect = np.zeros_like(comm)
                    if q == r:
                        expect += E[p][s]
                    if s == p:
                        expect -= E[r][q]
                    assert np.allclose(comm, expect)


def test_epqrs_definition():
    """e_pqrs = E_pq E_rs - delta_qr E_ps (reference
    utils/active_space.py:57-83)."""
    ncas = 2
    for p in range(2):
        for q in range(2):
            for r in range(2):
                for s in range(2):
                    lhs = fermion.epqrs_sparse(p, q, r, s, ncas).toarray()
                    rhs = (fermion.epq_sparse(p, q, ncas)
                           @ fermion.epq_sparse(r, s, ncas)).toarray()
                    if q == r:
                        rhs -= fermion.epq_sparse(p, s, ncas).toarray()
                    assert np.allclose(lhs, rhs)


def test_s2_sz_spectra():
    """S^2 eigenvalues are s(s+1); S_z in half-integer steps; HF
    determinant is an S_z=0 eigenstate."""
    ncas = 2
    s2m = np.asarray(s2(ncas))
    szm = np.asarray(sz(ncas))
    assert np.allclose(s2m, s2m.T)
    w = np.linalg.eigvalsh(s2m)
    allowed = [s * (s + 1) for s in (0, 0.5, 1.0, 1.5, 2.0)]
    for val in w:
        assert min(abs(val - a) for a in allowed) < 1e-8
    idx, _ = fermion.hf_bitstring(ncas, 2)
    e = np.zeros(16)
    e[idx] = 1.0
    assert abs(e @ (szm @ e)) < 1e-12
    assert abs(e @ (s2m @ e)) < 1e-12  # closed-shell singlet


def test_cas_hamiltonian_vs_direct_expectation():
    """<HF| H |HF> equals the closed-shell energy expression
    2 sum h_ii + sum (2 J - K) over occupied actives."""
    rng = np.random.RandomState(0)
    ncas = 2
    h = rng.randn(ncas, ncas)
    h = h + h.T
    g = rng.randn(ncas, ncas, ncas, ncas)
    g = g + g.transpose(1, 0, 2, 3)
    g = g + g.transpose(0, 1, 3, 2)
    g = g + g.transpose(2, 3, 0, 1)
    c0 = 0.37
    H = fermionic_cas_hamiltonian(c0, h, 0.5 * g, restricted=True)
    idx, _ = fermion.hf_bitstring(ncas, 2)
    e = np.zeros(1 << (2 * ncas))
    e[idx] = 1.0
    e_hf = float(e @ (H @ e))
    # occupied active spatial orbital: 0
    expect = c0 + 2 * h[0, 0] + 2 * 0.5 * g[0, 0, 0, 0]
    assert abs(e_hf - expect) < 1e-10


def test_sector_basis_sizes():
    assert len(fermion.sector_basis(2, 2)) == 4  # C(2,1)^2
    assert len(fermion.sector_basis(3, 4)) == 9  # C(3,2)^2
    assert len(fermion.sector_basis(3, (2, 1))) == 9  # C(3,2)*C(3,1)
