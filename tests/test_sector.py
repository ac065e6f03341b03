"""Particle-sector simulation: sector-projected programs and RDM maps
must reproduce the full-space results exactly (simulator/sector.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from auto_oo_tpu.models import Parameterized_circuit
from auto_oo_tpu.simulator import sector as S


@pytest.mark.parametrize("ncas,nelecas,ansatz,kw", [
    (2, 2, "ucc", {}),
    (2, 2, "np_fabric", {"n_layers": 1}),
    (3, 4, "np_fabric", {"n_layers": 2}),
    (4, 4, "ucc", {"add_singles": True}),
])
def test_sector_state_equals_full_space(ncas, nelecas, ansatz, kw):
    pqc = Parameterized_circuit(ncas, nelecas, ansatz=ansatz, **kw)
    prog_s, basis = S.project_program(pqc.program, ncas, nelecas)
    rng = np.random.RandomState(1)
    theta = jnp.asarray(0.2 * rng.randn(pqc.theta_shape))
    full = np.asarray(pqc.state(theta))
    psi_s = np.asarray(prog_s.apply(
        jnp.asarray(pqc._expand_theta(jnp.ravel(theta)))))
    # amplitudes outside the sector are exactly zero
    mask = np.ones(full.size, dtype=bool)
    mask[basis] = False
    assert np.all(full[mask] == 0.0)
    assert np.allclose(psi_s, full[basis], atol=1e-14)
    # size win
    assert prog_s.dim == len(basis) < full.size


def test_sector_rdms_equal_full_space():
    ncas, nelecas = 3, 4
    pqc = Parameterized_circuit(ncas, nelecas, ansatz="np_fabric",
                                n_layers=2)
    prog_s, basis = S.project_program(pqc.program, ncas, nelecas)
    maps = S.sector_epq_maps(ncas, nelecas)
    theta = jnp.asarray(0.1 * np.arange(pqc.theta_shape))
    psi_s = prog_s.apply(jnp.asarray(pqc._expand_theta(theta)))
    g_s, G_s = S.rdms_from_sector_state(psi_s, maps)
    g_f, G_f = pqc.get_rdms(theta)
    assert np.allclose(np.asarray(g_s), np.asarray(g_f), atol=1e-13)
    assert np.allclose(np.asarray(G_s), np.asarray(G_f), atol=1e-13)


def test_sector_rdms_complex_state():
    """rdms_from_sector_state must conjugate the bra (a COMPLEX sector
    state, e.g. from a custom ansatz, gave wrong RDMs before): compare
    against the full-space pipeline on the embedded vector."""
    from auto_oo_tpu.ops import rdms as _rdms

    ncas, nelecas = 3, 4
    basis, _ = S.sector_basis_and_rank(ncas, nelecas)
    maps = S.sector_epq_maps(ncas, nelecas)
    rng = np.random.RandomState(3)
    v = rng.randn(len(basis)) + 1j * rng.randn(len(basis))
    v = v / np.linalg.norm(v)
    psi_s = jnp.asarray(v, dtype=jnp.complex128)
    g_s, G_s = S.rdms_from_sector_state(psi_s, maps)
    assert np.isrealobj(np.asarray(g_s)) and np.isrealobj(np.asarray(G_s))
    full = np.zeros(1 << (2 * ncas), dtype=np.complex128)
    full[np.asarray(basis)] = v
    g_f, G_f = _rdms.rdms_from_state(jnp.asarray(full), ncas)
    assert np.allclose(np.asarray(g_s), np.asarray(g_f), atol=1e-13)
    assert np.allclose(np.asarray(G_s), np.asarray(G_f), atol=1e-13)


def test_sector_s2_matches_dense():
    """<S^2> from the sector S^- gather maps == the dense 4^ncas matrix
    quadratic form, for circuit states and for a random sector vector
    (incl. an open-shell (n_a, n_b) tuple sector)."""
    from auto_oo_tpu.ops import rdms as _rdms

    ncas, nelecas = 4, 4
    pqc = Parameterized_circuit(ncas, nelecas, ansatz="np_fabric",
                                n_layers=2, sector=True)
    pqc_d = Parameterized_circuit(ncas, nelecas, ansatz="np_fabric",
                                  n_layers=2)
    rng = np.random.RandomState(7)
    theta = jnp.asarray(0.3 * rng.randn(pqc.theta_shape))
    s2_s = float(pqc.s2_expectation(theta))
    s2_d = float(pqc_d.s2_expectation(theta))
    assert abs(s2_s - s2_d) < 1e-12
    # HF determinant is a singlet: S^2 = 0
    assert abs(float(pqc.s2_expectation(pqc.init_zeros()))) < 1e-12
    assert pqc.sz_value() == 0.0

    # random vector in an OPEN-SHELL sector (na=2, nb=1): compare to the
    # dense operator on the embedded full-space vector
    basis = S.sector_basis_and_rank(3, (2, 1))[0]
    maps = S.sector_sminus_maps(3, (2, 1))
    v = rng.randn(len(basis))
    v /= np.linalg.norm(v)
    s2_sector = float(S.s2_expectation_sector(jnp.asarray(v), maps, (2, 1)))
    full = np.zeros(1 << 6)
    full[np.asarray(basis)] = v
    s2_mat = np.asarray(_rdms.s2_matrix(3))
    s2_dense = float(full @ (s2_mat @ full))
    assert abs(s2_sector - s2_dense) < 1e-12


def test_sector_s2_no_target_sector():
    """All-alpha sector (n_b = ncas would overflow): S^- psi = 0 and
    S^2 = Sz^2 + ... reduces to sz(sz+1) for the stretched state."""
    basis = S.sector_basis_and_rank(2, (2, 0))[0]
    maps = S.sector_sminus_maps(2, (2, 0))
    v = np.zeros(len(basis))
    v[0] = 1.0
    s2 = float(S.s2_expectation_sector(jnp.asarray(v), maps, (2, 0)))
    # two aligned up spins: S = 1, S^2 = 2, and S^- maps exist
    # (target (1,1) is a valid sector)
    assert abs(s2 - 2.0) < 1e-12
    # genuinely absent target: (0, 2) sector has n_a = 0
    maps0 = S.sector_sminus_maps(2, (0, 2))
    assert maps0 is None
    v0 = np.zeros(len(S.sector_basis_and_rank(2, (0, 2))[0]))
    v0[0] = 1.0
    s2_0 = float(S.s2_expectation_sector(jnp.asarray(v0), maps0, (0, 2)))
    assert abs(s2_0 - 2.0) < 1e-12  # sz = -1: sz^2 - sz = 2


def test_sector_dimension_scaling():
    """The sector dimension is C(ncas, na) * C(ncas, nb) — the scaling
    argument of the README roadmap (16x at (10e,10o))."""
    from math import comb
    basis, rank = S.sector_basis_and_rank(10, 10)
    assert len(basis) == comb(10, 5) ** 2 == 63504
    assert (1 << 20) / len(basis) > 16


def test_sector_oo_vqe_matches_full_and_casscf():
    """End-to-end: OO-VQE with sector=True (the C(n,na)^2-dim simulator)
    reproduces the full-space optimization and the CASSCF oracle."""
    from auto_oo_tpu import Moldata, get_formal_geo
    from auto_oo_tpu.models import OO_pqc

    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    mol.run_casscf(2, 2)
    pqc_s = Parameterized_circuit(2, 2, ansatz="np_fabric", n_layers=1,
                                  sector=True)
    assert pqc_s.program.dim == 4  # C(2,1)^2 vs 4^2 = 16
    oo_s = OO_pqc(pqc_s, mol, 2, 2, freeze_active=True)
    el_s, *_ = oo_s.full_optimization(pqc_s.init_zeros())
    assert abs(el_s[-1] - mol.casscf.e_tot) < 1e-8


def test_sector_oo_vqe_34():
    from auto_oo_tpu import Moldata, get_formal_geo
    from auto_oo_tpu.models import OO_pqc

    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    mol.run_casscf(3, 4)
    pqc_s = Parameterized_circuit(3, 4, ansatz="np_fabric", n_layers=2,
                                  sector=True)
    assert pqc_s.program.dim == 9  # C(3,2)^2 vs 4^3 = 64
    oo_s = OO_pqc(pqc_s, mol, 3, 4, freeze_active=True)
    el_s, *_ = oo_s.full_optimization(pqc_s.init_zeros())
    assert abs(el_s[-1] - mol.casscf.e_tot) < 1e-8
