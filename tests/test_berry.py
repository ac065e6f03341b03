"""Berry-phase module tests.

The reference only exercised this workflow in a notebook
(Tutorial_Berry_phase.ipynb); here the library API is tested directly:
state transfer between orbital bases (self-consistency against FCI) and a
small loop around the formaldimine conical intersection.
"""

import numpy as np
import pytest

import auto_oo_tpu
from auto_oo_tpu import Moldata, get_formal_geo
from auto_oo_tpu.models import Parameterized_circuit
from auto_oo_tpu.models.berry import (transfer_state,
                                      transfer_state_host,
                                      BerryPhaseLoop)
from auto_oo_tpu.moldata import fci as _fci


def test_transfer_state_fci_self_consistency():
    """Transferring the CAS ground state from MO basis A to basis B must
    reproduce the ground state computed directly in basis B (up to global
    sign)."""
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    mol.run_rhf()
    ncas, nelecas = 2, 2
    occ, act, virt = mol.get_active_space_idx(ncas, nelecas)

    def cas_ground(C):
        h1, g2 = mol._mo_ints(C)
        core, h_eff, g_act = _fci.active_space_integrals_np(h1, g2, occ,
                                                            act)
        res = _fci.solve_cas(core + mol.nuc, h_eff, 0.5 * g_act, ncas,
                             nelecas, n_roots=1)
        return res.e_tot[0], res.vecs_full[0]

    C_a = mol.hf.mo_coeff
    # rotate the active orbitals by a nontrivial angle
    from scipy.linalg import expm as sexpm
    k = np.zeros((mol.nao, mol.nao))
    k[act[0], act[1]] = 0.3
    k[act[1], act[0]] = -0.3
    C_b = C_a @ sexpm(-k)

    e_a, v_a = cas_ground(C_a)
    e_b, v_b = cas_ground(C_b)
    assert abs(e_a - e_b) < 1e-10  # active-active rotation is gauge

    # OAO-MO overlap matrix between the two bases
    from auto_oo_tpu.models import mo_ao_to_mo_oao
    oao_a = mo_ao_to_mo_oao(C_a, mol.overlap)
    oao_b = mo_ao_to_mo_oao(C_b, mol.overlap)
    mo_atob = oao_a.T @ oao_b
    moved = transfer_state(v_a, mo_atob, act, ncas)
    overlap = np.vdot(v_b.astype(complex), moved)
    assert abs(abs(overlap) - 1.0) < 1e-8


def test_transfer_device_matches_host_oracle():
    """The device Givens/polar transfer equals the scipy expm_multiply
    oracle for orthogonal, reflecting (det < 0) and non-orthogonal M."""
    rng = np.random.RandomState(0)
    ncas = 3
    act = np.arange(ncas)
    D = 1 << (2 * ncas)
    cases = [
        np.linalg.qr(rng.randn(ncas, ncas))[0],
        np.linalg.qr(rng.randn(ncas, ncas))[0] * np.array([1, 1, -1]),
        (np.linalg.qr(rng.randn(ncas, ncas))[0]
         + 0.05 * rng.randn(ncas, ncas)),
        np.diag([-1.0, -1.0, 1.0]),
    ]
    for M in cases:
        psi = rng.randn(D)
        psi /= np.linalg.norm(psi)
        ref = transfer_state_host(psi, M.T, act, ncas)
        dev = np.asarray(transfer_state(psi, M.T, act, ncas),
                         dtype=complex)
        assert np.max(np.abs(dev - ref)) < 1e-12


def test_transfer_sector_basis():
    """Sector-basis transfer equals the full-space transfer projected."""
    from auto_oo_tpu.ops import fermion
    rng = np.random.RandomState(3)
    ncas, ne = 3, 4
    basis = fermion.sector_basis(ncas, ne)
    D = 1 << (2 * ncas)
    psi = np.zeros(D)
    psi[basis] = rng.randn(len(basis))
    psi /= np.linalg.norm(psi)
    M = (np.linalg.qr(rng.randn(ncas, ncas))[0]
         + 0.03 * rng.randn(ncas, ncas))
    ref = transfer_state_host(psi, M.T, np.arange(ncas), ncas)
    dev = np.asarray(transfer_state(psi[basis], M.T, np.arange(ncas),
                                    ncas, dets=basis), dtype=complex)
    assert np.max(np.abs(dev - ref[basis])) < 1e-12


def _ci_loop_geos(n_points):
    ts = np.linspace(0, 1, n_points)
    return [get_formal_geo(130 + 10 * np.cos(2 * np.pi * t + np.pi / 20),
                           89.9 + 10 * np.sin(2 * np.pi * t + np.pi / 20))
            for t in ts]


@pytest.mark.slow
def test_berry_phase_around_conical_intersection():
    """Loop around the formaldimine CI: Berry phase ~ +-pi
    (notebook cells 10-33; red loop origin (130, 89.9), radius 10).

    Tracking converges each loop point (up to 12 NR steps, dE < 1e-10)
    so the state stays on the adiabatic ground-state branch; with a
    21-point loop the geometry steps are small enough that every
    successive overlap magnitude is within 0.05 of 1."""
    geos = _ci_loop_geos(21)
    pqc = Parameterized_circuit(2, 2, ansatz="np_fabric", n_layers=1)
    loop = BerryPhaseLoop(geos, "sto-3g", 2, 2, pqc,
                          freeze_active=True).run(
        conv_tol=1e-10, track_steps=12, track_tol=1e-10)
    ov = loop.overlaps()
    assert np.all(np.abs(np.abs(ov) - 1.0) < 0.05)
    phase = loop.berry_phase()
    assert abs(abs(phase) - np.pi) < 0.05


@pytest.mark.slow
def test_berry_phase_batched_tracking():
    """run_batched: the SAME conical-intersection loop with all tracking
    geometries advancing CONCURRENTLY (GeometryBatch dp axis) still
    measures Berry phase ~ +-pi."""
    geos = _ci_loop_geos(21)
    pqc = Parameterized_circuit(2, 2, ansatz="np_fabric", n_layers=1)
    loop = BerryPhaseLoop(geos, "sto-3g", 2, 2, pqc,
                          freeze_active=True).run_batched(
        conv_tol=1e-10, track_steps=12)
    ov = loop.overlaps()
    assert np.all(np.abs(np.abs(ov) - 1.0) < 0.05)
    phase = loop.berry_phase()
    assert abs(abs(phase) - np.pi) < 0.05


@pytest.mark.slow
def test_berry_phase_sector_mode():
    """The SAME conical-intersection loop run entirely in the particle
    sector basis (states, tracking and Thouless transfer all on sector
    vectors) reproduces the +-pi Berry phase."""
    geos = _ci_loop_geos(11)
    pqc = Parameterized_circuit(2, 2, ansatz="np_fabric", n_layers=1,
                                sector=True)
    loop = BerryPhaseLoop(geos, "sto-3g", 2, 2, pqc,
                          freeze_active=True).run(
        conv_tol=1e-10, track_steps=12, track_tol=1e-10)
    ov = loop.overlaps()
    assert np.all(np.abs(np.abs(ov) - 1.0) < 0.15)
    phase = loop.berry_phase()
    assert abs(abs(phase) - np.pi) < 0.05


@pytest.mark.slow
def test_berry_loop_6e6o_sector_smoke():
    """A (6e,6o) Berry tracking loop runs entirely in sector mode
    (D = C(6,3)^2 = 400 instead of 4,096): full optimization at the
    first point, adiabatic tracking + device Thouless transfer on sector
    vectors for the rest.  A short open arc must give successive
    overlaps that are real, positive and ~1.

    n_layers=2, not 1: after the GateFabric half-filled fix (the
    reference's redundant-elimination bug froze L=1 at (6e,6o) — see
    ops BASELINE round-4 sixth phase), the LIVE single-brick L=1 ansatz
    optimizes onto a shallow plateau ~51 mHa above CASSCF with
    gauge-degenerate basins, where tracked overlaps legitimately
    collapse (0.03 observed).  At L=2 (16 params, ~30 mHa gap) and with
    the exact-ansatz ucc oracle (99 params, overlaps 0.99997) tracking
    is well-conditioned; L=2 keeps the smoke under ~4 min."""
    geos = [get_formal_geo(140 + 0.25 * k, 80 + 0.25 * k)
            for k in range(3)]
    pqc = Parameterized_circuit(6, 6, ansatz="np_fabric", n_layers=2,
                                sector=True)
    loop = BerryPhaseLoop(geos, "sto-3g", 6, 6, pqc,
                          freeze_active=True).run(
        conv_tol=1e-9, max_iterations=30, track_steps=6,
        track_tol=1e-9)
    assert len(loop.energy_l) == 3
    assert np.all(np.isfinite(loop.energy_l))
    ov = loop.overlaps()
    # consecutive-geometry overlaps: real, positive, ~1 (the wrap
    # element is the 2->0 jump across the open arc — the geometries
    # span only 0.5 deg, so it is ~1 as well)
    assert np.all(ov.real > 0.97)
    assert np.all(np.abs(ov.imag) < 1e-10)


@pytest.mark.slow
def test_berry_hess_eig_iterative_matches_eigh():
    """The tracked lowest-Hessian-eigenvalue diagnostic (the conical-
    intersection observable, hess_eig_l) through a short Berry loop on
    the ITERATIVE Newton solver agrees with the 'eigh' path to the
    documented accuracy contract (~1% relative on clustered spectra,
    utils/newton_raphson.newton_step_pure docstring).  The TPU default
    routes n >= 128 Hessians through the iterative solver; forcing
    method='iterative' here pins the same code path on CPU."""
    geos = _ci_loop_geos(6)
    pqc = Parameterized_circuit(2, 2, ansatz="np_fabric", n_layers=1)
    runs = {}
    for method in ("eigh", "iterative"):
        loop = BerryPhaseLoop(geos, "sto-3g", 2, 2, pqc,
                              freeze_active=True,
                              newton_method=method).run(
            conv_tol=1e-10, track_steps=8, track_tol=1e-10)
        runs[method] = (np.asarray(loop.hess_eig_l),
                        np.asarray(loop.energy_l))
    eig_e, en_e = runs["eigh"]
    eig_i, en_i = runs["iterative"]
    # identical physics trajectory (the direction deltas are far below
    # the tracking tolerance) ...
    assert np.max(np.abs(en_i - en_e)) < 1e-8
    # ... and the eigenvalue observable within the documented ~1%
    scale = np.maximum(np.abs(eig_e), 1e-3)
    assert np.max(np.abs(eig_i - eig_e) / scale) < 2e-2, (eig_e, eig_i)
