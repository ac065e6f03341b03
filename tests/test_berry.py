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
from auto_oo_tpu.models.berry import transfer_state, BerryPhaseLoop
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


@pytest.mark.slow
def test_berry_phase_around_conical_intersection():
    """Loop around the formaldimine CI: Berry phase ~ +-pi
    (notebook cells 10-33; red loop origin (130, 89.9), radius 10,
    10-point loop as in the notebook, first == last).

    Tracking converges each loop point (up to 12 NR steps, dE < 1e-10)
    so the state stays on the adiabatic ground-state branch; the
    remaining sub-unit overlap magnitudes reflect the genuine rotation
    of the state between consecutive geometries."""
    n_points = 11
    ts = np.linspace(0, 1, n_points)
    geos = [get_formal_geo(130 + 10 * np.cos(2 * np.pi * t + np.pi / 20),
                           89.9 + 10 * np.sin(2 * np.pi * t + np.pi / 20))
            for t in ts]
    pqc = Parameterized_circuit(2, 2, ansatz="np_fabric", n_layers=1)
    loop = BerryPhaseLoop(geos, "sto-3g", 2, 2, pqc,
                          freeze_active=True).run(
        conv_tol=1e-10, track_steps=12, track_tol=1e-10)
    ov = loop.overlaps()
    # individual overlaps are near +-1 (adiabatic tracking); measured
    # magnitudes 0.89-1.0 on this loop
    assert np.all(np.abs(np.abs(ov) - 1.0) < 0.15)
    phase = loop.berry_phase()
    assert abs(abs(phase) - np.pi) < 0.05
