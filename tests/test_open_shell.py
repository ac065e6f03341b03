"""Open-shell (n_alpha, n_beta)-tuple support end-to-end.

The reference inherited tuple handling from PySCF/PennyLane in places
(SURVEY.md); here tuples flow through hf_bitstring / excitations /
sector programs / the FCI+CASSCF oracles / OO_pqc.  Test case: the
lowest TRIPLET of formaldimine in a (4o, (3a,1b)) active space.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from auto_oo_tpu import Moldata, get_formal_geo
from auto_oo_tpu.models import Parameterized_circuit, OO_pqc
from auto_oo_tpu.ops import fermion
from auto_oo_tpu.simulator import ansatze as A


def test_open_shell_hf_bitstring_and_excitations():
    idx, vec = fermion.hf_bitstring(4, (3, 1))
    # alpha on modes 0,2,4; beta on mode 1
    assert list(vec) == [1, 1, 1, 0, 1, 0, 0, 0]
    # closed-shell special case unchanged (golden-pinned enumeration)
    s_cs, d_cs = A.excitations(4, 8)
    s_cs2, d_cs2 = A.excitations((2, 2), 8)
    assert s_cs == s_cs2 and d_cs == d_cs2
    # open shell: spin conservation holds for every excitation
    singles, doubles = A.excitations((3, 1), 8)
    sz = [0.5 if i % 2 == 0 else -0.5 for i in range(8)]
    for r, p in singles:
        assert sz[p] == sz[r]
    for s, r, q, p in doubles:
        assert sz[p] + sz[q] == sz[r] + sz[s]
    assert len(singles) == 6 and len(doubles) == 9


@pytest.mark.slow
def test_open_shell_sector_basis_state():
    """Sector program of an open-shell UCC ansatz equals the full-space
    program restricted to the (3,1) sector."""
    pqc_f = Parameterized_circuit(4, (3, 1), ansatz="ucc",
                                  add_singles=True)
    pqc_s = Parameterized_circuit(4, (3, 1), ansatz="ucc",
                                  add_singles=True, sector=True)
    from math import comb
    assert pqc_s.program.dim == comb(4, 3) * comb(4, 1) == 16
    rng = np.random.RandomState(2)
    theta = jnp.asarray(0.3 * rng.randn(pqc_f.theta_shape))
    full = np.asarray(pqc_f.state(theta))
    sec = np.asarray(pqc_s.state(theta))
    basis = np.asarray(pqc_s.sector_basis)
    mask = np.ones(full.size, dtype=bool)
    mask[basis] = False
    assert np.all(full[mask] == 0.0)
    assert np.allclose(sec, full[basis], atol=1e-14)


@pytest.mark.slow
@pytest.mark.parametrize("sector", [False, True])
def test_open_shell_oo_vqe_matches_casscf(sector):
    """Triplet OO-VQE converges to the open-shell CASSCF oracle, and the
    optimized state is spin-pure (<S^2> = 2)."""
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    mol.run_casscf(4, (3, 1))
    assert mol.casscf.converged
    pqc = Parameterized_circuit(4, (3, 1), ansatz="ucc", add_singles=True,
                                sector=sector)
    oo = OO_pqc(pqc, mol, 4, (3, 1), freeze_active=True)
    el, thl, *_ = oo.full_optimization(pqc.init_zeros(), verbose=0)
    assert abs(el[-1] - mol.casscf.e_tot) < 1e-8
    s2 = float(pqc.s2_expectation(thl[-1]))
    assert abs(s2 - 2.0) < 1e-9
    assert pqc.sz_value() == 1.0


def test_open_shell_casci_spin():
    """Open-shell CASCI: singlet selection is auto-disabled and the
    lowest (3,1)-sector root is a triplet."""
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    mol.run_casci(4, (3, 1))
    assert abs(mol.casci.s2[0] - 2.0) < 1e-8


def test_rohf_matches_rhf_closed_shell():
    """ROHF with an empty open shell is exactly RHF (same Roothaan
    fixed point)."""
    from auto_oo_tpu.moldata.scf import RHF, ROHF
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    r = RHF(mol.mol).run()
    ro = ROHF(mol.mol).run()
    assert r.converged and ro.converged
    assert abs(r.e_tot - ro.e_tot) < 1e-9


def test_cation_doublet_oo_vqe_matches_casscf():
    """The literal BASELINE.json north-star configuration: formaldimine
    CATION, (3e,3o) doublet active space.  Charge/spin flow through
    Mole -> ROHF -> CASCI/CASSCF oracles -> OO_pqc; the optimized state
    is spin-pure (<S^2> = 3/4) and matches open-shell CASSCF."""
    mol = Moldata(get_formal_geo(140, 80), "sto-3g", charge=1, spin=1)
    assert mol.mol.nelec == (8, 7)
    mol.run_casci(3, (2, 1), n_roots=1)
    assert abs(mol.casci.s2[0] - 0.75) < 1e-8
    mol.run_casscf(3, (2, 1))
    assert mol.casscf.converged
    pqc = Parameterized_circuit(3, (2, 1), ansatz="ucc", add_singles=True,
                                sector=True)
    oo = OO_pqc(pqc, mol, 3, (2, 1), freeze_active=True)
    el, thl, *_ = oo.full_optimization(pqc.init_zeros(), verbose=0)
    assert abs(el[-1] - mol.casscf.e_tot) < 1e-8
    assert abs(float(pqc.s2_expectation(thl[-1])) - 0.75) < 1e-9
