"""Host chemistry layer tests: golden values from the reference suite.

Mirrors /root/reference/test/test_moldata_pyscf.py: golden OAO matrix,
golden FCI energies, active-space partition; plus oracle self-checks the
reference delegated to PySCF.
"""

import numpy as np
import pytest

import auto_oo_tpu
from auto_oo_tpu import Moldata, ao_to_oao, get_formal_geo

# First two rows of the golden OAO coefficient matrix for formaldimine
# (alpha=140, phi=80) in sto-3g (reference test_moldata_pyscf.py:22-92).
OAO_ROWS01 = np.array([
    [1.02410942e+00, -1.44485996e-01, -1.22283337e-03, -6.92105527e-03,
     -1.22191185e-03, -1.68737940e-03, 1.75420166e-02, -1.64976921e-02,
     3.63410363e-04, 9.10179123e-05, 7.02693079e-04, 7.69242606e-04,
     2.45601209e-02],
    [-1.44485996e-01, 1.27102203e+00, -8.35510237e-03, 8.33090765e-02,
     1.47040840e-02, 2.05491933e-02, -1.74022090e-01, 2.16821224e-01,
     -3.37367753e-03, -8.62524345e-04, -1.09749430e-02, -1.16666054e-02,
     -3.66189921e-01],
])


@pytest.fixture(scope="module")
def formaldimine():
    return Moldata(get_formal_geo(140, 80), "sto-3g")


def test_ao_to_oao_golden(formaldimine):
    oao = formaldimine.oao_coeff
    assert oao.shape == (13, 13)
    assert np.allclose(oao[:2], OAO_ROWS01)
    # S^{-1/2} S S^{-1/2} = 1
    assert np.allclose(oao @ formaldimine.overlap @ oao, np.eye(13))


def test_fci_golden():
    """Reference test_moldata_pyscf.py:95-104 (tolerance limited by the
    7-digit embedded basis data)."""
    mol = Moldata("H 0 0 0; F 0 0 1.1", "sto-3g")
    mol.run_fci(n_roots=2)
    assert np.allclose(mol.fci.e_tot,
                       [-98.595121449139, -98.283973390815], atol=5e-7)
    assert np.all(mol.fci.s2 < 1e-6)


def test_active_space_idx(formaldimine):
    occ, act, virt = formaldimine.get_active_space_idx(3, 4)
    assert list(occ) == [0, 1, 2, 3, 4, 5]
    assert list(act) == [6, 7, 8]
    assert list(virt) == [9, 10, 11, 12]
    with pytest.raises(ValueError):
        formaldimine.get_active_space_idx(2, 1)


def test_rhf_matches_orbital_opt_golden(formaldimine):
    """RHF equals the reference orbital-optimization golden at the
    closed-shell RDM (reference test_oo_energy.py:396)."""
    formaldimine.run_rhf()
    assert abs(formaldimine.hf.e_tot - (-92.66372193556138)) < 5e-7


def test_casscf_matches_fixed_rdm_golden(formaldimine):
    """CASSCF(2,2) energy equals the reference fixed-RDM energy golden
    (reference test_oo_energy.py:298 used converged-CASSCF RDMs)."""
    formaldimine.run_casscf(2, 2)
    assert formaldimine.casscf.converged
    assert abs(formaldimine.casscf.e_tot - (-92.74923236954386)) < 5e-7


def test_casci_between_rhf_and_casscf(formaldimine):
    formaldimine.run_rhf()
    formaldimine.run_casci(2, 2)
    e_casci = formaldimine.casci.e_tot
    assert e_casci < formaldimine.hf.e_tot + 1e-12
    formaldimine.run_casscf(2, 2)
    assert formaldimine.casscf.e_tot < e_casci + 1e-12


def test_h2_rhf_textbook():
    mol = Moldata("H 0 0 0; H 0 0 0.74", "sto-3g")
    mol.run_rhf()
    assert abs(mol.hf.e_tot - (-1.1167593)) < 1e-6


def test_sa_casscf(formaldimine):
    """State-averaged CASSCF (weights [0.5, 0.5], reference
    moldata_pyscf.py:96-105): the SA energy lies between the two state
    energies and above the ground-state CASSCF energy."""
    formaldimine.run_casscf(2, 2)
    formaldimine.run_sa_casscf(2, 2)
    e_sa = formaldimine.sa_casscf.e_tot
    e_gs = formaldimine.casscf.e_tot
    assert e_sa > e_gs - 1e-10
    res = formaldimine.sa_casscf._last_fci
    assert len(res.e_tot) == 2
    assert res.e_tot[0] - 1e-9 <= e_sa <= res.e_tot[1] + 1e-9


def test_h2o_rhf_ccpvdz_literature():
    """External cross-validation of the exact embedded cc-pVDZ data AND
    the in-house integral engine + RHF: the literature HF/cc-pVDZ energy
    of water at the experimental geometry is -76.026799 Ha (CCCBDB)."""
    mol = Moldata("O 0 0 0; H 0.9572 0 0; H -0.239987 0.926627 0",
                  "cc-pvdz")
    mol.run_rhf()
    assert abs(mol.hf.e_tot - (-76.026799)) < 5e-6


def test_h2_rhf_ccpvdz_literature():
    """HF/cc-pVDZ for H2 at 0.7414 A: literature -1.128715 Ha."""
    mol = Moldata("H 0 0 0; H 0 0 0.7414", "cc-pvdz")
    mol.run_rhf()
    assert abs(mol.hf.e_tot - (-1.128715)) < 5e-6


@pytest.mark.slow
def test_ccpvdz_casscf_north_star():
    """cc-pVDZ (2e,2o) north star: full_optimization == CASSCF e_tot
    (reference test_oo_pqc.py:157-185 ran this in sto-3g AND cc-pvdz;
    the basis data itself is externally validated above)."""
    import jax.numpy as jnp
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc

    mol = Moldata(get_formal_geo(140, 80), "cc-pvdz")
    mol.run_casscf(2, 2)
    pqc = Parameterized_circuit(2, 2, ansatz="np_fabric", n_layers=1)
    oo = OO_pqc(pqc, mol, 2, 2, freeze_active=True)
    energy_l, *_ = oo.full_optimization(pqc.init_zeros())
    assert abs(energy_l[-1] - mol.casscf.e_tot) < 1e-8


# ---------------------------------------------------------------------------
# Third-row STO-3G (Na-Ar) and 6-31G breadth (round-4 coverage items)
# ---------------------------------------------------------------------------

def test_sto3g_third_row_tables():
    """The embedded third-row STO-3G construction must reproduce the
    Basis Set Exchange tables: every BSE exponent is a universal-fit
    value times zeta^2.  Literature fixture: the sulfur BSE block
    (STO-3G, basissetexchange.org) — all nine exponents must factor as
    zeta^2 x universal with the embedded zetas (15.47, 5.79, 2.05)."""
    from auto_oo_tpu.moldata import basis as B

    shells = B.element_shells("S", "sto-3g")
    exps = {(l, i): e for l, es, _ in shells
            for i, e in enumerate(es) for l in [l]}
    bse_s = {
        # (shell index among S-type, primitive) -> BSE exponent
        "1s": [533.1257359, 97.1095183, 26.28162542],
        "2sp": [33.32975173, 7.745117521, 2.518952599],
        "3sp": [2.029194274, 0.5661400518, 0.2215833792],
    }
    s_shells = [sh for sh in shells if sh[0] == "S"]
    for (name, ref), (_, es, _) in zip(bse_s.items(), s_shells):
        assert np.allclose(es, ref, rtol=2e-6), (name, es, ref)


def test_h2s_golden():
    """Third-row molecule golden: H2S RHF/STO-3G at the experimental
    geometry (r = 1.3356 A, angle 92.11 deg).  Literature STO-3G value
    ~ -394.3116 Ha (Hehre-Ditchfield-Stewart-Pople era tabulations);
    pinned here to our 1e-9-reproducible digits."""
    import math
    r, ang = 1.3356, math.radians(92.11)
    geo = (f"S 0 0 0; H {r} 0 0; "
           f"H {r * math.cos(ang)} {r * math.sin(ang)} 0")
    mol = Moldata(geo, "sto-3g")
    mol.run_rhf()
    assert abs(mol.hf.e_tot - (-394.311556054)) < 1e-6
    # CASCI regression on top of the RHF orbitals
    mol.run_casci(3, 4)
    assert abs(mol.casci.e_tot - (-394.316722240)) < 1e-6


def test_sto3g_atoms_literature():
    """Closed-shell atomic RHF/STO-3G totals vs published values
    (Hehre, Stewart & Pople tabulations): Ne -126.60452, Mg -197.00736,
    Ar -521.18582."""
    for sym, ref in [("Ne", -126.60452), ("Mg", -197.00736),
                     ("Ar", -521.18582)]:
        m = Moldata(f"{sym} 0 0 0", "sto-3g")
        m.run_rhf()
        assert abs(m.hf.e_tot - ref) < 2e-4, (sym, m.hf.e_tot)


def test_631g_h2_and_ordering():
    """6-31G: H2 RHF at 0.7414 A (-1.12673, split-valence literature
    range) and the variational ordering STO-3G > 6-31G > cc-pVDZ for H2
    and H2O (a basis-data sanity net: corrupted tables break it)."""
    h2 = {}
    for b in ["sto-3g", "6-31g", "cc-pvdz"]:
        m = Moldata("H 0 0 0; H 0 0 0.7414", b)
        m.run_rhf()
        h2[b] = m.hf.e_tot
    assert abs(h2["6-31g"] - (-1.126734)) < 5e-5
    assert h2["sto-3g"] > h2["6-31g"] > h2["cc-pvdz"]
    h2o = {}
    for b in ["sto-3g", "6-31g", "cc-pvdz"]:
        m = Moldata("O 0 0 0; H 0.9572 0 0; H -0.239987 0.926627 0", b)
        m.run_rhf()
        h2o[b] = m.hf.e_tot
    # H2O RHF/6-31G at the experimental geometry: -75.98400 (literature)
    assert abs(h2o["6-31g"] - (-75.98400)) < 5e-4
    assert h2o["sto-3g"] > h2o["6-31g"] > h2o["cc-pvdz"]


@pytest.mark.slow
def test_631g_oo_vqe_north_star():
    """OO-VQE north star in 6-31G: full_optimization == CASSCF e_tot for
    formaldimine (2e,2o)."""
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc

    mol = Moldata(get_formal_geo(140, 80), "6-31g")
    mol.run_casscf(2, 2)
    pqc = Parameterized_circuit(2, 2, ansatz="np_fabric", n_layers=1)
    oo = OO_pqc(pqc, mol, 2, 2, freeze_active=True)
    energy_l, *_ = oo.full_optimization(pqc.init_zeros())
    assert abs(energy_l[-1] - mol.casscf.e_tot) < 1e-8
