"""Native (C++) ERI engine vs the numpy reference path, and the NWChem
basis parser.

Round 1 routed ERIs silently through the native kernel when g++ was
available (moldata/integrals.py:eri) with no direct equivalence test — a
native-path numerical regression would only have shown up as mysterious
energy drift.  These tests pin native == numpy element-wise on a
polarized-basis molecule (cc-pVDZ water: S, P and D shells, general
contractions).
"""

import numpy as np
import pytest

from auto_oo_tpu import native as _native
from auto_oo_tpu.moldata import integrals as I
from auto_oo_tpu.moldata.basis import build_shells, parse_nwchem, _CCPVDZ


def _water_shells(basis="cc-pvdz"):
    symbols = ["O", "H", "H"]
    coords = np.array([[0.0, 0.0, 0.0],
                       [0.0, 0.0, 1.808846],     # bohr
                       [1.751122, 0.0, -0.453549]])
    return build_shells(symbols, coords, basis)


def test_native_eri_matches_numpy_polarized():
    shells = _water_shells("cc-pvdz")
    G_native = _native.eri_cart(shells)
    if G_native is None:
        pytest.skip("native ERI engine unavailable (no g++)")
    G_numpy = I._eri_cart_numpy(shells)
    assert G_native.shape == G_numpy.shape
    scale = np.abs(G_numpy).max()
    assert np.abs(G_native - G_numpy).max() < 1e-13 * max(scale, 1.0)


def test_native_eri_matches_numpy_sto3g():
    shells = _water_shells("sto-3g")
    G_native = _native.eri_cart(shells)
    if G_native is None:
        pytest.skip("native ERI engine unavailable (no g++)")
    G_numpy = I._eri_cart_numpy(shells)
    assert np.abs(G_native - G_numpy).max() < 1e-13


# Official cc-pVDZ entries for H and O in NWChem format (Basis Set
# Exchange download format) — exercises general contractions and comments.
_NWCHEM_TEXT = """
# cc-pVDZ  EMSL Basis Set Exchange
BASIS "ao basis" PRINT
H    S
     13.0100000              0.0196850
      1.9620000              0.1379770
      0.4446000              0.4781480
      0.1220000              0.5012400
H    S
      0.1220000              1.0000000
H    P
      0.7270000              1.0000000
O    S
  11720.0000000              0.0007100             -0.0001600
   1759.0000000              0.0054700             -0.0012630
    400.8000000              0.0278370             -0.0062670
    113.7000000              0.1048000             -0.0257160
     37.0300000              0.2830620             -0.0709240
     13.2700000              0.4487190             -0.1654110
      5.0250000              0.2709520             -0.1169550
      1.0130000              0.0154580              0.5573680
      0.3023000             -0.0025850              0.5727590
O    S
      0.3023000              1.0000000
O    P
     17.7000000              0.0430180
      3.8540000              0.2289130
      1.0460000              0.5087280
      0.2753000              0.4605310
O    P
      0.2753000              1.0000000
O    D
      1.1850000              1.0000000
END
"""


def test_parse_nwchem_matches_embedded_ccpvdz():
    parsed = parse_nwchem(_NWCHEM_TEXT)
    for sym in ("H", "O"):
        assert len(parsed[sym]) == len(_CCPVDZ[sym]), sym
        for (l_a, e_a, c_a), (l_b, e_b, c_b) in zip(parsed[sym],
                                                    _CCPVDZ[sym]):
            assert l_a == l_b
            assert np.allclose(e_a, e_b)
            assert np.allclose(c_a, c_b)


def test_parse_nwchem_basis_runs_rhf():
    """A molecule built from the PARSED basis gives the same RHF energy as
    the embedded named basis (full pipeline through a custom basis dict)."""
    from auto_oo_tpu import Moldata
    geo = "O 0 0 0; H 0.9572 0 0; H -0.239987 0.926627 0"
    mol_named = Moldata(geo, "cc-pvdz")
    mol_named.run_rhf()
    mol_parsed = Moldata(geo, parse_nwchem(_NWCHEM_TEXT))
    mol_parsed.run_rhf()
    assert abs(mol_named.hf.e_tot - mol_parsed.hf.e_tot) < 1e-12
