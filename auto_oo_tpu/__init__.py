"""auto_oo_tpu: TPU-native orbital-optimized VQE framework.

A ground-up JAX/XLA reimplementation of the capability surface of the
reference ``auto_oo`` package (orbital-optimized variational quantum
algorithms with exact hybrid gradients/Hessians and Berry-phase tracking),
self-contained: molecular integrals, reference solvers (RHF/FCI/CASSCF),
fermionic operator algebra and the statevector circuit simulator are all
in-repo (the reference delegated these to PySCF / OpenFermion / PennyLane).

Flat public namespace mirroring the reference __init__
(/root/reference/src/auto_oo/__init__.py:3-27).
"""

from . import config  # noqa: F401  (enables float64 before anything traces)

from .moldata import Moldata, Moldata_pyscf, ao_to_oao
from .utils import NewtonStep, get_formal_geo
from .ops.kappa import (
    vector_to_skew_symmetric,
    skew_symmetric_to_vector,
    non_redundant_indices,
)
from .ops.transforms import (
    int1e_transform,
    int2e_transform,
    molecular_hamiltonian_coefficients,
)
from .ops.linalg import expm

__all__ = [
    "Moldata", "Moldata_pyscf", "ao_to_oao",
    "NewtonStep", "get_formal_geo",
    "vector_to_skew_symmetric", "skew_symmetric_to_vector",
    "non_redundant_indices",
    "int1e_transform", "int2e_transform",
    "molecular_hamiltonian_coefficients", "expm",
    "uccd_circuit", "gatefabric_circuit",
]


def __getattr__(name):
    # Heavier modules are attached lazily to keep import light.
    if name in ("Parameterized_circuit", "OO_energy", "OO_pqc",
                "Noisy_OO_pqc", "mo_ao_to_mo_oao", "s2", "sz",
                "fermionic_cas_hamiltonian", "BerryPhaseLoop"):
        from . import models
        return getattr(models, name)
    if name in ("uccd_circuit", "gatefabric_circuit"):
        from .simulator import ansatze
        return getattr(ansatze, name)
    if name == "dirac_notation":
        from .simulator.circuit import dirac_notation
        return dirac_notation
    raise AttributeError(name)
