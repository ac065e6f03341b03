from ..simulator.circuit import Parameterized_circuit
from .oo_energy import OO_energy, mo_ao_to_mo_oao
from .oo_pqc import OO_pqc
from .noisy_oo_pqc import Noisy_OO_pqc
from ..ops import rdms as _rdms


def s2(ncas, nelecas=None):
    """Dense S^2 matrix over the 2^(2 ncas) space (reference
    utils/active_space.py:243-248; the operator does not depend on
    nelecas, accepted for signature parity)."""
    return _rdms.s2_matrix(ncas)


def sz(ncas):
    """Dense S_z matrix (reference utils/active_space.py:250-253)."""
    return _rdms.sz_matrix(ncas)


def fermionic_cas_hamiltonian(c0, c1, c2, restricted=True,
                              up_then_down=False):
    """Active-space Hamiltonian H = c0 + sum c1 E_pq + sum c2 e_pqrs as a
    scipy sparse matrix over the 2^(2 ncas) statevector space.

    Capability mirror of reference utils/active_space.py:215-240 (which
    returned an OpenFermion FermionOperator); here the natural operator
    representation is the matrix in the simulator basis — use `.toarray()`
    for dense or keep sparse for matvecs."""
    if not restricted or up_then_down:
        raise NotImplementedError(
            "only restricted, interleaved-spin Hamiltonians supported")
    import numpy as np

    from ..moldata import fci as _fci
    c1 = np.asarray(c1)
    return _fci.build_cas_hamiltonian(float(np.asarray(c0)), c1,
                                      np.asarray(c2), c1.shape[0])


from .berry import BerryPhaseLoop  # noqa: E402

__all__ = [
    "Parameterized_circuit", "OO_energy", "OO_pqc", "Noisy_OO_pqc",
    "mo_ao_to_mo_oao", "s2", "sz", "fermionic_cas_hamiltonian",
    "BerryPhaseLoop",
]
