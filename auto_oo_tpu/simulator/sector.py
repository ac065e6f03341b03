"""Particle-sector simulation: run the circuit in the (n_alpha, n_beta)
determinant basis instead of the full 2^(2 ncas) space.

Every supported ansatz conserves (N_alpha, N_beta), so amplitudes outside
the Hartree-Fock sector are exactly zero: at (10e,10o) only
C(10,5)^2 = 63,504 of the 2^20 amplitudes are physical (16x smaller, and
combinatorially better with size).  Because the whole stack is built on
index maps, sector projection is a HOST-SIDE reindexing:

* gate pair tables keep only pairs with both endpoints in the sector and
  remap them to sector ranks -> the SAME GateProgram.apply runs on the
  small vector;
* E_pq gather maps restrict/remap the same way (E_pq conserves the
  sector), so the RDM gram and the Hamiltonian-apply kernel work
  unchanged on sector vectors.

Sector mode is fully wired into the stack: ``Parameterized_circuit(...,
sector=True)`` runs the OO_pqc Newton core, the sharded parallel paths
and the Berry-phase workflow on the sector vector (see
simulator/circuit.py:90-102 and tests/test_sector.py).
"""

import numpy as np
import jax.numpy as jnp

from ..ops import fermion
from .program import GateProgram


def sector_basis_and_rank(ncas, nelecas):
    """(basis, rank): determinant indices of the (n_alpha, n_beta) sector
    (ascending) and the full-space -> sector-rank inverse map (-1 outside
    the sector)."""
    basis = fermion.sector_basis(ncas, nelecas)
    D = 1 << (2 * ncas)
    rank = np.full(D, -1, dtype=np.int64)
    rank[basis] = np.arange(len(basis))
    return basis, rank


def project_program(program, ncas, nelecas):
    """GateProgram over the sector basis: pair tables restricted to pairs
    with both endpoints in the sector (gates conserve the sector, so a
    pair is either fully inside or fully outside) and remapped to ranks.

    Returns (sector_program, basis)."""
    basis, rank = sector_basis_and_rank(ncas, nelecas)
    Ds = len(basis)
    n = program.half.shape[0]
    new_rows = []
    max_pairs = 1
    for g in range(n):
        ia, ib = program.ia[g], program.ib[g]
        mask = program.mask[g] > 0
        inside = mask & (rank[ia] >= 0)
        # conservation sanity: an in-sector source implies in-sector dest
        assert np.all(rank[ib[inside]] >= 0), \
            "gate pair crosses the particle sector"
        row = (rank[ia[inside]], rank[ib[inside]],
               program.sign[g][inside], program.half[g],
               program.param[g])
        max_pairs = max(max_pairs, row[0].size)
        new_rows.append(row)

    class _G:
        pass

    gates = []
    for ia, ib, sign, half, param in new_rows:
        g = _G()
        g.ia = ia.astype(np.int32)
        g.ib = ib.astype(np.int32)
        g.sign = sign
        g.half = float(half)
        g.param = int(param)
        gates.append(g)
    init_idx = int(rank[program.init_idx])
    assert init_idx >= 0, "initial state outside the sector"
    return GateProgram(gates, program.n_params, init_idx, Ds), basis


def sector_epq_maps(ncas, nelecas, up_then_down=False):
    """(src, sign) E_pq gather maps over the sector basis, shapes
    (2, ncas^2, D_sector): the same maps ops/rdms.py uses, restricted and
    rank-remapped (E_pq conserves the sector).

    Computed DIRECTLY on the basis determinants (O(ncas^2 D_sector) work
    and memory; building the full 4^ncas tables first took ~100 s at
    (10e,10o)).  Ranks come from searchsorted on the sorted basis, so no
    4^ncas-sized array exists anywhere."""
    basis = fermion.sector_basis(ncas, nelecas)
    nm = 2 * ncas
    n2 = ncas * ncas
    Ds = len(basis)
    src = np.zeros((2, n2, Ds), dtype=np.int32)
    sign = np.zeros((2, n2, Ds), dtype=np.float64)
    idx = np.arange(Ds, dtype=np.int64)
    for s in range(2):
        for p in range(ncas):
            for q in range(ncas):
                P = fermion.mode_of(p, s, ncas, up_then_down)
                Q = fermion.mode_of(q, s, ncas, up_then_down)
                k = p * ncas + q
                if P == Q:
                    src[s, k] = idx
                    sign[s, k] = fermion.occ_bit(basis, P, nm)
                    continue
                bitP = 1 << (nm - 1 - P)
                bitQ = 1 << (nm - 1 - Q)
                valid = ((basis & bitP) != 0) & ((basis & bitQ) == 0)
                source = np.where(valid, basis ^ bitP ^ bitQ, basis[0])
                sq = fermion._parity_below(source, Q, nm)
                mid = source ^ bitQ
                sp = fermion._parity_below(mid, P, nm)
                pos = np.searchsorted(basis, source)
                assert np.all(basis[pos[valid]] == source[valid]), \
                    "E_pq left the sector"
                src[s, k] = np.where(valid, pos, 0)
                sign[s, k] = np.where(valid, (sq * sp).astype(float), 0.0)
    return jnp.asarray(src), jnp.asarray(sign)


def rdms_from_sector_state(psi_s, maps):
    """Spin-summed restricted (gamma, Gamma) from a sector-basis
    statevector, via the same Phi-gram pipeline as ops/rdms.py."""
    src, sign = maps
    n2 = src.shape[1]
    ncas = int(round(n2 ** 0.5))
    sgn = sign.astype(psi_s.dtype)
    phi = psi_s[src[0]] * sgn[0] + psi_s[src[1]] * sgn[1]
    gamma = (phi @ psi_s).reshape(ncas, ncas)
    corr = (phi @ phi.T).reshape(ncas, ncas, ncas, ncas)
    epq_ers = jnp.transpose(corr, (1, 0, 2, 3))
    delta = jnp.eye(ncas, dtype=psi_s.dtype)
    Gamma = epq_ers - jnp.einsum("qr,ps->pqrs", delta, gamma)
    return gamma, Gamma
