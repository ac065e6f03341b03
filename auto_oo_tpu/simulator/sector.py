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
    # sign values are -1/0/+1: int8 keeps the (2, ncas^2, D_sector)
    # tables 8x smaller (1.2 GB instead of 9.8 GB at (12e,12o)); every
    # consumer casts to the statevector dtype at use
    sign = np.zeros((2, n2, Ds), dtype=np.int8)
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
                sign[s, k] = np.where(valid, sq * sp, 0)
    return jnp.asarray(src), jnp.asarray(sign)


def _nelec_split(nelecas):
    if isinstance(nelecas, (tuple, list)):
        return int(nelecas[0]), int(nelecas[1])
    nb = nelecas // 2
    return int(nelecas - nb), int(nb)


def sector_pair_annihilation_maps(ncas, nelecas):
    """Cross-sector gather maps for W_rs = a_r a_s on a sector state.

    W_rs leaves the (n_a, n_b) sector: annihilating two ups lands in
    (n_a-2, n_b), two downs in (n_a, n_b-2), one of each in
    (n_a-1, n_b-1).  For each target group this builds, directly on the
    two bases (O(D) work, no 4^ncas array),
        (pairs, src, sign):
    pairs (k, 2) ordered mode pairs (r, s) of that spin signature,
    src (k, D_target) int32 ranks INTO THE SOURCE BASIS, sign (k,
    D_target) int8, so that (a_r a_s psi)[i] = sign * psi[src] over the
    target sector's determinants.  Used by unrestricted 2-RDMs:
    <a^dag_p a^dag_q a_r a_s> = <W_qp psi | W_rs psi> is block-diagonal
    over the groups (reference capability: pqc.py:192-218 with
    restricted=False).  Interleaved mode ordering (mode 2p = spatial p
    up), matching the sector basis convention."""
    basis = fermion.sector_basis(ncas, nelecas)
    na, nb = _nelec_split(nelecas)
    nm = 2 * ncas
    ups = [2 * p for p in range(ncas)]
    downs = [2 * p + 1 for p in range(ncas)]
    groups = {}
    specs = {
        "uu": ((na - 2, nb),
               [(r, s) for r in ups for s in ups if r != s]),
        "dd": ((na, nb - 2),
               [(r, s) for r in downs for s in downs if r != s]),
        "ud": ((na - 1, nb - 1),
               [(r, s) for r in ups for s in downs]
               + [(r, s) for r in downs for s in ups]),
    }
    for name, ((ta, tb), pairs) in specs.items():
        if ta < 0 or tb < 0 or ta > ncas or tb > ncas or not pairs:
            continue
        tbasis = fermion.sector_basis(ncas, (ta, tb))
        Dt = len(tbasis)
        k = len(pairs)
        src = np.zeros((k, Dt), dtype=np.int32)
        sign = np.zeros((k, Dt), dtype=np.int8)
        for i, (r, s) in enumerate(pairs):
            br = 1 << (nm - 1 - r)
            bs = 1 << (nm - 1 - s)
            valid = ((tbasis & br) == 0) & ((tbasis & bs) == 0)
            src_det = tbasis | br | bs
            sg = fermion._parity_below(src_det, s, nm)
            mid = src_det ^ bs
            sg = sg * fermion._parity_below(mid, r, nm)
            pos = np.searchsorted(basis, src_det)
            pos = np.minimum(pos, len(basis) - 1)
            valid = valid & (basis[pos] == src_det)
            src[i] = np.where(valid, pos, 0)
            sign[i] = np.where(valid, sg, 0)
        groups[name] = (np.asarray(pairs, dtype=np.int32),
                        jnp.asarray(src), jnp.asarray(sign))
    return groups


def sector_sminus_maps(ncas, nelecas):
    """Cross-sector gather maps for S^- = sum_p a^dag_{p,down} a_{p,up}
    on a sector state: (n_a, n_b) -> (n_a - 1, n_b + 1).

    Returns (src, sign), shapes (ncas, D_target) int32/int8, so that
    (T_p psi)[i] = sign[p, i] * psi[src[p, i]] over the target sector's
    determinants (T_p = a^dag_{p down} a_{p up}), or ``None`` when the
    target sector does not exist (n_a = 0 or n_b = ncas — then
    S^- psi = 0 identically).  One more pair-map family in the style of
    :func:`sector_epq_maps`; interleaved mode ordering.

    This is what makes spin diagnostics usable at sector scale: the
    dense 4^ncas S^2 matrix (ops/rdms.s2_matrix, reference
    active_space.py:243-253) is unusable beyond ~ncas = 8, while these
    maps are O(ncas * D_sector)."""
    basis = fermion.sector_basis(ncas, nelecas)
    na, nb = _nelec_split(nelecas)
    if na - 1 < 0 or nb + 1 > ncas:
        return None
    nm = 2 * ncas
    tbasis = fermion.sector_basis(ncas, (na - 1, nb + 1))
    Dt = len(tbasis)
    src = np.zeros((ncas, Dt), dtype=np.int32)
    sign = np.zeros((ncas, Dt), dtype=np.int8)
    for p in range(ncas):
        P = fermion.mode_of(p, 1, ncas, False)   # p, down (created)
        Q = fermion.mode_of(p, 0, ncas, False)   # p, up (annihilated)
        bitP = 1 << (nm - 1 - P)
        bitQ = 1 << (nm - 1 - Q)
        valid = ((tbasis & bitP) != 0) & ((tbasis & bitQ) == 0)
        source = np.where(valid, tbasis ^ bitP ^ bitQ, basis[0])
        sq = fermion._parity_below(source, Q, nm)
        mid = source ^ bitQ
        sp = fermion._parity_below(mid, P, nm)
        pos = np.searchsorted(basis, source)
        pos = np.minimum(pos, len(basis) - 1)
        valid = valid & (basis[pos] == source)
        src[p] = np.where(valid, pos, 0)
        sign[p] = np.where(valid, sq * sp, 0)
    return jnp.asarray(src), jnp.asarray(sign)


def s2_expectation_sector(psi_s, sminus_maps, nelecas):
    """<S^2> of a sector-basis state via S^2 = S^+ S^- + Sz^2 - Sz with
    <S^+ S^-> = ||S^- psi||^2 ((S^-)^dagger = S^+) and Sz = (n_a-n_b)/2
    exact on the sector.  Matches the dense s2_matrix quadratic form
    (tests/test_sector.py)."""
    na, nb = _nelec_split(nelecas)
    sz = 0.5 * (na - nb)
    if sminus_maps is None:
        return jnp.asarray(sz * sz - sz + 0.0)
    src, sign = sminus_maps
    v = jnp.sum(psi_s[src] * sign.astype(psi_s.dtype), axis=0)
    return jnp.real(jnp.conj(v) @ v) + sz * sz - sz


def rdms_from_sector_state_unrestricted(psi_s, epq_maps, pair_maps, ncas):
    """Spin-resolved (unrestricted) RDMs over 2*ncas spin-orbitals from a
    sector-basis statevector: gamma_pq = <a^dag_p a_q> (same-spin blocks
    from the per-spin E_pq component maps; cross-spin blocks are exactly
    zero on a sector state), Gamma_pqrs = <a^dag_p a^dag_q a_r a_s> via
    the block-diagonal W-gram over the cross-sector maps.  Matches
    ops/rdms.rdms_from_state_unrestricted on the embedded full-space
    vector."""
    from ..ops.grid import GridMaps, phi_all, to_grid

    nm = 2 * ncas
    gamma = jnp.zeros((nm, nm), dtype=jnp.float64)
    pq = np.arange(ncas * ncas)
    p_arr, q_arr = pq // ncas, pq % ncas
    if isinstance(epq_maps, GridMaps):
        psi_g = to_grid(psi_s, epq_maps)
        spin_phis = [phi_all(psi_g, epq_maps, spin=s) for s in range(2)]
        bra = jnp.conj(psi_g)
    else:
        src, sign = epq_maps
        spin_phis = [psi_s[src[s]] * sign[s].astype(psi_s.dtype)
                     for s in range(2)]
        bra = jnp.conj(psi_s)
    for s in range(2):
        g_s = jnp.real(spin_phis[s] @ bra)
        gamma = gamma.at[2 * p_arr + s, 2 * q_arr + s].set(g_s)
    Gamma = jnp.zeros((nm, nm, nm, nm), dtype=jnp.float64)
    for pairs, src_g, sign_g in pair_maps.values():
        from ..ops.rdms import gram_last
        W = psi_s[src_g] * sign_g.astype(psi_s.dtype)   # (k, D_target)
        C = jnp.real(gram_last(jnp.conj(W), W))         # <W_a psi|W_b psi>
        X = jnp.asarray(pairs[:, 0])
        Y = jnp.asarray(pairs[:, 1])
        # Gamma[p,q,r,s] = C[idx(q,p), idx(r,s)]: row a is W_{qp} with
        # (q,p) = (X[a], Y[a]), column b is W_{rs} = (X[b], Y[b])
        Gamma = Gamma.at[Y[:, None], X[:, None],
                         X[None, :], Y[None, :]].set(C)
    return gamma, Gamma


def rdms_from_sector_state(psi_s, maps):
    """Spin-summed restricted (gamma, Gamma) from a sector-basis
    statevector, via the same Phi-gram pipeline as ops/rdms.py.

    Bra-side conjugation + real part mirror ops/rdms.rdms_from_state, so
    COMPLEX sector states (custom ansatze) give correct real RDMs;
    conj/real are XLA no-ops for the real-valued built-in ansatze.

    ``maps`` may be the flat (src, sign) tables or an ops.grid.GridMaps;
    psi_s is canonical (sorted) order either way — the grid kernels
    convert internally (grams/dots are permutation-invariant)."""
    from ..ops.grid import GridMaps, phi_all, to_grid
    from ..ops.rdms import gram_last

    if isinstance(maps, GridMaps):
        n2 = maps.n2
        ncas = int(round(n2 ** 0.5))
        psi_s = to_grid(psi_s, maps)
        phi = phi_all(psi_s, maps)
    else:
        src, sign = maps
        n2 = src.shape[1]
        ncas = int(round(n2 ** 0.5))
        sgn = sign.astype(psi_s.dtype)
        phi = psi_s[src[0]] * sgn[0] + psi_s[src[1]] * sgn[1]
    gamma = jnp.real(phi @ jnp.conj(psi_s)).reshape(ncas, ncas)
    corr = jnp.real(gram_last(jnp.conj(phi), phi)).reshape(
        ncas, ncas, ncas, ncas)
    epq_ers = jnp.transpose(corr, (1, 0, 2, 3))
    delta = jnp.eye(ncas, dtype=gamma.dtype)
    Gamma = epq_ers - jnp.einsum("qr,ps->pqrs", delta, gamma)
    return gamma, Gamma
