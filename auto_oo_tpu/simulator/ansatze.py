"""Ansatz factories: UCC(S)D, GateFabric (np_fabric), k-UpCCD -> GateProgram.

Reimplements the ansatz surface of the reference (pqc.py:121-163,
ansatze/uccd.py, ansatze/kUpCCD.py) including:

* spin-conserving excitation enumeration (the qml.qchem.excitations
  ordering, which fixes the meaning of each theta entry);
* GateFabric brick pattern with the reference's redundant-parameter
  elimination (pqc.py:144-158 — only valid from an HF start);
* k-UpCCD as a first-class ansatz (the reference exported it but never
  wired it into Parameterized_circuit — SURVEY.md known-gap list).

Gate sign conventions are calibrated against the reference golden
statevectors (see tests/test_pqc.py).
"""

import numpy as np

from ..ops import fermion
from . import gates as G
from .program import GateProgram

# Sign/order conventions pinned by golden-statevector calibration
# (scripts/calibrate_gates.py): do not change without re-running it.
FD_SIGN = 1.0          # FermionicDoubleExcitation angle sign
FS_SIGN = 1.0          # FermionicSingleExcitation angle sign
DE_SIGN = 1.0          # DoubleExcitation angle sign
OR_SIGN = 1.0          # OrbitalRotation angle sign
OR_STRING = True       # OrbitalRotation includes JW string parity
FABRIC_ORBROT_FIRST = False  # block order: DoubleExcitation then OrbitalRotation


def excitations(electrons, orbitals, delta_sz=0):
    """Spin-conserving single and double excitations of the HF state, in
    the qml.qchem.excitations enumeration order (reference pqc.py:123).

    ``electrons`` may be an (n_alpha, n_beta) tuple for an OPEN-SHELL
    reference determinant (alpha on even modes, beta on odd — matching
    ops/fermion.hf_bitstring); the enumeration then runs over the actual
    occupied/virtual mode lists with the same nesting order, reducing
    exactly to the closed-shell form when the occupied set is the first
    `electrons` modes."""
    sz = np.array([0.5 if i % 2 == 0 else -0.5 for i in range(orbitals)])
    if isinstance(electrons, (tuple, list)):
        na, nb = int(electrons[0]), int(electrons[1])
        occ = sorted([2 * i for i in range(na)]
                     + [2 * i + 1 for i in range(nb)])
        virt = [m for m in range(orbitals) if m not in occ]
    else:
        occ = list(range(electrons))
        virt = list(range(electrons, orbitals))
    singles = [[r, p]
               for r in occ
               for p in virt
               if sz[p] - sz[r] == delta_sz]
    doubles = [[s, r, q, p]
               for i, s in enumerate(occ)
               for r in occ[i + 1:]
               for j, q in enumerate(virt)
               for p in virt[j + 1:]
               if (sz[p] + sz[q] - sz[r] - sz[s]) == delta_sz]
    return singles, doubles


def hf_state(electrons, orbitals):
    """Occupation vector of the HF determinant (reference pqc.py:131)."""
    _, vec = fermion.hf_bitstring(orbitals // 2, electrons)
    return vec


def _finalize_program(gate_list, n_params, init_det, nm, dets=None):
    """Assemble a GateProgram.  With `dets` (a sorted determinant subset,
    e.g. a particle-sector basis) the gate (ia, ib) determinant values are
    rank-remapped into the subset and the program runs on the small
    vector — sector programs are built DIRECTLY this way in O(D_sector),
    never materializing 4^ncas tables."""
    if dets is None:
        return GateProgram(gate_list, n_params, init_det, 1 << nm)
    dets = np.asarray(dets, dtype=np.int64)
    for g in gate_list:
        ia = np.searchsorted(dets, g.ia)
        ib = np.searchsorted(dets, g.ib)
        ok = ((ia < len(dets)) & (ib < len(dets)))
        assert np.all(ok) and np.all(dets[ia] == g.ia) \
            and np.all(dets[ib] == g.ib), "gate pair leaves the subset"
        g.ia = ia.astype(np.int32)
        g.ib = ib.astype(np.int32)
    init = int(np.searchsorted(dets, init_det))
    assert init < len(dets) and dets[init] == init_det, \
        "initial determinant outside the subset"
    return GateProgram(gate_list, n_params, init, len(dets))


def uccd_program(ncas, nelecas, add_singles=False, dets=None):
    """UCC doubles (optionally + singles) ansatz.

    Parameter layout matches qml.UCCSD (used by the reference via
    uccd_circuit, pqc.py:69-76): with singles, theta = [singles...,
    doubles...]; the circuit applies all doubles first, then singles
    (calibrated against the reference golden statevectors).  Without
    singles, theta = [doubles...] (reference UCCD template,
    ansatze/uccd.py:105-114)."""
    nm = 2 * ncas
    singles, doubles = excitations(nelecas, nm)
    init_idx, _ = fermion.hf_bitstring(ncas, nelecas)
    ns = len(singles) if add_singles else 0
    gate_list = []
    for i, (s, r, q, p) in enumerate(doubles):
        gate_list.append(G.fermionic_double_pairs(
            p, q, r, s, nm, param=ns + i, half=0.5, sign_flip=FD_SIGN,
            dets=dets))
    if add_singles:
        for j, (r, p) in enumerate(singles):
            gate_list.append(G.fermionic_single_pairs(
                p, r, nm, param=j, half=0.5, sign_flip=FS_SIGN,
                dets=dets))
    return _finalize_program(gate_list, ns + len(doubles), init_idx, nm,
                             dets)


def gatefabric_layout(n_qubits):
    """Wire blocks of one GateFabric layer: offset-0 bricks then offset-2
    bricks (n_qubits//2 - 1 blocks per layer)."""
    blocks = [list(range(i, i + 4)) for i in range(0, n_qubits - 3, 4)]
    blocks += [list(range(i, i + 4)) for i in range(2, n_qubits - 3, 4)]
    return blocks


def gatefabric_full_shape(n_layers, n_qubits):
    return (n_layers, n_qubits // 2 - 1, 2)


def gatefabric_redundant_idx(ncas, nelecas):
    """Flat indices of theta entries redundant when starting from HF:
    the first-layer offset-0 bricks acting entirely within the occupied
    or entirely within the virtual qubits (reference pqc.py:144-158).

    Reproduces the reference's index arithmetic, FILTERED to the
    entries whose brick genuinely lies inside one side of the
    occupied/virtual boundary.  The reference's virtual-side range
    starts at ``2*((n_qubits-nelecas)//4)`` which, for
    nelecas % 4 == 2 with even ncas (e.g. any half-filled
    odd-pair-count space: (6e,6o), (10e,10o), (14e,14o)), also
    eliminates the one brick STRADDLING the boundary — the only
    first-sub-layer brick that acts on HF at all — leaving layer 1 of
    the fabric a complete no-op from the HF start (a reference bug of
    the same class as its kappa-trajectory bug; its own tests only
    cover configurations where the arithmetic happens to be exact).
    The filter never removes a justified elimination and never adds a
    new one, so theta_shape matches the reference everywhere the
    reference is correct.

    The elimination pattern is derived for a CLOSED-SHELL HF start;
    for an open-shell (n_alpha, n_beta) reference no brick is
    guaranteed redundant, so no parameters are eliminated."""
    if isinstance(nelecas, (tuple, list)):
        if nelecas[0] != nelecas[1]:
            return []
        nelecas = int(nelecas[0]) * 2
    n_qubits = 2 * ncas
    if n_qubits <= 4:
        return []
    candidate = list(range(0, 2 * (nelecas // 4)))
    if ncas % 2 == 0:
        candidate += list(range(2 * ((n_qubits - nelecas) // 4),
                                2 * (n_qubits // 4)))
    redundant = []
    for x in candidate:
        lo = 4 * (x // 2)            # offset-0 brick of flat entry x
        all_occupied = lo + 3 < nelecas
        all_virtual = lo >= nelecas
        if (all_occupied or all_virtual) and x not in redundant:
            redundant.append(x)
    return redundant


def gatefabric_program(ncas, nelecas, n_layers, include_pi=False,
                       dets=None):
    """GateFabric over the FULL theta of shape (L, n_blocks, 2); parameter
    slot = flat index.  Block gate Q(theta, phi) = DoubleExcitation(theta)
    then OrbitalRotation(phi) (order calibrated against goldens)."""
    nm = 2 * ncas
    if include_pi:
        raise NotImplementedError("include_pi=True variant not implemented")
    blocks = gatefabric_layout(nm)
    init_idx, _ = fermion.hf_bitstring(ncas, nelecas)
    gate_list = []
    n_blocks = len(blocks)
    for layer in range(n_layers):
        for b, wires in enumerate(blocks):
            p_theta = (layer * n_blocks + b) * 2
            p_phi = p_theta + 1
            de = G.double_excitation_pairs(wires, nm, p_theta,
                                           sign_flip=DE_SIGN, dets=dets)
            orot = G.orbital_rotation_pairs(wires, nm, p_phi,
                                            sign_flip=OR_SIGN,
                                            with_string=OR_STRING,
                                            dets=dets)
            if FABRIC_ORBROT_FIRST:
                gate_list.extend(orot)
                gate_list.append(de)
            else:
                gate_list.append(de)
                gate_list.extend(orot)
    n_params = n_layers * n_blocks * 2
    return _finalize_program(gate_list, n_params, init_idx, nm, dets)


def generalized_pair_doubles(wires):
    """Pair coupled-cluster double excitation wire groups
    (reference ansatze/kUpCCD.py:16-33)."""
    return [[list(wires[r:r + 2]), list(wires[p:p + 2])]
            for r in range(0, len(wires) - 1, 2)
            for p in range(0, len(wires) - 1, 2)
            if p != r]


def kupccd_program(ncas, nelecas, k=1, dets=None):
    """k-Unitary Pair CC Generalized Doubles: k repetitions of all pair
    doubles (reference ansatze/kUpCCD.py:94-130).  theta shape (k, n_pd),
    flattened row-major into parameter slots."""
    nm = 2 * ncas
    if nm < 4 or nm % 2:
        raise ValueError("requires an even number of qubits >= 4")
    d_wires = generalized_pair_doubles(list(range(nm)))
    init_idx, _ = fermion.hf_bitstring(ncas, nelecas)
    gate_list = []
    for layer in range(k):
        for i, (w1, w2) in enumerate(d_wires):
            s, r = w1[0], w1[-1]
            q, p = w2[0], w2[-1]
            gate_list.append(G.fermionic_double_pairs(
                p, q, r, s, nm, param=layer * len(d_wires) + i,
                half=0.5, sign_flip=FD_SIGN, dets=dets))
    return _finalize_program(gate_list, k * len(d_wires), init_idx, nm,
                             dets)


def uccd_circuit(theta, ncas, nelecas, add_singles=False):
    """UCC(S)D ansatz statevector — flat-API equivalent of the reference's
    ``uccd_circuit`` (reference __init__.py:4, pqc.py:69-76).

    The reference signature took PennyLane wire lists and an HF bitstring;
    here everything derives from (ncas, nelecas) since the compiled-gate
    simulator owns the layout.  Returns the real float64 statevector of
    dimension 4^ncas (interleaved JW ordering, matching the reference
    golden states)."""
    import jax.numpy as jnp

    program = uccd_program(ncas, nelecas, add_singles=add_singles)
    return program.apply(jnp.ravel(jnp.asarray(theta)))


def gatefabric_circuit(theta, ncas, nelecas, n_layers=1):
    """GateFabric (NP-fabric) ansatz statevector — flat-API equivalent of
    the reference's ``gatefabric_circuit`` (pqc.py:79-84).  ``theta`` is
    the FULL parameter tensor of shape gatefabric_full_shape(n_layers,
    2*ncas) (no redundant-parameter elimination at this level, matching
    the reference free function)."""
    import jax.numpy as jnp

    program = gatefabric_program(ncas, nelecas, n_layers)
    return program.apply(jnp.ravel(jnp.asarray(theta)))
