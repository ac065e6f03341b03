"""Berry-phase / conical-intersection workflow as a library module.

The reference implements this only as a notebook
(examples/Tutorial_Berry_phase.ipynb, surveyed in SURVEY.md section 2.2):
(1) full OO-VQE optimization at the first loop geometry, (2) ONE damped
Newton step per subsequent geometry warm-started from the previous
(theta, oao_mo_coeff) — the OAO parameterization is what makes MO transfer
between geometries possible, (3) inter-geometry orbital-basis state
transfer via the number-conserving Thouless/Bogoliubov rotation
G = exp{sum [log M]_pq sum_sigma a^dag_{p sigma} a_{q sigma}}, (4) Berry
phase = arg of the product of successive overlaps <psi_{i+1}|G|psi_i>.

Here it is a first-class API.  The state transfer G = Gamma(M) (the
second-quantized representation of the active-block MO overlap M) runs ON
DEVICE through the compiled-gate simulator: M is polar-decomposed
M = W V diag(sigma) V^T, the two orthogonal factors are Givens-decomposed
into the same fermionic single-excitation pair gates the ansatze use, and
diag(sigma) acts as an occupation-weighted diagonal — replacing both the
reference's openfermion.bogoliubov_transform + cirq unitary (notebook
cell 28) and round 2's host-side scipy expm_multiply over the 4^ncas
space.  Because it is built from sector-conserving pair gates, the
transfer composes with sector mode for free; no gauge fixing is needed
because <0|G|0> = 1 exactly.  The scipy route is kept as
`transfer_state_host` for cross-validation.
"""

import numpy as np
from scipy.linalg import logm
from scipy.sparse.linalg import expm_multiply

import jax.numpy as jnp

from ..moldata import Moldata
from ..ops import fermion
from .oo_pqc import OO_pqc


def orbital_rotation_generator(M_act, ncas):
    """Sparse one-body generator sum_pq [log M]_pq E_pq over the
    2^(2 ncas) space (spin-summed, interleaved ordering)."""
    K = logm(np.asarray(M_act))
    D = 1 << (2 * ncas)
    from scipy import sparse
    gen = sparse.csr_matrix((D, D), dtype=complex)
    for p in range(ncas):
        for q in range(ncas):
            w = K[p, q]
            if abs(w) > 1e-14:
                gen = gen + w * fermion.epq_sparse(p, q, ncas).astype(
                    complex)
    return gen


def transfer_state_host(state, mo_atob, act_idx, ncas):
    """Host/scipy reference path: expm-multiply of the sparse one-body
    generator over the full 4^ncas space (round-2 implementation, kept as
    the cross-validation oracle for the device path)."""
    act = np.asarray(act_idx, dtype=int)
    M = np.asarray(mo_atob).T[np.ix_(act, act)]
    gen = orbital_rotation_generator(M, ncas)
    out = expm_multiply(gen, np.asarray(state, dtype=complex))
    return out


def givens_angles(R, tol=1e-12):
    """Decompose R in SO(n) into plane rotations: R = rot(i1,j1,t1) @ ...
    @ rot(ik,jk,tk), where rot(i,j,t) is the matrix with [i,i]=[j,j]=cos t,
    [i,j]=sin t, [j,i]=-sin t (the one-body matrix of
    exp(t (a^dag_i a_j - a^dag_j a_i))).  Host-side, O(n^3)."""
    R = np.asarray(R, dtype=float)
    n = R.shape[0]
    A = R.copy()
    left = []  # rotations L_k with L_m ... L_1 A = I
    for j in range(n - 1):
        for i in range(n - 1, j, -1):
            b = A[i, j]
            a = A[i - 1, j]
            # rotate when there is a sub-entry to zero OR the upper
            # entry is negative (a pi rotation repairs -1 diagonal pairs
            # left by reflections)
            if abs(b) < tol and a >= -tol:
                continue
            t = np.arctan2(b, a)
            c, s = np.cos(t), np.sin(t)
            G = np.eye(n)
            # G = rot(i-1, i, t) zeroes A[i, j]
            G[i - 1, i - 1] = c
            G[i, i] = c
            G[i - 1, i] = s
            G[i, i - 1] = -s
            A = G @ A
            left.append((i - 1, i, t))
    assert np.allclose(A, np.eye(n), atol=1e-9), \
        "givens_angles expects a special-orthogonal matrix"
    # A = L_m ... L_1 R = I  =>  R = L_1^{-1} ... L_m^{-1}, and
    # L_k = rot(i,j,t) so L_k^{-1} = rot(i,j,-t)
    return [(i, j, -t) for (i, j, t) in left]


def _rot(n, i, j, t):
    G = np.eye(n)
    c, s = np.cos(t), np.sin(t)
    G[i, i] = c
    G[j, j] = c
    G[i, j] = s
    G[j, i] = -s
    return G


def transfer_factors(M):
    """Host factorization of Gamma(M) for arbitrary invertible real M:
    M = W' Dw V' diag(sigma) V'^T with W', V' special-orthogonal,
    Dw = diag(1..1, det-sign).  Returns (rots_W, flip_W, rots_V, sigma)
    where rots_* are givens_angles lists."""
    M = np.asarray(M, dtype=float)
    U, sigma, Vt = np.linalg.svd(M)
    W = U @ Vt
    V = Vt.T
    flip_W = bool(np.linalg.det(W) < 0)
    if flip_W:
        W = W.copy()
        W[:, -1] *= -1.0
    if np.linalg.det(V) < 0:
        # flipping the sign of one column of V leaves V diag(s) V^T
        # invariant, so the flip is absorbed exactly
        V = V.copy()
        V[:, -1] *= -1.0
    return givens_angles(W), flip_W, givens_angles(V), sigma


def _rotation_program(rots, ncas, dets=None, reverse=False,
                      transpose=False):
    """GateProgram applying Gamma(prod_k rot(i_k, j_k, t_k)): one
    fermionic single-excitation pair gate per spin per rotation, rightmost
    factor first.  Returns (program, angles)."""
    from ..simulator import gates as G
    from ..simulator.ansatze import _finalize_program

    nm = 2 * ncas
    seq = list(rots)
    if transpose:  # Gamma(R^T): reversed factors, negated angles
        seq = [(i, j, -t) for (i, j, t) in reversed(seq)]
    # Gamma(G1 G2 ...)|psi> applies the RIGHTMOST factor first; the gate
    # program applies list order first -> reverse the factor list
    seq = list(reversed(seq))
    gate_list = []
    angles = []
    for k, (i, j, t) in enumerate(seq):
        for s in (0, 1):
            gate_list.append(G.fermionic_single_pairs(
                2 * i + s, 2 * j + s, nm, param=k, half=1.0, dets=dets))
        angles.append(t)
    prog = _finalize_program(gate_list, max(len(seq), 1),
                             fermion.hf_bitstring(ncas, 0)[0]
                             if dets is None else int(np.asarray(dets)[0]),
                             nm, dets)
    return prog, jnp.asarray(np.asarray(angles, dtype=float)
                             if angles else np.zeros(1))


def _occupation_matrix(ncas, dets=None):
    """occ[d, p] = occupation (0/1/2) of spatial orbital p in basis
    determinant d (interleaved ordering)."""
    nm = 2 * ncas
    dets = (np.arange(1 << nm, dtype=np.int64) if dets is None
            else np.asarray(dets, dtype=np.int64))
    occ = np.zeros((len(dets), ncas), dtype=np.int8)
    for p in range(ncas):
        occ[:, p] = (fermion.occ_bit(dets, 2 * p, nm)
                     + fermion.occ_bit(dets, 2 * p + 1, nm))
    return occ


def transfer_state(state, mo_atob, act_idx, ncas, dets=None):
    """Transfer a statevector between active-orbital bases ON DEVICE.

    mo_atob: OAO-MO overlap C_a^T C_b between consecutive geometries;
    its (transposed) active block defines the Thouless rotation
    (notebook cell 28: `bogoliubov_atob_cas`).  Gamma(M) is applied as
    Givens-gate programs + one diagonal occupation weighting — exact for
    any invertible real M (including reflections and non-orthogonality),
    matching transfer_state_host to machine precision.  `dets` runs the
    transfer in a sector basis (pass pqc.sector_basis)."""
    act = np.asarray(act_idx, dtype=int)
    M = np.asarray(mo_atob).T[np.ix_(act, act)]
    rots_W, flip_W, rots_V, sigma = transfer_factors(M)
    psi = jnp.asarray(state)
    occ = _occupation_matrix(ncas, dets)
    # Gamma(M) = Gamma(W') Gamma(Dw) Gamma(V') Gamma(diag sigma) Gamma(V'^T)
    progVt, angVt = _rotation_program(rots_V, ncas, dets, transpose=True)
    psi = progVt.apply(angVt, psi)
    weights = jnp.exp(jnp.asarray(occ.astype(float))
                      @ jnp.log(jnp.asarray(sigma)))
    psi = psi * weights.astype(psi.dtype)
    progV, angV = _rotation_program(rots_V, ncas, dets)
    psi = progV.apply(angV, psi)
    if flip_W:
        # Gamma(diag(1..1,-1)) multiplies by (-1)^{n_last}
        psi = psi * jnp.asarray(
            np.where(occ[:, -1] % 2 == 1, -1.0, 1.0)).astype(psi.dtype)
    progW, angW = _rotation_program(rots_W, ncas, dets)
    psi = progW.apply(angW, psi)
    return np.asarray(psi)


class BerryPhaseLoop:
    """Adiabatic tracking of an OO-VQE state around a geometry loop.

    Args:
        geometries: list of geometry strings around the loop (first and
            last should coincide for an exact final overlap).
        basis, ncas, nelecas: problem definition.
        pqc: a Parameterized_circuit shared across geometries.
        freeze_active: freeze active-active rotations (recommended, as in
            the tutorial).
        run_casscf: also run the host CASSCF oracle at each point for
            reference energies.
    """

    def __init__(self, geometries, basis, ncas, nelecas, pqc,
                 freeze_active=True, run_casscf=False, newton_method=None,
                 **newton_kwargs):
        self.geometries = list(geometries)
        self.basis = basis
        self.ncas = ncas
        self.nelecas = nelecas
        self.pqc = pqc
        self.freeze_active = freeze_active
        self.run_casscf = run_casscf
        # hess_eig_l tracks the lowest Hessian eigenvalue, the conical-
        # intersection diagnostic.  With the default solver selection,
        # large Hessians on TPU use the iterative solve whose lowest
        # eigenvalue can carry ~1% error on pathologically clustered
        # spectra; pass newton_method='eigh' when the observable must be
        # exact (accuracy contract: utils/newton_raphson).
        self.newton_method = newton_method
        self.newton_kwargs = newton_kwargs
        # trajectories
        self.theta_l = []
        self.oao_mo_coeff_l = []
        self.energy_l = []
        self.hess_eig_l = []
        self.casscf_energy_l = []
        self.act_idx = None

    def run(self, theta_init=None, conv_tol=1e-10, max_iterations=50,
            track_steps=1, track_tol=None, verbose=0):
        """Full optimization at point 0, then adiabatic tracking at each
        subsequent point (notebook cells 19-22).

        Tracking takes up to ``track_steps`` damped Newton steps per loop
        point (the reference notebook took exactly one); if ``track_tol``
        is given, stepping stops early once |dE| < track_tol.  More steps
        keep the state closer to the adiabatic ground state, which is what
        makes the successive overlaps approach +-1."""
        mol0 = Moldata(self.geometries[0], self.basis)
        oo0 = OO_pqc(self.pqc, mol0, self.ncas, self.nelecas,
                     freeze_active=self.freeze_active,
                     newton_method=self.newton_method)
        self.act_idx = oo0.act_idx
        theta0 = (self.pqc.init_zeros() if theta_init is None
                  else jnp.asarray(theta_init))
        energy_l, theta_l, _, oao_l, hess_eig_l = oo0.full_optimization(
            theta0, max_iterations=max_iterations, conv_tol=conv_tol,
            verbose=verbose, **self.newton_kwargs)
        theta = theta_l[-1]
        oao = oao_l[-1]
        self.theta_l = [theta]
        self.oao_mo_coeff_l = [oao]
        self.energy_l = [energy_l[-1]]
        self.hess_eig_l = [hess_eig_l[-1]]
        if self.run_casscf:
            mol0.run_casscf(self.ncas, self.nelecas)
            self.casscf_energy_l = [mol0.casscf.e_tot]

        for step, geo in enumerate(self.geometries):
            if step == 0:
                continue
            mol = Moldata(geo, self.basis)
            oo = OO_pqc(self.pqc, mol, self.ncas, self.nelecas,
                        oao_mo_coeff=oao,
                        freeze_active=self.freeze_active,
                        newton_method=self.newton_method)
            energy_prev = None
            for _ in range(max(1, int(track_steps))):
                theta, kappa, oao, energy, hess_eig = oo._nr_iteration_jit(
                    theta, oao, 1e-4, 0.5, 1e-6, 1.1, 1e-6)
                if (track_tol is not None and energy_prev is not None
                        and abs(float(energy) - energy_prev) < track_tol):
                    break
                energy_prev = float(energy)
            self.theta_l.append(theta)
            self.oao_mo_coeff_l.append(oao)
            self.energy_l.append(float(energy))
            self.hess_eig_l.append(float(hess_eig))
            if self.run_casscf:
                mol.run_casscf(self.ncas, self.nelecas)
                self.casscf_energy_l.append(mol.casscf.e_tot)
            if verbose:
                print(f"Energy at step {step}: {float(energy):.10f}")
        return self

    def run_batched(self, theta_init=None, conv_tol=1e-10,
                    max_iterations=50, track_steps=4, verbose=0,
                    mesh=None):
        """Adiabatic tracking with ALL loop geometries advancing
        CONCURRENTLY (the GeometryBatch dp axis): full optimization at
        point 0, then every remaining geometry warm-starts from the
        point-0 solution and takes ``track_steps`` batched damped-Newton
        steps in LOCKSTEP — one device program per step for the whole
        loop, instead of one dispatch sequence per geometry.  Under a
        ``mesh`` the stacked integral tensors are dp-sharded so the batch
        spreads across devices.

        Trade-off vs :meth:`run`: sequential tracking warm-starts each
        geometry from its predecessor (follows the adiabatic branch with
        ONE step/geometry); the batched variant warm-starts everything
        from point 0, so it needs a few more steps per geometry on dense
        loops but runs them all concurrently.  Each batched step is
        exactly the sequential damped-Newton step (pinned in
        tests/test_parallel.py)."""
        from ..parallel.sharding import GeometryBatch

        mol0 = Moldata(self.geometries[0], self.basis)
        oo0 = OO_pqc(self.pqc, mol0, self.ncas, self.nelecas,
                     freeze_active=self.freeze_active,
                     newton_method=self.newton_method)
        self.act_idx = oo0.act_idx
        theta0 = (self.pqc.init_zeros() if theta_init is None
                  else jnp.asarray(theta_init))
        energy_l, theta_l, _, oao_l, hess_eig_l = oo0.full_optimization(
            theta0, max_iterations=max_iterations, conv_tol=conv_tol,
            verbose=verbose, **self.newton_kwargs)
        theta, oao = theta_l[-1], oao_l[-1]
        self.theta_l = [theta]
        self.oao_mo_coeff_l = [oao]
        self.energy_l = [energy_l[-1]]
        self.hess_eig_l = [hess_eig_l[-1]]
        if self.run_casscf:
            mol0.run_casscf(self.ncas, self.nelecas)
            self.casscf_energy_l = [mol0.casscf.e_tot]

        mols = [Moldata(g, self.basis) for g in self.geometries[1:]]
        batch = GeometryBatch(mols, self.ncas, self.nelecas, self.pqc,
                              mesh=mesh,
                              freeze_active=self.freeze_active)
        B = len(mols)
        hist, thetas, oaos, lowests = batch.optimize(
            theta, oao_mo0=jnp.broadcast_to(
                jnp.asarray(oao), (B,) + jnp.asarray(oao).shape),
            n_steps=max(1, int(track_steps)))
        for i in range(B):
            self.theta_l.append(thetas[i])
            self.oao_mo_coeff_l.append(oaos[i])
            self.energy_l.append(float(hist[-1][i]))
            self.hess_eig_l.append(float(lowests[i]))
            if self.run_casscf:
                mols[i].run_casscf(self.ncas, self.nelecas)
                self.casscf_energy_l.append(mols[i].casscf.e_tot)
        if verbose:
            print("batched tracking energies:",
                  [f"{e:.8f}" for e in self.energy_l[1:]])
        return self

    def states(self):
        """PQC statevectors along the loop (notebook cell 25)."""
        return [np.asarray(self.pqc.state(th)) for th in self.theta_l]

    def overlaps(self):
        """Successive overlaps <psi_{i+1}| G_{i->i+1} |psi_i>
        (notebook cells 30-32).  The Thouless transfer runs on device
        through the compiled-gate simulator (sector-compatible: a sector
        pqc transfers in its own basis)."""
        states = self.states()
        dets = self.pqc.sector_basis if self.pqc.sector else None
        n = len(states)
        out = []
        for i in range(n):
            j = (i + 1) % n
            mo_atob = (np.asarray(self.oao_mo_coeff_l[i]).T
                       @ np.asarray(self.oao_mo_coeff_l[j]))
            moved = transfer_state(states[i], mo_atob, self.act_idx,
                                   self.ncas, dets=dets)
            out.append(np.vdot(states[j].astype(complex), moved))
        return np.array(out)

    def berry_phase(self):
        """arg of the product of loop overlaps; ~pi around a conical
        intersection (notebook cell 33)."""
        return float(np.angle(np.prod(self.overlaps())))
