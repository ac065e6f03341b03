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

Here it is a first-class API.  The state transfer is computed directly as
an expm-multiply of the one-body generator on the statevector (replacing
the reference's openfermion.bogoliubov_transform + cirq circuit unitary;
our construction needs no gauge fixing because <0|G|0> = 1 exactly).
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


def transfer_state(state, mo_atob, act_idx, ncas):
    """Transfer a statevector between active-orbital bases.

    mo_atob: OAO-MO overlap C_a^T C_b between consecutive geometries;
    its (transposed) active block defines the Thouless rotation
    (notebook cell 28: `bogoliubov_atob_cas`)."""
    act = np.asarray(act_idx, dtype=int)
    M = np.asarray(mo_atob).T[np.ix_(act, act)]
    gen = orbital_rotation_generator(M, ncas)
    out = expm_multiply(gen, np.asarray(state, dtype=complex))
    return out


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
                 freeze_active=True, run_casscf=False, **newton_kwargs):
        self.geometries = list(geometries)
        self.basis = basis
        self.ncas = ncas
        self.nelecas = nelecas
        self.pqc = pqc
        self.freeze_active = freeze_active
        self.run_casscf = run_casscf
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
                     freeze_active=self.freeze_active)
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
                        freeze_active=self.freeze_active)
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

    def states(self):
        """PQC statevectors along the loop (notebook cell 25)."""
        return [np.asarray(self.pqc.state(th)) for th in self.theta_l]

    def overlaps(self):
        """Successive overlaps <psi_{i+1}| G_{i->i+1} |psi_i>
        (notebook cells 30-32)."""
        states = self.states()
        n = len(states)
        out = []
        for i in range(n):
            j = (i + 1) % n
            mo_atob = (np.asarray(self.oao_mo_coeff_l[i]).T
                       @ np.asarray(self.oao_mo_coeff_l[j]))
            moved = transfer_state(states[i], mo_atob, self.act_idx,
                                   self.ncas)
            out.append(np.vdot(states[j].astype(complex), moved))
        return np.array(out)

    def berry_phase(self):
        """arg of the product of loop overlaps; ~pi around a conical
        intersection (notebook cell 33)."""
        return float(np.angle(np.prod(self.overlaps())))
