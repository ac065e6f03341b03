"""OO_energy: orbital-rotated energy functional with analytic derivatives.

API mirror of reference oo_energy.py:121-474 on a pure-JAX functional core:
the optimization variable is the OAO->MO coefficient matrix `oao_mo_coeff`,
energies are E = c0 + sum h~ gamma + sum g Gamma after AO->MO transforms,
kappa parameterizes orbital rotations through our TPU-safe expm, and the
closed-form Fock gradient / Hessian (ops/fock.py) is fully AD-traceable so
the mixed theta-kappa Hessian block can differentiate through it.

Static problem data (integrals, index partitions) is captured in closures;
every hot path is jitted once per problem shape.
"""


import numpy as np
import jax
import jax.numpy as jnp

from ..ops import fock as _fock
from ..ops import kappa as _kappa
from ..ops import transforms as _tr
from ..ops.linalg import expm
from ..utils.newton_raphson import damped_newton_step_pure


def mo_ao_to_mo_oao(mo_coeff, overlap):
    """AO-MO -> OAO-MO coefficients: S^{1/2} C (reference
    oo_energy.py:54-60; numpy, host side)."""
    w, v = np.linalg.eigh(np.asarray(overlap))
    s_half = v @ np.diag(w ** 0.5) @ v.T
    return s_half @ np.asarray(mo_coeff)


class OO_energy:
    """Orbital-optimized energy for given RDMs, with analytic orbital
    gradients and Hessians (reference oo_energy.py:121)."""

    def __init__(self, mol, ncas, nelecas, oao_mo_coeff=None,
                 freeze_active=False, interface=None):
        if oao_mo_coeff is None:
            mol.run_rhf()
            oao_mo_coeff = mo_ao_to_mo_oao(mol.hf.mo_coeff, mol.overlap)
        self.oao_mo_coeff = jnp.asarray(oao_mo_coeff, dtype=jnp.float64)
        self.interface = "jax"

        self.int1e_ao = jnp.asarray(mol.int1e_ao)
        self.int2e_ao = jnp.asarray(mol.int2e_ao)
        self.overlap = mol.overlap
        self.oao_coeff = jnp.asarray(mol.oao_coeff)
        self.nuc = float(mol.nuc)
        self.nao = int(mol.nao)
        self.basis = getattr(mol, "basis", None)  # checkpoint spec header

        self.ncas = ncas
        self.nelecas = nelecas
        occ, act, virt = mol.get_active_space_idx(ncas, nelecas)
        self.occ_idx, self.act_idx, self.virt_idx = occ, act, virt
        self._occ = tuple(int(i) for i in occ)
        self._act = tuple(int(i) for i in act)

        self.freeze_active = freeze_active
        self.params_idx = _kappa.non_redundant_indices(
            occ, act, virt, freeze_active)
        self.n_kappa = len(self.params_idx)
        self._params_idx_dev = jnp.asarray(self.params_idx)
        self._tril_size = self.nao * (self.nao - 1) // 2

        self._jit_cache = {}

    # -- basic maps -------------------------------------------------------

    @property
    def mo_coeff(self):
        """AO-MO coefficients, derived from oao_mo_coeff
        (reference oo_energy.py:173-176)."""
        return self.oao_coeff @ self.oao_mo_coeff

    def kappa_vector_to_matrix(self, kappa):
        """Packed non-redundant kappa -> skew-symmetric matrix
        (reference oo_energy.py:213-219)."""
        total = jnp.zeros(self._tril_size, dtype=kappa.dtype)
        total = total.at[self._params_idx_dev].set(kappa)
        return _kappa.vector_to_skew_symmetric(total, self.nao)

    def kappa_matrix_to_vector(self, kappa_matrix):
        """Skew-symmetric matrix -> packed non-redundant vector
        (reference oo_energy.py:221-224)."""
        return _kappa.skew_symmetric_to_vector(
            kappa_matrix)[self._params_idx_dev]

    def kappa_to_mo_coeff(self, kappa):
        """expm(-kappa_matrix) (reference oo_energy.py:226-230)."""
        return expm(-self.kappa_vector_to_matrix(kappa))

    def get_transformed_mo(self, mo_coeff, kappa):
        """mo_coeff @ expm(-kappa) (reference oo_energy.py:232-236)."""
        return mo_coeff @ self.kappa_to_mo_coeff(kappa)

    # -- energy -----------------------------------------------------------

    def get_active_integrals(self, mo_coeff):
        """(c0, c1, c2) Hamiltonian coefficients at given MOs
        (reference oo_energy.py:204-211)."""
        h1 = _tr.int1e_transform(self.int1e_ao, mo_coeff)
        g2 = _tr.int2e_transform(self.int2e_ao, mo_coeff)
        return _tr.molecular_hamiltonian_coefficients(
            self.nuc, h1, g2, self._occ, self._act)

    def energy_from_mo_coeff(self, mo_coeff, one_rdm, two_rdm):
        """E = c0 + sum c1 gamma + sum c2 Gamma (reference
        oo_energy.py:178-197)."""
        c0, c1, c2 = self.get_active_integrals(mo_coeff)
        return _tr.energy_from_rdms(c0, c1, c2, one_rdm, two_rdm)

    def energy_from_kappa(self, kappa, one_rdm, two_rdm):
        """AD entry point: E(kappa) at fixed RDMs (reference
        oo_energy.py:199-202)."""
        mo = self.mo_coeff @ self.kappa_to_mo_coeff(kappa)
        return self.energy_from_mo_coeff(mo, one_rdm, two_rdm)

    # -- analytic derivatives --------------------------------------------

    def fock_core(self, int1e_mo, int2e_mo):
        return _fock.fock_core(int1e_mo, int2e_mo, self._occ)

    def fock_active(self, int2e_mo, one_rdm):
        return _fock.fock_active(int2e_mo, one_rdm, self._act)

    def fock_generalized(self, int1e_mo, int2e_mo, one_rdm, two_rdm):
        return _fock.fock_generalized(int1e_mo, int2e_mo, one_rdm, two_rdm,
                                      self._occ, self._act)

    def analytic_gradient_from_integrals(self, int1e_mo, int2e_mo,
                                         one_rdm, two_rdm):
        return _fock.analytic_gradient_from_integrals(
            int1e_mo, int2e_mo, one_rdm, two_rdm, self._occ, self._act)

    def analytic_hessian_from_integrals(self, int1e_mo, int2e_mo,
                                        one_rdm, two_rdm):
        return _fock.analytic_hessian_from_integrals(
            int1e_mo, int2e_mo, one_rdm, two_rdm, self._occ, self._act)

    def full_rdms(self, one_rdm, two_rdm):
        return _fock.full_rdms(one_rdm, two_rdm, self._occ, self._act,
                               self.nao)

    def y_matrix(self, int2e_mo, two_full):
        return _fock.y_matrix(int2e_mo, two_full)

    def analytic_gradient(self, one_rdm, two_rdm, mo_coeff=None):
        """2(F - F^T) at given RDMs (reference oo_energy.py:404-413)."""
        mo = self.mo_coeff if mo_coeff is None else mo_coeff
        h1 = _tr.int1e_transform(self.int1e_ao, mo)
        g2 = _tr.int2e_transform(self.int2e_ao, mo)
        return self.analytic_gradient_from_integrals(h1, g2, one_rdm,
                                                     two_rdm)

    def analytic_hessian(self, one_rdm, two_rdm, mo_coeff=None):
        """Full 4-index orbital Hessian (reference oo_energy.py:415-424)."""
        mo = self.mo_coeff if mo_coeff is None else mo_coeff
        h1 = _tr.int1e_transform(self.int1e_ao, mo)
        g2 = _tr.int2e_transform(self.int2e_ao, mo)
        return self.analytic_hessian_from_integrals(h1, g2, one_rdm,
                                                    two_rdm)

    def full_hessian_to_matrix(self, full_hess):
        """Project onto non-redundant pairs (reference
        oo_energy.py:395-402)."""
        return _fock.full_hessian_to_matrix(full_hess, self.params_idx,
                                            self.nao)

    # -- orbital-only optimization ---------------------------------------

    def _orbital_step_fn(self):
        """Jitted single damped-Newton orbital step at fixed RDMs."""
        if "orb_step" in self._jit_cache:
            return self._jit_cache["orb_step"]

        def step(oao_mo_coeff, one_rdm, two_rdm, alpha, beta, mu, rho,
                 lambda_min):
            mo = self.oao_coeff @ oao_mo_coeff
            h1 = _tr.int1e_transform(self.int1e_ao, mo)
            g2 = _tr.int2e_transform(self.int2e_ao, mo)
            grad4 = self.analytic_gradient_from_integrals(
                h1, g2, one_rdm, two_rdm)
            hess4 = self.analytic_hessian_from_integrals(
                h1, g2, one_rdm, two_rdm)
            grad = _kappa.skew_symmetric_to_vector(
                grad4)[self._params_idx_dev]
            hess = _fock.full_hessian_to_matrix(hess4, self.params_idx,
                                                self.nao)

            def objective(kappa_flat):
                k_mat = self.kappa_vector_to_matrix(kappa_flat)
                mo_k = mo @ expm(-k_mat)
                c0, c1, c2 = self.get_active_integrals(mo_k)
                return _tr.energy_from_rdms(c0, c1, c2, one_rdm, two_rdm)

            kappa0 = jnp.zeros(self.n_kappa, dtype=mo.dtype)
            new_kappa, lowest, t, e_after = damped_newton_step_pure(
                objective, kappa0, grad, hess, alpha=alpha, beta=beta,
                mu=mu, rho=rho, lambda_min=lambda_min)
            new_oao = oao_mo_coeff @ expm(
                -self.kappa_vector_to_matrix(new_kappa))
            return new_oao, e_after, lowest

        fn = jax.jit(step)
        self._jit_cache["orb_step"] = fn
        return fn

    def orbital_optimization(self, one_rdm, two_rdm, conv_tol=1e-8,
                             max_iterations=100, verbose=0, alpha=1e-4,
                             beta=0.5, mu=1e-6, rho=1.1, lambda_min=1e-6,
                             **kwargs):
        """Damped-Newton orbital optimization at fixed RDMs
        (reference oo_energy.py:426-474).  Returns the energy trajectory;
        updates self.oao_mo_coeff in place (warm-start semantics)."""
        step = self._orbital_step_fn()
        one_rdm = jnp.asarray(one_rdm)
        two_rdm = jnp.asarray(two_rdm)
        energy_l = []
        if verbose:
            e0 = float(self.energy_from_mo_coeff(self.mo_coeff, one_rdm,
                                                 two_rdm))
            print(f"Starting energy: {e0:.12f}")
        for n in range(max_iterations):
            new_oao, energy, lowest = step(self.oao_mo_coeff, one_rdm,
                                           two_rdm, alpha, beta, mu, rho,
                                           lambda_min)
            self.oao_mo_coeff = new_oao
            energy_l.append(float(energy))
            if verbose:
                print(f"iter = {n:03}, energy = {energy_l[-1]:.12f}")
            if n > 1 and abs(energy_l[-1] - energy_l[-2]) < conv_tol:
                if verbose:
                    print("Orbital optimization finished.")
                    print("E_fin =", energy_l[-1])
                break
        return energy_l
