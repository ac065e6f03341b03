"""Noisy OO-PQC: shot-noise-model optimization done right.

Capability mirror of reference noisy_oo_pqc.py:21-152 (additive Gaussian
noise of given variance on every gradient/Hessian block, feeding the damped
Newton optimizer) with the reference's bugs fixed (SURVEY.md):

* variance is plumbed through full_noisy_optimization (the reference called
  the noisy blocks without it -> TypeError, noisy_oo_pqc.py:121-122);
* randomness uses explicit jax.random PRNG keys instead of global torch
  state, so runs are reproducible and jit-safe;
* backend-generic (the reference hard-coded torch).
"""

import jax
import jax.numpy as jnp

from .oo_pqc import OO_pqc
from ..ops.linalg import expm
from ..utils.newton_raphson import damped_newton_step_pure


class Noisy_OO_pqc(OO_pqc):
    """OO_pqc with Gaussian noise on derivative blocks
    (reference noisy_oo_pqc.py:21)."""

    def __init__(self, pqc, mol, ncas, nelecas, oao_mo_coeff=None,
                 freeze_active=False, seed=0):
        super().__init__(pqc, mol, ncas, nelecas, oao_mo_coeff=oao_mo_coeff,
                         freeze_active=freeze_active)
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self, key=None):
        if key is not None:
            return key
        self._key, sub = jax.random.split(self._key)
        return sub

    def _noisify(self, exact, variance, key):
        return exact + (variance ** 0.5) * jax.random.normal(
            key, exact.shape, dtype=exact.dtype)

    def noisy_circuit_gradient(self, theta, variance, key=None):
        return self._noisify(self.circuit_gradient(theta), variance,
                             self._next_key(key))

    def noisy_orbital_gradient(self, theta, variance, key=None):
        return self._noisify(self.orbital_gradient(theta), variance,
                             self._next_key(key))

    def noisy_circuit_circuit_hessian(self, theta, variance, key=None):
        return self._noisify(self.circuit_circuit_hessian(theta), variance,
                             self._next_key(key))

    def noisy_orbital_circuit_hessian(self, theta, variance, key=None):
        return self._noisify(self.orbital_circuit_hessian(theta), variance,
                             self._next_key(key))

    def noisy_orbital_orbital_hessian(self, theta, variance, key=None):
        return self._noisify(self.orbital_orbital_hessian(theta), variance,
                             self._next_key(key))

    def full_noisy_gradient(self, theta, variance, key=None):
        key = self._next_key(key)
        k1, k2 = jax.random.split(key)
        return jnp.concatenate([
            self.noisy_circuit_gradient(theta, variance, k1),
            self.noisy_orbital_gradient(theta, variance, k2)])

    def full_noisy_hessian(self, theta, variance, key=None):
        key = self._next_key(key)
        k1, k2, k3 = jax.random.split(key, 3)
        hess_cc = self.noisy_circuit_circuit_hessian(theta, variance, k1)
        hess_oc = self.noisy_orbital_circuit_hessian(theta, variance, k2)
        hess_oo = self.noisy_orbital_orbital_hessian(theta, variance, k3)
        return jnp.block([[hess_cc, hess_oc.T], [hess_oc, hess_oo]])

    def _noisy_step_fn(self):
        """One noisy damped-Newton iteration as two device programs: the
        SHARED compiled grad+Hessian program of the NR core, then a
        jitted noisify+solve+line-search+update program.  Noise is
        block-wise Gaussian (cc / oc / oo Hessian blocks, mirroring the
        reference's per-block noise model, noisy_oo_pqc.py:52-100); the
        Armijo line search uses the EXACT energy."""
        if getattr(self, "_noisy_step", None) is not None:
            return self._noisy_step
        core = self._core
        mol_args = self._mol_args
        nt = int(self.pqc.theta_shape)
        nk = int(self.n_kappa)
        kappa_vector_to_matrix = self.kappa_vector_to_matrix

        # molecule arrays travel as runtime ARGUMENTS (same discipline as
        # _build_nr_core: closure capture would re-embed the AO integrals
        # and gate tables as program constants)
        def noisy_update(theta, oao, int1e_ao, int2e_ao, oao_coeff, nuc,
                         tables, key, variance, e0, grad, hess,
                         alpha, beta, mu, rho, lambda_min):
            kg, kcc, koc, koo = jax.random.split(key, 4)
            sd = jnp.sqrt(variance)
            grad = grad + sd * jax.random.normal(kg, grad.shape,
                                                 grad.dtype)
            ncc = sd * jax.random.normal(kcc, (nt, nt), hess.dtype)
            noc = sd * jax.random.normal(koc, (nk, nt), hess.dtype)
            noo = sd * jax.random.normal(koo, (nk, nk), hess.dtype)
            hess = hess + jnp.block([[ncc, noc.T], [noc, noo]])

            def objective(flat):
                return core["energy"](flat[:nt], flat[nt:], oao, int1e_ao,
                                      int2e_ao, oao_coeff, nuc, tables)

            flat0 = jnp.concatenate(
                [theta, jnp.zeros(nk, dtype=theta.dtype)])
            # e0 is exact, so the Armijo thresholds are exact even though
            # the step direction is noisy
            new_flat, lowest, t, e_t = damped_newton_step_pure(
                objective, flat0, grad, hess, alpha=alpha, beta=beta,
                mu=mu, rho=rho, lambda_min=lambda_min, e0=e0)
            new_theta = new_flat[:nt]
            new_kappa = new_flat[nt:]
            new_oao = oao @ expm(-kappa_vector_to_matrix(new_kappa))
            return new_theta, new_kappa, new_oao, e_t, lowest

        noisy_update_jit = jax.jit(noisy_update)

        def step(theta, oao, key, variance, alpha, beta, mu, rho,
                 lambda_min):
            e0, grad, hess = core["grad_hess_jit"](theta, oao, *mol_args)
            return noisy_update_jit(theta, oao, *mol_args, key, variance,
                                    e0, grad, hess, alpha, beta, mu, rho,
                                    lambda_min)

        self._noisy_step = step
        return self._noisy_step

    def full_noisy_optimization(self, theta_init, variance,
                                max_iterations=50, conv_tol=1e-10,
                                verbose=0, key=None, alpha=1e-4, beta=0.5,
                                mu=1e-6, rho=1.1, lambda_min=1e-6,
                                **kwargs):
        """Damped-Newton optimization with noisy derivatives
        (reference noisy_oo_pqc.py:102-152, with variance/PRNG fixed).

        Returns (energy_l, theta_l, kappa_l, oao_mo_coeff_l, hess_eig_l)."""
        theta = jnp.asarray(theta_init)
        if key is not None:
            self._key = key
        energy_init = float(self.energy_from_parameters(theta))
        if verbose:
            print(f"iter = 000, energy = {energy_init:.12f}")
        theta_l, kappa_l, oao_mo_coeff_l = [], [], []
        energy_l, hess_eig_l = [], []
        step = self._noisy_step_fn()
        variance = jnp.asarray(variance, dtype=jnp.float64)
        for n in range(max_iterations):
            theta, kappa, new_oao, energy, lowest = step(
                theta, self.oao_mo_coeff, self._next_key(), variance,
                alpha, beta, mu, rho, lambda_min)
            self.oao_mo_coeff = new_oao
            theta_l.append(theta)
            kappa_l.append(kappa)
            oao_mo_coeff_l.append(new_oao)
            energy_l.append(float(energy))
            hess_eig_l.append(float(lowest))
            if verbose:
                print(f"iter = {n + 1:03}, energy = {energy_l[-1]:.12f}")
            if n > 1 and abs(energy_l[-1] - energy_l[-2]) < conv_tol:
                if verbose:
                    print("optimization finished.")
                    print("E_fin =", energy_l[-1])
                break
        return energy_l, theta_l, kappa_l, oao_mo_coeff_l, hess_eig_l
