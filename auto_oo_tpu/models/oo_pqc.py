"""OO_pqc: hybrid circuit + orbital cost with exact gradients/Hessians.

API mirror of reference oo_pqc.py:30-207 on a fully jitted JAX core.  The
cost is E(theta, kappa) = c0 + sum h~ gamma(theta) + sum g Gamma(theta)
with MOs rotated by expm(-kappa).  Derivative blocks:

* circuit gradient / circuit-circuit Hessian: jax.grad / jax.hessian
  through the in-house statevector simulator (replacing PennyLane
  backprop, reference oo_pqc.py:86-111);
* orbital gradient / orbital-orbital Hessian: closed-form generalized-Fock
  expressions (reference oo_pqc.py:97-101,127-130);
* mixed block: jax.jacobian of the (AD-traceable) analytic orbital
  gradient w.r.t. theta (reference oo_pqc.py:113-125).

``full_optimization`` compiles one damped-Newton iteration — energy,
all five blocks, augmented-Hessian step, line search, MO update — into a
single XLA program; the Python loop only records trajectories and checks
convergence (one device roundtrip per iteration).

Known reference bugs fixed here (SURVEY.md):
* kappa trajectory records kappa, not theta (reference oo_pqc.py:189);
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import kappa as _kappa
from ..ops import fock as _fock
from ..ops import transforms as _tr
from ..ops.linalg import expm
from ..utils.newton_raphson import NewtonStep, damped_newton_step_pure
from .oo_energy import OO_energy


class OO_pqc(OO_energy):
    """Orbital-optimized PQC energy (reference oo_pqc.py:30)."""

    def __init__(self, pqc, mol, ncas, nelecas, oao_mo_coeff=None,
                 freeze_active=False, interface=None):
        super().__init__(mol, ncas, nelecas, oao_mo_coeff=oao_mo_coeff,
                         freeze_active=freeze_active)
        self.pqc = pqc
        self._build_pure_fns()

    # -- pure functional core --------------------------------------------

    def _build_pure_fns(self):
        pqc = self.pqc

        def energy_pure(theta, kappa, oao_mo_coeff):
            mo = self.oao_coeff @ oao_mo_coeff
            mo = mo @ expm(-self.kappa_vector_to_matrix(kappa))
            one_rdm, two_rdm = pqc._rdms_impl(theta)
            c0, c1, c2 = self.get_active_integrals(mo)
            return _tr.energy_from_rdms(c0, c1, c2, one_rdm, two_rdm)

        def orbital_gradient_pure(theta, oao_mo_coeff):
            mo = self.oao_coeff @ oao_mo_coeff
            one_rdm, two_rdm = pqc._rdms_impl(theta)
            h1 = _tr.int1e_transform(self.int1e_ao, mo)
            g2 = _tr.int2e_transform(self.int2e_ao, mo)
            grad4 = self.analytic_gradient_from_integrals(
                h1, g2, one_rdm, two_rdm)
            return _kappa.skew_symmetric_to_vector(
                grad4)[self._params_idx_dev]

        def grad_hess_pure(theta, oao_mo_coeff):
            """Energy, full gradient, full (theta+kappa) Hessian."""
            kappa0 = jnp.zeros(self.n_kappa, dtype=theta.dtype)
            e0 = energy_pure(theta, kappa0, oao_mo_coeff)
            grad_c = jax.grad(energy_pure, argnums=0)(
                theta, kappa0, oao_mo_coeff)
            grad_o = orbital_gradient_pure(theta, oao_mo_coeff)
            hess_cc = jax.jacfwd(jax.grad(energy_pure, argnums=0),
                                 argnums=0)(theta, kappa0, oao_mo_coeff)
            hess_oc = jax.jacfwd(orbital_gradient_pure, argnums=0)(
                theta, oao_mo_coeff)
            one_rdm, two_rdm = pqc._rdms_impl(theta)
            mo = self.oao_coeff @ oao_mo_coeff
            h1 = _tr.int1e_transform(self.int1e_ao, mo)
            g2 = _tr.int2e_transform(self.int2e_ao, mo)
            hess4 = self.analytic_hessian_from_integrals(
                h1, g2, one_rdm, two_rdm)
            hess_oo = _fock.full_hessian_to_matrix(
                hess4, self.params_idx, self.nao)
            nt = theta.shape[0]
            grad = jnp.concatenate([grad_c, grad_o])
            hess = jnp.block([[hess_cc.reshape(nt, nt), hess_oc.T],
                              [hess_oc, hess_oo]])
            return e0, grad, hess

        def nr_iteration(theta, oao_mo_coeff, alpha, beta, mu, rho,
                         lambda_min):
            e0, grad, hess = grad_hess_pure(theta, oao_mo_coeff)
            nt = theta.shape[0]

            def objective(flat):
                return energy_pure(flat[:nt], flat[nt:], oao_mo_coeff)

            flat0 = jnp.concatenate(
                [theta, jnp.zeros(self.n_kappa, dtype=theta.dtype)])
            new_flat, lowest, t, _ = damped_newton_step_pure(
                objective, flat0, grad, hess, alpha=alpha, beta=beta,
                mu=mu, rho=rho, lambda_min=lambda_min)
            new_theta = new_flat[:nt]
            new_kappa = new_flat[nt:]
            new_oao = oao_mo_coeff @ expm(
                -self.kappa_vector_to_matrix(new_kappa))
            kappa0 = jnp.zeros(self.n_kappa, dtype=theta.dtype)
            e_new = energy_pure(new_theta, kappa0, new_oao)
            return new_theta, new_kappa, new_oao, e_new, lowest

        self._energy_pure = energy_pure
        self._orbital_gradient_pure = orbital_gradient_pure
        self._energy_jit = jax.jit(energy_pure)
        self._grad_hess_jit = jax.jit(grad_hess_pure)
        self._nr_iteration_jit = jax.jit(nr_iteration)

    # -- reference-API derivative blocks ---------------------------------

    def energy_from_parameters(self, theta, kappa=None):
        """Hybrid cost E(theta, kappa) (reference oo_pqc.py:64-84)."""
        theta = jnp.asarray(theta)
        if kappa is None:
            kappa = jnp.zeros(self.n_kappa, dtype=theta.dtype)
        return self._energy_jit(theta, jnp.asarray(kappa),
                                self.oao_mo_coeff)

    def circuit_gradient(self, theta):
        """dE/dtheta by AD through the simulator
        (reference oo_pqc.py:86-95)."""
        theta = jnp.asarray(theta)
        kappa0 = jnp.zeros(self.n_kappa, dtype=theta.dtype)
        return jax.grad(self._energy_pure, argnums=0)(
            theta, kappa0, self.oao_mo_coeff)

    def orbital_gradient(self, theta):
        """Analytic Fock gradient at the RDMs of theta
        (reference oo_pqc.py:97-101)."""
        return self._orbital_gradient_pure(jnp.asarray(theta),
                                           self.oao_mo_coeff)

    def circuit_circuit_hessian(self, theta):
        """d2E/dtheta2 (reference oo_pqc.py:103-111)."""
        theta = jnp.asarray(theta)
        kappa0 = jnp.zeros(self.n_kappa, dtype=theta.dtype)
        nt = theta.shape[0]
        return jax.jacfwd(jax.grad(self._energy_pure, argnums=0),
                          argnums=0)(theta, kappa0,
                                     self.oao_mo_coeff).reshape(nt, nt)

    def orbital_circuit_hessian(self, theta):
        """Mixed block: d(analytic orbital gradient)/dtheta
        (reference oo_pqc.py:113-125).  Shape (n_kappa, n_theta)."""
        theta = jnp.asarray(theta)
        return jax.jacfwd(self._orbital_gradient_pure, argnums=0)(
            theta, self.oao_mo_coeff).reshape(self.n_kappa,
                                              theta.shape[0])

    def orbital_orbital_hessian(self, theta):
        """Analytic orbital Hessian at the RDMs of theta
        (reference oo_pqc.py:127-130)."""
        one_rdm, two_rdm = self.pqc.get_rdms(theta)
        return self.full_hessian_to_matrix(
            self.analytic_hessian(one_rdm, two_rdm))

    def full_gradient(self, theta):
        """[circuit, orbital] gradient (reference oo_pqc.py:132-134)."""
        return jnp.concatenate([self.circuit_gradient(theta),
                                self.orbital_gradient(theta)])

    def full_hessian(self, theta):
        """2x2 block Hessian (reference oo_pqc.py:136-148)."""
        _, _, hess = self._grad_hess_jit(jnp.asarray(theta),
                                         self.oao_mo_coeff)
        return hess

    def full_circuit_hessian_to_matrix(self, full_circuit_hessian):
        size = int(np.prod(self.pqc.theta_shape))
        return full_circuit_hessian.reshape(size, size)

    # -- the optimizer loop ----------------------------------------------

    def full_optimization(self, theta_init, max_iterations=50,
                          conv_tol=1e-10, verbose=0, flush=True,
                          alpha=1e-4, beta=0.5, mu=1e-6, rho=1.1,
                          lambda_min=1e-6, monitor=None, **kwargs):
        """Newton-Raphson on (theta, kappa) jointly
        (reference oo_pqc.py:155-207).

        Returns (energy_l, theta_l, kappa_l, oao_mo_coeff_l, hess_eig_l).
        One jitted device call per iteration."""
        theta = jnp.asarray(theta_init)
        energy_init = float(self.energy_from_parameters(theta))
        if verbose is not None and verbose:
            print(f"iter = 000, energy = {energy_init:.12f}", flush=flush)

        theta_l, kappa_l, oao_mo_coeff_l = [], [], []
        energy_l, hess_eig_l = [], []

        for n in range(max_iterations):
            theta, kappa, new_oao, energy, lowest = self._nr_iteration_jit(
                theta, self.oao_mo_coeff, alpha, beta, mu, rho, lambda_min)
            self.oao_mo_coeff = new_oao
            theta_l.append(theta)
            kappa_l.append(kappa)
            oao_mo_coeff_l.append(new_oao)
            energy_l.append(float(energy))
            hess_eig_l.append(float(lowest))
            if monitor is not None:
                monitor.log(n + 1, energy_l[-1],
                            lowest_hess_eig=hess_eig_l[-1])
            if verbose is not None and verbose:
                print(f"iter = {n + 1:03}, energy = {energy_l[-1]:.12f}",
                      flush=flush)
            if n > 1 and abs(energy_l[-1] - energy_l[-2]) < conv_tol:
                if verbose is not None and verbose:
                    print("optimization finished.")
                    print("E_fin =", energy_l[-1])
                break
        return energy_l, theta_l, kappa_l, oao_mo_coeff_l, hess_eig_l
