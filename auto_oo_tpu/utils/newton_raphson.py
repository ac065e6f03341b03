"""Damped / augmented-Hessian Newton-Raphson optimizer (pure JAX).

API mirror of reference utils/newton_raphson.py:16-224 (NewtonStep with
newton_step / backtracking / damped_newton_step) redesigned as pure
functions that compile on TPU:

* the Hessian augmentation is branchless (jnp.where) instead of a Python
  if, so the step traces once;
* backtracking line search is a lax.while_loop with the same Armijo rule
  f(x + t dp) < f(x) + alpha t G.dp, halving t up to lmax then falling
  back to t=0 (reference newton_raphson.py:131-192);
* the lowest Hessian eigenvalue is returned on-device (it is a physics
  observable tracked through Berry-phase loops).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linalg import eigh as _sym_eigh


def wolfe(t, grad, dp, alpha=1e-4):
    """Armijo decrease threshold (reference newton_raphson.py:12)."""
    return alpha * t * jnp.dot(grad, dp)


# above this Hessian size the TPU path solves iteratively (Lanczos +
# inverse power iteration + Newton-Schulz; ops/linalg.py): the Jacobi
# eigendecomposition's ~30 sweeps of 2(n-1) dense matmuls cost 3.2 s at
# n = 362 (a cc-pVDZ orbital Hessian) vs ~0.2 s for the iterative route.
# CPU keeps LAPACK eigh at every size.
_ITERATIVE_MIN_N = 128


def newton_step_pure(gradient, hessian, mu=1e-6, rho=1.1, lambda_min=1e-6,
                     aug=True, method=None):
    """dp = -H^{-1} G with conditional augmentation H += (mu+rho|l0|) I.

    Returns (dp, lowest_eigenvalue). Fully traceable / jittable.
    `method` forces 'eigh' or 'iterative'; by default large Hessians on
    the TPU backend take the iterative route (see _ITERATIVE_MIN_N) —
    same augmentation rule, direction equal to the eigh path up to the
    refined-lambda_0 shift (exact for separated spectra, ~1% direction
    delta for pathologically clustered ones).
    """
    if method is None:
        import jax as _jax
        n = hessian.shape[-1]
        method = ("iterative"
                  if (_jax.default_backend() != "cpu"
                      and n >= _ITERATIVE_MIN_N)
                  else "eigh")
    if method == "iterative":
        from ..ops.linalg import newton_dir_iterative
        return newton_dir_iterative(gradient, hessian, mu=mu, rho=rho,
                                    lambda_min=lambda_min, aug=aug)
    # jnp.linalg.eigh NaNs for general f64 matrices on the TPU
    # backend; use the in-house Jacobi eigensolver (ops/linalg.py)
    w, V = _sym_eigh(hessian)
    lowest = w[0]
    if aug:
        shift = jnp.where(lowest < lambda_min,
                          mu + rho * jnp.abs(lowest), 0.0)
    else:
        shift = 0.0
    w_aug = w + shift
    dp = -(V @ ((V.T @ gradient) / w_aug))
    return dp, lowest


def backtracking_pure(objective_flat, params_flat, dp, gradient,
                      alpha=1e-4, beta=0.5, lmax=20, e0=None):
    """Armijo backtracking on a flat parameter vector.

    objective_flat: traceable f(flat_params) -> scalar.
    e0: optional precomputed objective at params_flat (passing it avoids
    re-tracing a full objective evaluation in the compiled program).
    Returns (new_flat_params, t, new_energy).  lax.while_loop keeps the
    trial count data-dependent without recompilation.
    """
    if e0 is None:
        e0 = objective_flat(params_flat)
    gdp = jnp.dot(gradient, dp)
    # floating-point slack on the Armijo comparison: near convergence the
    # true decrease drops below f64 resolution of the energy (~eps |e0|),
    # and a strict test then burns all lmax halvings on pure-roundoff
    # comparisons before falling back to t=0 — observed as rogue
    # NR iterations costing lmax energy evaluations (bench max/min
    # ratios up to 14x).  64 eps |e0| ~ 1e-12 Ha here: far below any
    # conv_tol in use, so no real descent decision is altered, but
    # roundoff-level trials accept immediately.
    slack = 64.0 * jnp.finfo(jnp.float64).eps * jnp.maximum(
        1.0, jnp.abs(e0))

    # the t=1 trial happens INSIDE the while loop (first iteration halves
    # the sentinel t=1/beta back to 1), so the objective is traced once
    # for the whole search instead of once outside + once in the body —
    # the line-search energy region dominates this program's compile time
    def cond(state):
        t, e_t, num = state
        return jnp.logical_and(e_t > e0 + alpha * t * gdp + slack,
                               num < lmax)

    def body(state):
        t, _, num = state
        # first trial is forced to EXACTLY 1.0 (beta * (1/beta) need not
        # round-trip for general beta, and the canonical full Newton step
        # should not be perturbed in the last ulp)
        t_new = jnp.where(num == 0, 1.0, beta * t)
        e_new = objective_flat(params_flat + t_new * dp)
        return (t_new, e_new, num + 1)

    t, e_t, num = jax.lax.while_loop(
        cond, body, (1.0 / beta, jnp.asarray(jnp.inf, dtype=e0.dtype), 0))
    # exhausted without an Armijo-satisfying trial -> return the origin
    failed = e_t > e0 + alpha * t * gdp + slack
    t = jnp.where(failed, 0.0, t)
    e_t = jnp.where(failed, e0, e_t)
    return params_flat + t * dp, t, e_t


def damped_newton_step_pure(objective_flat, params_flat, gradient, hessian,
                            alpha=1e-4, beta=0.5, mu=1e-6, rho=1.1,
                            lambda_min=1e-6, lmax=20, aug=True, e0=None,
                            method=None):
    """One damped Newton step on flat parameters; returns
    (new_flat_params, lowest_eigenvalue, t, energy_after).

    ACCURACY CONTRACT on the returned lowest eigenvalue: with the default
    method selection, large Hessians (n >= _ITERATIVE_MIN_N) on non-CPU
    backends use the iterative solver, whose Rayleigh-refined lowest
    eigenvalue is exact for separated spectra but can carry ~1% error on
    pathologically clustered ones (and a failed solve falls back to the
    exact eigh on device — see ops/linalg.newton_dir_iterative).  Callers
    that track `lowest` as a physics observable (e.g. the conical-
    intersection diagnostic through Berry-phase loops) and need it exact
    should pass method='eigh' — exposed as `newton_method` on OO_pqc and
    BerryPhaseLoop."""
    dp, lowest = newton_step_pure(gradient, hessian, mu=mu, rho=rho,
                                  lambda_min=lambda_min, aug=aug,
                                  method=method)
    newp, t, e_t = backtracking_pure(objective_flat, params_flat, dp,
                                     gradient, alpha=alpha, beta=beta,
                                     lmax=lmax, e0=e0)
    return newp, lowest, t, e_t


def split_list_shapes(parameters, paramshapes):
    """Split a flat vector into chunks of the given shapes
    (reference newton_raphson.py:214-224)."""
    chunks = []
    num = 0
    for shape in paramshapes:
        size = int(np.prod(shape)) if len(shape) else 1
        chunks.append(parameters[num:num + size].reshape(shape))
        num += size
    return chunks


class NewtonStep:
    """API-compatible wrapper around the pure functions
    (reference newton_raphson.py:16-211)."""

    def __init__(self, alpha=1e-4, beta=0.5, mu=1e-6, rho=1.1, lmax=20,
                 lambda_min=1e-6, aug=True, verbose=0):
        self.alpha = alpha
        self.beta = beta
        self.mu = mu
        self.rho = rho
        self.lmax = lmax
        self.lambda_min = lambda_min
        self.aug = aug
        self.verbose = verbose

    def newton_step(self, gradient, hessian):
        dp, lowest = newton_step_pure(
            gradient, hessian, mu=self.mu, rho=self.rho,
            lambda_min=self.lambda_min, aug=self.aug)
        if self.verbose:
            print("lowest eigval hessian =", float(lowest))
        return dp, float(lowest)

    def backtracking(self, objective_fn, parameters, dp, gradient):
        paramshapes = [np.shape(p) for p in parameters]

        def objective_flat(flat):
            return objective_fn(*split_list_shapes(flat, paramshapes))

        flat = jnp.concatenate([jnp.ravel(p) for p in parameters])
        newp, t, e_t = backtracking_pure(
            objective_flat, flat, dp, gradient,
            alpha=self.alpha, beta=self.beta, lmax=self.lmax)
        if self.verbose:
            print("line search t =", float(t), "new energy:", float(e_t))
        if len(parameters) > 1:
            return tuple(split_list_shapes(newp, paramshapes)), float(e_t)
        return newp, float(e_t)

    def damped_newton_step(self, objective_fn, parameters, gradient,
                           hessian):
        """Returns (new_parameters, lowest_hessian_eigenvalue) —
        reference newton_raphson.py:194-211."""
        dp, lowest = self.newton_step(gradient, hessian)
        new_parameters, _ = self.backtracking(
            objective_fn, parameters, dp, gradient)
        return new_parameters, lowest
