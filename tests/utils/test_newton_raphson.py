"""NewtonStep tests on synthetic objectives (pattern of
/root/reference/test/utils/test_newton_raphson.py: matrix diagonalization
via exp-map rotations and a 1-D log-barrier, asserting convergence).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import auto_oo_tpu
from auto_oo_tpu import NewtonStep, expm, vector_to_skew_symmetric
from auto_oo_tpu.utils.newton_raphson import (
    newton_step_pure, backtracking_pure, damped_newton_step_pure)


@pytest.mark.parametrize("dim", [2, 4, 8])
def test_matrix_diagonalization(dim):
    """Minimize tr(diag_weight * X^T A X) over rotations X = expm(-kappa):
    converges to the sorted eigenvalue sum.  The step is jitted once with
    the current rotation X as an argument — the library usage pattern
    (one compiled program, many iterations)."""
    rng = np.random.RandomState(dim)
    a = rng.randn(dim, dim)
    A = jnp.asarray(a + a.T)
    w = np.linalg.eigvalsh(np.asarray(A))
    weights = jnp.arange(dim, 0.0, -1.0)  # favors ascending order
    nk = dim * (dim - 1) // 2

    def cost(kappa, X0):
        rot = X0 @ expm(-vector_to_skew_symmetric(kappa))
        return jnp.sum(weights * jnp.diag(rot.T @ A @ rot))

    @jax.jit
    def step(X0):
        k0 = jnp.zeros(nk)
        grad = jax.grad(cost)(k0, X0)
        hess = jax.hessian(cost)(k0, X0)
        new_k, lowest, t, e = damped_newton_step_pure(
            lambda k: cost(k, X0), k0, grad, hess)
        return X0 @ expm(-vector_to_skew_symmetric(new_k)), e

    X = jnp.eye(dim)
    e_prev = np.inf
    for it in range(60):
        X, e = step(X)
        e = float(e)
        if abs(e - e_prev) < 1e-12:
            break
        e_prev = e
    # stationarity at the converged rotation, and the optimal assignment:
    # descending weights pair with ascending eigenvalues
    g_fin = jax.grad(cost)(jnp.zeros(nk), X)
    assert float(g_fin @ g_fin) < 1e-14
    target = float(jnp.sum(weights * jnp.asarray(np.sort(w))))
    assert e_prev <= target + 1e-8


@pytest.mark.slow
def test_newton_step_class_api_diagonalization():
    """The reference-compatible NewtonStep class (eager, tuple-parameter
    path) on a small rotation problem (reference
    test/utils/test_newton_raphson.py pattern)."""
    dim = 3
    rng = np.random.RandomState(3)
    a = rng.randn(dim, dim)
    A = jnp.asarray(a + a.T)
    weights = jnp.arange(dim, 0.0, -1.0)
    nk = dim * (dim - 1) // 2

    X = jnp.eye(dim)

    def cost_from(X0):
        def cost(kappa):
            rot = X0 @ expm(-vector_to_skew_symmetric(kappa))
            return jnp.sum(weights * jnp.diag(rot.T @ A @ rot))
        return cost

    opt = NewtonStep(verbose=0)
    e_prev = np.inf
    for it in range(25):
        cost = cost_from(X)
        k0 = jnp.zeros(nk)
        grad = jax.grad(cost)(k0)
        hess = jax.hessian(cost)(k0)
        # single-parameter tuples return the flat vector directly
        # (reference newton_raphson.py:186-188 semantics)
        new_k, lowest = opt.damped_newton_step(cost, (k0,), grad, hess)
        X = X @ expm(-vector_to_skew_symmetric(new_k.reshape(nk)))
        e = float(cost_from(X)(jnp.zeros(nk)))
        if abs(e - e_prev) < 1e-12:
            break
        e_prev = e
    g_fin = jax.grad(cost_from(X))(jnp.zeros(nk))
    assert float(g_fin @ g_fin) < 1e-12


def test_log_barrier_1d():
    """1-D strongly convex objective: f(x) = x^2 - log(x); minimum at
    x* solving 2x - 1/x = 0 -> x* = 1/sqrt(2)."""
    def f(x):
        return x[0] ** 2 - jnp.log(x[0])

    x = jnp.array([3.0])
    opt = NewtonStep(verbose=0)
    for _ in range(40):
        g = jax.grad(f)(x)
        h = jax.hessian(f)(x)
        x, lowest = opt.damped_newton_step(f, (x,), g, h.reshape(1, 1))
        x = x.reshape(1)
    assert abs(float(x[0]) - 1 / np.sqrt(2)) < 1e-10


def test_augmentation_rescues_indefinite():
    grad = jnp.array([1.0, -1.0])
    hess = jnp.array([[-2.0, 0.0], [0.0, 3.0]])
    dp, lowest = newton_step_pure(grad, hess)
    assert lowest == -2.0
    # augmented step is a descent direction
    assert float(grad @ dp) < 0.0


def test_backtracking_halves_until_decrease():
    def f(x):
        return jnp.sum(x ** 4)

    x0 = jnp.array([1.0])
    grad = jax.grad(f)(x0)
    dp = jnp.array([-10.0])  # huge step; full step increases f
    newp, t, e = backtracking_pure(f, x0, dp, grad)
    assert t < 1.0
    assert float(e) <= float(f(x0))


def test_line_search_failure_returns_origin():
    """If no step length satisfies Armijo within lmax, t -> 0 and the
    original parameters are returned (reference newton_raphson.py:172-177)."""
    def f(x):
        return jnp.sum(x ** 2)

    x0 = jnp.array([1.0])
    grad = jnp.array([-2.0])  # wrong sign: dp is an ascent direction
    dp = jnp.array([1.0])
    newp, t, e = backtracking_pure(f, x0, dp, grad)
    assert float(t) == 0.0
    assert np.allclose(np.asarray(newp), np.asarray(x0))


def test_iterative_newton_direction_matches_eigh():
    """The eigendecomposition-free Newton direction (Lanczos + inverse
    power iteration + Newton-Schulz, the TPU large-n path) matches the
    eigh-based direction: exactly for separated spectra, and within the
    refined-lambda_0 shift tolerance for pathologically clustered ones."""
    from auto_oo_tpu.utils.newton_raphson import newton_step_pure
    rng = np.random.RandomState(0)
    n = 200
    Q = np.linalg.qr(rng.randn(n, n))[0]
    g = jnp.asarray(rng.randn(n))
    cases = {
        "spd_clustered": (np.logspace(-8, 2, n), 3e-2, 1e-7),
        "indefinite": (np.concatenate(
            [[-0.5, -0.01], np.logspace(-4, 2, n - 2)]), 1e-10, 1e-6),
        "well_conditioned": (np.linspace(0.5, 5.0, n), 1e-12, 1e-10),
    }
    for name, (lam, dp_tol, l0_tol) in cases.items():
        H = jnp.asarray(Q @ np.diag(lam) @ Q.T)
        dp_e, l0_e = newton_step_pure(g, H, method="eigh")
        dp_i, l0_i = newton_step_pure(g, H, method="iterative")
        rel = (np.linalg.norm(np.asarray(dp_i) - np.asarray(dp_e))
               / np.linalg.norm(np.asarray(dp_e)))
        assert rel < dp_tol, (name, rel)
        assert abs(float(l0_i) - float(l0_e)) < max(
            l0_tol, 0.01 * abs(float(l0_e))), (name, l0_i, l0_e)
