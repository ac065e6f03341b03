"""Robustness guards on the iterative Newton solve (ops/linalg.py).

The iterative route (Lanczos + Newton-Schulz inverse) is the production
solver for large Hessians on TPU; these tests inject pathological
matrices for which the raw iteration mis-solves and assert that the
on-device residual/descent guard detects it and falls back to the exact
Jacobi-eigh solve.  Runs on the CPU backend (the functions are
backend-agnostic).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from auto_oo_tpu.ops import linalg as L


def _random_spd(w, seed=0):
    n = len(w)
    rng = np.random.RandomState(seed)
    Q, _ = np.linalg.qr(rng.randn(n, n))
    return Q @ np.diag(w) @ Q.T, Q


def test_ns_inverse_residual_reports_nonconvergence():
    """symmetric_inverse_ns(with_residual=True) must expose an
    unconverged inverse: 20 iterations converge only up to cond ~ 2^7,
    so a cond=1e4 matrix fails loudly while a benign one passes."""
    n = 64
    H_bad, _ = _random_spd(np.logspace(-4, 0, n), seed=1)
    _, r_bad = L.symmetric_inverse_ns(jnp.asarray(H_bad), iters=20,
                                      with_residual=True)
    assert float(r_bad) > 1e-2

    H_ok, _ = _random_spd(np.linspace(0.5, 2.0, n), seed=2)
    X, r_ok = L.symmetric_inverse_ns(jnp.asarray(H_ok), iters=40,
                                     with_residual=True)
    assert float(r_ok) < 1e-12
    assert np.allclose(np.asarray(X), np.linalg.inv(H_ok), atol=1e-10)


@pytest.mark.slow
def test_newton_dir_falls_back_to_eigh_on_unconverged_solve():
    """A Hessian whose Newton-Schulz solve is unconverged (ns_iters cut
    to 20 at cond=1e4) previously returned a silently corrupted dp; the
    residual guard must now detect it and return the exact eigh-based
    direction and lowest eigenvalue."""
    n = 160
    w = np.logspace(-4, 0, n)
    H, _ = _random_spd(w, seed=3)
    rng = np.random.RandomState(4)
    g = rng.randn(n)

    # raw NS-20 inverse really is garbage for this matrix (the premise)
    X20 = np.asarray(L.symmetric_inverse_ns(jnp.asarray(H), iters=20))
    dp_raw = -(X20 @ g)
    assert np.linalg.norm(H @ dp_raw + g) > 1e-2 * np.linalg.norm(g)

    # guarded solve: falls back to eigh, matching the exact solution
    dp, lowest = L.newton_dir_iterative(jnp.asarray(g), jnp.asarray(H),
                                        aug=False, ns_iters=20)
    dp_exact = -np.linalg.solve(H, g)
    assert np.allclose(np.asarray(dp), dp_exact,
                       atol=1e-8 * np.linalg.norm(dp_exact))
    assert abs(float(lowest) - w[0]) < 1e-10


def test_newton_dir_guard_accepts_healthy_solve():
    """On a well-conditioned indefinite Hessian the guard must NOT
    trigger: the iterative direction equals the eigh direction (same
    augmentation rule) to solver precision."""
    n = 160
    w = np.concatenate([[-0.5], np.linspace(0.1, 2.0, n - 1)])
    H, _ = _random_spd(w, seed=5)
    rng = np.random.RandomState(6)
    g = rng.randn(n)
    dp, lowest = L.newton_dir_iterative(jnp.asarray(g), jnp.asarray(H))
    # reference: eigh path with identical augmentation
    wv, V = np.linalg.eigh(H)
    shift = 1e-6 + 1.1 * abs(wv[0])
    dp_ref = -(V @ ((V.T @ g) / (wv + shift)))
    assert abs(float(lowest) - wv[0]) < 1e-9
    assert np.allclose(np.asarray(dp), dp_ref, atol=1e-7)


def test_jacobi_eigh_differentiable():
    """jacobi_eigh carries a custom JVP (the eigendecomposition
    derivative in the primal outputs), so the TPU eigh path is
    differentiable — forward and reverse — matching jnp.linalg.eigh's
    rules to near machine precision away from degeneracies (round-3
    weak point: the while_loop inside previously made it an error)."""
    import jax

    rng = np.random.RandomState(7)
    n = 10
    A = rng.randn(n, n)
    A = jnp.asarray((A + A.T) / 2)
    dA = rng.randn(n, n)
    dA = jnp.asarray((dA + dA.T) / 2)

    (w1, V1), (dw1, dV1) = jax.jvp(lambda M: L.jacobi_eigh(M), (A,), (dA,))
    (w2, V2), (dw2, dV2) = jax.jvp(jnp.linalg.eigh, (A,), (dA,))
    s = jnp.sign(jnp.sum(V1 * V2, axis=0))
    assert np.allclose(np.asarray(w1), np.asarray(w2), atol=1e-12)
    assert np.allclose(np.asarray(dw1), np.asarray(dw2), atol=1e-11)
    assert np.allclose(np.asarray(dV1 * s), np.asarray(dV2), atol=1e-9)

    # reverse mode through the eigenvalues (the lowest-eigenvalue physics
    # observable is a direct consumer)
    coef = jnp.arange(1.0, n + 1)
    g1 = jax.grad(lambda M: L.jacobi_eigh(M)[0] @ coef)(A)
    g2 = jax.grad(lambda M: jnp.linalg.eigh(M)[0] @ coef)(A)
    assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-11)

    # jit + jacfwd compile path (what a Berry-loop sensitivity would use)
    J = jax.jit(jax.jacfwd(lambda M: L.jacobi_eigh(M)[0]))(A)
    assert J.shape == (n, n, n)


def test_jacobi_eigh_convergence_floor():
    """The off-diagonal convergence criterion must not cancel
    catastrophically: the final residual of A V - V w reaches
    ~1e-14 * ||A||, not the ~sqrt(eps) * ||A|| floor of the old
    sum(M^2) - sum(diag^2) form."""
    rng = np.random.RandomState(8)
    n = 24
    A = rng.randn(n, n)
    A = jnp.asarray((A + A.T) / 2)
    w, V = L.jacobi_eigh(A)
    resid = float(jnp.max(jnp.abs(A @ V - V * w[None, :])))
    scale = float(jnp.max(jnp.abs(A)))
    assert resid < 1e-12 * max(scale, 1.0)
