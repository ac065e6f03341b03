"""TPU-safe dense linear algebra helpers.

``jax.scipy.linalg.expm`` lowers to an LU solve that the TPU backend does
not implement for float64, so this module provides a matmul-only matrix
exponential (scaling-and-squaring + Taylor/Horner) that is fully
differentiable and compiles on TPU (MXU-only work).  Used for the orbital
rotation exp(-kappa) (reference oo_energy.py:230 used pennylane math.expm).
"""

import jax
import jax.numpy as jnp

_TAYLOR_ORDER = 18
_MAX_SQUARINGS = 30


def expm(A):
    """Matrix exponential via scaling-and-squaring with a Taylor/Horner
    core.  Differentiable; supports any square dtype on TPU (matmuls only,
    no LU/solve)."""
    A = jnp.asarray(A)
    n = A.shape[-1]
    norm = jnp.max(jnp.sum(jnp.abs(A), axis=-1))
    # number of halvings so the scaled norm is <= 0.5
    s = jnp.maximum(
        0, jnp.ceil(jnp.log2(jnp.maximum(norm, 1e-30)) + 1.0)).astype(
        jnp.int32)
    s = jnp.minimum(s, _MAX_SQUARINGS)
    As = A * (2.0 ** (-s)).astype(A.dtype)

    eye = jnp.eye(n, dtype=A.dtype)

    def horner(carry, _):
        return carry, None

    # Horner evaluation of sum_{k=0}^{K} As^k / k!
    X = eye + As / _TAYLOR_ORDER
    for k in range(_TAYLOR_ORDER - 1, 0, -1):
        X = eye + (As @ X) / k

    def square_step(i, X):
        return jnp.where(i < s, X @ X, X)

    X = jax.lax.fori_loop(0, _MAX_SQUARINGS, square_step, X)
    return X


def eigh(A):
    """Symmetric eigendecomposition (thin wrapper; works in f64 on TPU)."""
    return jnp.linalg.eigh(A)
