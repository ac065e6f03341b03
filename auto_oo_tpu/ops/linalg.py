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


def trig_f64(fn, x):
    """Apply a transcendental elementwise at full f64 on TPU.

    The TPU backend lowers SINGLE-element f64 transcendentals through a
    scalar path with only f32 accuracy (measured 2.4e-8 for cos of a
    1-element array vs 1.2e-15 for >= 2 elements); padding to 2 elements
    forces the accurate vector path.  No-op for larger arrays.
    """
    flat = jnp.ravel(x)
    if flat.size >= 2:
        return fn(x)
    padded = jnp.concatenate([flat, jnp.zeros(1, dtype=flat.dtype)])
    return fn(padded)[:flat.size].reshape(jnp.shape(x))


def atan2_f64(y, x):
    """arctan2 with the same single-element f64 accuracy guard as
    :func:`trig_f64`."""
    flat_y = jnp.ravel(y)
    if flat_y.size >= 2:
        return jnp.arctan2(y, x)
    yp = jnp.concatenate([flat_y, jnp.zeros(1, dtype=flat_y.dtype)])
    xp = jnp.concatenate([jnp.ravel(x), jnp.ones(1, dtype=flat_y.dtype)])
    return jnp.arctan2(yp, xp)[:flat_y.size].reshape(jnp.shape(y))


def expm(A):
    """Matrix exponential via scaling-and-squaring with a Taylor/Horner
    core.  Differentiable; supports any square dtype on TPU (matmuls only,
    no LU/solve)."""
    A = jnp.asarray(A)
    n = A.shape[-1]
    norm = jnp.max(jnp.sum(jnp.abs(A), axis=-1))
    # number of halvings so the scaled norm is <= 0.5 (floor the norm
    # inside the float32 exponent range: TPU f64 emulation underflows
    # below ~1e-38 and log2(0) -> inf handling is unreliable there)
    s = jnp.maximum(
        0.0, jnp.ceil(jnp.log2(jnp.maximum(norm, 1e-20)) + 1.0)).astype(
        jnp.int32)
    s = jnp.minimum(s, _MAX_SQUARINGS)
    As = A * (2.0 ** (-s)).astype(A.dtype)

    eye = jnp.eye(n, dtype=A.dtype)

    # Horner evaluation of sum_{k=0}^{K} As^k / k!  (lax.scan so the
    # matmul body lowers once instead of _TAYLOR_ORDER times — this
    # function appears in several differentiated regions of the fused
    # NR program and unrolling it dominated their compile time)
    ks = jnp.arange(_TAYLOR_ORDER - 1, 0, -1, dtype=A.dtype)

    def horner_step(X, k):
        return eye + (As @ X) / k, None

    X0 = eye + As / _TAYLOR_ORDER
    X, _ = jax.lax.scan(horner_step, X0, ks)

    def square_step(i, X):
        return jnp.where(i < s, X @ X, X)

    X = jax.lax.fori_loop(0, _MAX_SQUARINGS, square_step, X)
    return X


def _round_robin_orderings(n):
    """Tournament schedule: n-1 rounds of n/2 disjoint index pairs covering
    all pairs (classic round-robin; host-side, static per size)."""
    import numpy as np

    m = n + (n % 2)  # pad to even
    players = list(range(m))
    rounds = []
    for _ in range(m - 1):
        pairs = []
        for i in range(m // 2):
            a, b = players[i], players[m - 1 - i]
            if a < n and b < n:
                pairs.append((min(a, b), max(a, b)))
        rounds.append(pairs)
        players = [players[0]] + [players[-1]] + players[1:-1]
    return rounds


# 16 sweeps converge parallel round-robin Jacobi only up to n ~ 200;
# n = 362 (a cc-pVDZ orbital Hessian) needs ~20-30.  The while_loop
# stops at the off-diagonal-norm criterion, so a generous cap costs
# converged cases nothing — only the truly pathological ones pay.
_EIGH_SWEEPS = 64


def eigh(A, sweeps=_EIGH_SWEEPS, backend=None):
    """Symmetric eigendecomposition, TPU-safe.

    ``jnp.linalg.eigh`` silently returns NaN for general float64 matrices
    on the TPU backend (the LAPACK-style path is not implemented for
    emulated f64), so on TPU this uses :func:`jacobi_eigh`.  On CPU (and
    any backend with a real LAPACK path) it dispatches to
    ``jnp.linalg.eigh`` — the Jacobi form is O(sweeps n^3) in dense
    matmuls and needlessly slow for large Hessians there.

    Dispatch happens at TRACE time on ``jax.default_backend()``; when
    jitting for a backend that is not the process default, pass
    ``backend='cpu'`` / ``backend='tpu'`` explicitly.

    NOT differentiable on the TPU path: :func:`jacobi_eigh` converges via
    ``lax.while_loop``, which has no JVP/VJP rule.  Every consumer in
    this package (the Newton solve) only needs the forward value — wrap
    with ``jax.lax.stop_gradient`` or use a fixed-sweep scan if a future
    caller must differentiate through the decomposition.
    """
    import jax as _jax

    if (backend or _jax.default_backend()) == "cpu":
        return jnp.linalg.eigh(jnp.asarray(A))
    return jacobi_eigh(A, sweeps=sweeps)


def jacobi_eigh(A, sweeps=_EIGH_SWEEPS):
    """Parallel cyclic Jacobi eigensolver, built from what the TPU does
    well: each round applies n/2 disjoint Givens rotations as ONE dense
    n x n rotation matrix, so a sweep is 2(n-1) small matmuls on the MXU.
    Ascending eigenvalue order (numpy.linalg.eigh convention).
    """
    import numpy as np

    A = jnp.asarray(A)
    n = A.shape[-1]
    if n == 1:
        return A.reshape(1), jnp.ones((1, 1), dtype=A.dtype)
    rounds = _round_robin_orderings(n)
    # pack rounds into fixed arrays (n_rounds, n_pairs_max, 2); pad with
    # the (0, 0) self-pair which produces an identity rotation
    np_max = max(len(r) for r in rounds)
    pair_arr = np.zeros((len(rounds), np_max, 2), dtype=np.int32)
    mask_arr = np.zeros((len(rounds), np_max), dtype=np.float64)
    for i, r in enumerate(rounds):
        for j, (p, q) in enumerate(r):
            pair_arr[i, j] = (p, q)
            mask_arr[i, j] = 1.0
    pair_arr = jnp.asarray(pair_arr)
    mask_arr = jnp.asarray(mask_arr)

    eye = jnp.eye(n, dtype=A.dtype)

    def apply_round(carry, round_data):
        Ac, Vc = carry
        pairs, mask = round_data
        p = pairs[:, 0]
        q = pairs[:, 1]
        app = Ac[p, p]
        aqq = Ac[q, q]
        apq = Ac[p, q] * mask
        # Jacobi rotation zeroing A[p,q], via atan2 (overflow-free: the
        # classic tau = (aqq-app)/2apq form overflows tau^2 on the TPU
        # f64 emulation, whose exponent range is float32's).  The _f64
        # trig wrappers guard the single-pair (2x2/3x3 matrix) case,
        # where the TPU scalar path would round the rotation to f32.
        theta = 0.5 * atan2_f64(2.0 * apq, aqq - app)
        scale = jnp.abs(app) + jnp.abs(aqq) + 1e-30
        theta = jnp.where(jnp.abs(apq) > 1e-18 * scale, theta, 0.0)
        c = trig_f64(jnp.cos, theta)
        s = trig_f64(jnp.sin, theta)
        # masked/self pairs -> identity rotation; build R with additive
        # deltas so padded (0,0) self-pairs are harmless no-ops
        c = jnp.where(mask > 0, c, 1.0)
        s = jnp.where(mask > 0, s, 0.0)
        R = (eye.at[p, p].add(c - 1.0).at[q, q].add(c - 1.0)
             .at[p, q].add(s).at[q, p].add(-s))
        An = R.T @ Ac @ R
        Vn = Vc @ R
        return (An, Vn), None

    # converge on the off-diagonal Frobenius norm instead of running a
    # fixed sweep count: typical Hessians finish in 6-9 sweeps, and each
    # saved sweep is 2(n-1) dense matmuls of TPU f64-emulated work
    off_scale = jnp.sqrt(jnp.sum(A * A)) + 1e-30

    def off_norm(M):
        return jnp.sqrt(jnp.sum(M * M) - jnp.sum(jnp.diagonal(M) ** 2))

    def cond(state):
        (Ac, _), k = state
        return jnp.logical_and(k < sweeps,
                               off_norm(Ac) > 1e-15 * off_scale)

    def body(state):
        carry, k = state
        carry, _ = jax.lax.scan(apply_round, carry, (pair_arr, mask_arr))
        return carry, k + 1

    (Af, Vf), _ = jax.lax.while_loop(cond, body, ((A, eye), 0))
    w = jnp.diagonal(Af)
    order = jnp.argsort(w)
    return w[order], Vf[:, order]
