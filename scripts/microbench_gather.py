"""Microbenchmark: flat element-gather E_pq maps vs string-grid row
gathers, at (10e,10o)-sector shapes, on the current default device.

The sector E_pq kernels today gather (n2, Ds) elements with arbitrary
int32 source maps (ops/rdms.apply_epq_all).  In the alpha/beta string
factorization the same operator action is n2 ROW gathers on the
(Na, Nb) string grid (alpha spin) plus n2 row gathers on the transpose
(beta spin), with rank-1 sign corrections.  Same bytes moved, contiguous
rows instead of random elements.  This script measures whether XLA:TPU
rewards that (expected: >5x), before the kernels are built for real.

Usage: python scripts/microbench_gather.py [B] [ncas] [f32|f64]
"""

import os
import sys
import time

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ncas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    prec = sys.argv[3] if len(sys.argv) > 3 else "f32"

    os.makedirs(_CACHE, exist_ok=True)
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    import jax.numpy as jnp
    import numpy as np
    from math import comb

    dt = jnp.float32 if prec == "f32" else jnp.float64
    na = ncas // 2
    Na = comb(ncas, na)
    Nb = Na
    Ds = Na * Nb
    n2 = ncas * ncas
    print(f"device={jax.devices()[0].platform} Ds={Ds} Na={Na} "
          f"n2={n2} B={B} {prec}", file=sys.stderr)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, Ds)), dtype=dt)

    # flat maps, random but realistic (each row a derangement-ish map)
    src_flat = jnp.asarray(
        rng.integers(0, Ds, size=(2, n2, Ds)), dtype=jnp.int32)
    sgn_flat = jnp.asarray(
        rng.integers(-1, 2, size=(2, n2, Ds)), dtype=jnp.int8)

    def flat_phi(x, src, sgn):
        s = sgn.astype(x.dtype)
        return x[:, src[0]] * s[0] + x[:, src[1]] * s[1]

    # grid maps
    srcA = jnp.asarray(rng.integers(0, Na, size=(n2, Na)), dtype=jnp.int32)
    sgnA = jnp.asarray(rng.integers(-1, 2, size=(n2, Na)), dtype=jnp.int8)
    tB = jnp.asarray(1 - 2 * rng.integers(0, 2, size=(n2, Nb)),
                     dtype=jnp.int8)
    srcB = jnp.asarray(rng.integers(0, Nb, size=(n2, Nb)), dtype=jnp.int32)
    sgnB = jnp.asarray(rng.integers(-1, 2, size=(n2, Nb)), dtype=jnp.int8)
    tA = jnp.asarray(1 - 2 * rng.integers(0, 2, size=(n2, Na)),
                     dtype=jnp.int8)

    def grid_phi(x, srcA, sgnA, tB, srcB, sgnB, tA):
        xg = x.reshape(B, Na, Nb)
        sA = sgnA.astype(x.dtype)
        tb = tB.astype(x.dtype)
        sB = sgnB.astype(x.dtype)
        ta = tA.astype(x.dtype)
        pa = xg[:, srcA, :] * sA[:, :, None] * tb[:, None, :]
        xt = jnp.swapaxes(xg, -1, -2)
        pb = xt[:, srcB, :] * sB[:, :, None] * ta[:, None, :]
        phi = pa + jnp.swapaxes(pb, -1, -2)
        return phi.reshape(B, n2, Ds)

    # grid "epq_sum" pattern: per-pq row index into the pq-th slab
    def grid_sum(Y, srcA, sgnA, tB, srcB, sgnB, tA):
        Yg = Y.reshape(B, n2, Na, Nb)
        rows = jnp.arange(n2)
        sA = sgnA.astype(Y.dtype)
        tb = tB.astype(Y.dtype)
        sB = sgnB.astype(Y.dtype)
        ta = tA.astype(Y.dtype)
        Ga = Yg[:, rows[:, None], srcA, :]
        outA = jnp.sum(Ga * sA[:, :, None] * tb[:, None, :], axis=1)
        Yt = jnp.swapaxes(Yg, -1, -2)
        Gb = Yt[:, rows[:, None], srcB, :]
        outBt = jnp.sum(Gb * sB[:, :, None] * ta[:, None, :], axis=1)
        return (outA + jnp.swapaxes(outBt, -1, -2)).reshape(B, Ds)

    def flat_sum(Y, src, sgn):
        rows = jnp.arange(n2)[:, None]
        s0 = sgn[0].astype(Y.dtype)
        s1 = sgn[1].astype(Y.dtype)

        def one(y):
            return ((y[rows, src[0]] * s0).sum(axis=0)
                    + (y[rows, src[1]] * s1).sum(axis=0))

        return jax.vmap(one)(Y)

    def timed(name, fn, *args, n=8):
        # block_until_ready has been observed NOT to fence on the
        # tunneled device runtime; a 1-element device_get is a true
        # completion barrier.  n calls back-to-back, one fence, /n.
        f = jax.jit(fn)
        out = f(*args)
        jax.device_get(out.ravel()[:1])
        t0 = time.time()
        for _ in range(n):
            out = f(*args)
        jax.device_get(out.ravel()[:1])
        med = (time.time() - t0) / n
        gb = out.size * out.dtype.itemsize / 1e9
        print(f"{name:28s} {med * 1e3:9.2f} ms   out {gb:.2f} GB "
              f"-> {gb / med:7.1f} GB/s eff", file=sys.stderr)
        return out, med

    phi_f, t_flat = timed("flat phi (element gather)", flat_phi, x,
                          src_flat, sgn_flat)
    phi_g, t_grid = timed("grid phi (row gather)", grid_phi, x, srcA,
                          sgnA, tB, srcB, sgnB, tA)
    print(f"phi speedup: {t_flat / t_grid:.2f}x", file=sys.stderr)

    _, t_fs = timed("flat epq_sum", flat_sum, phi_f, src_flat, sgn_flat)
    _, t_gs = timed("grid epq_sum", grid_sum, phi_g, srcA, sgnA, tB,
                    srcB, sgnB, tA)
    print(f"sum speedup: {t_fs / t_gs:.2f}x", file=sys.stderr)


if __name__ == "__main__":
    main()
