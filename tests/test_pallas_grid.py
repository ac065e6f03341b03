"""Interpret-mode parity of the pallas gather kernels vs ops/grid.

The pallas kernels (ops/pallas_grid.py) must reproduce the XLA grid
kernels bit-for-bit in f32 on real sector maps — including invalid
(src=0, sgn=0) entries, open-shell rectangular grids, and batched
operands.  On-chip speed is measured separately
(scripts/microbench_pallas.py); these tests pin semantics only.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from auto_oo_tpu.ops import grid
from auto_oo_tpu.ops.pallas_grid import (
    epq_sum_pallas, gather_reduce, gather_rows_scaled, phi_all_pallas)


def _maps(ncas, nelecas):
    return grid.build_grid_maps(ncas, nelecas)


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("ncas,nelecas", [(3, 4), (4, 4), (4, (3, 1))])
def test_phi_all_matches_grid(ncas, nelecas):
    gm = _maps(ncas, nelecas)
    x = _rand((gm.dim,))
    ref = grid.phi_all(x, gm)
    out = phi_all_pallas(x, gm, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_phi_all_batched():
    gm = _maps(3, 2)
    x = _rand((2, 3, gm.dim), seed=3)
    ref = grid.phi_all(x, gm)
    out = phi_all_pallas(x, gm, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("ncas,nelecas", [(3, 4), (4, 4), (4, (3, 1))])
def test_epq_sum_matches_grid(ncas, nelecas):
    gm = _maps(ncas, nelecas)
    Y = _rand((gm.n2, gm.dim), seed=1)
    ref = grid.epq_sum(Y, gm)
    out = epq_sum_pallas(Y, gm, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_epq_sum_batched():
    gm = _maps(3, 2)
    Y = _rand((2, gm.n2, gm.dim), seed=4)
    ref = grid.epq_sum(Y, gm)
    out = epq_sum_pallas(Y, gm, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_gather_rows_partial_block():
    """Na not a multiple of the row-block size: clipped DMAs, dropped
    out-of-bounds writes."""
    rng = np.random.default_rng(7)
    ns, na, nb, n2 = 11, 13, 17, 5
    x = jnp.asarray(rng.standard_normal((ns, nb)), jnp.float32)
    src = jnp.asarray(rng.integers(0, ns, size=(n2, na)), jnp.int32)
    s = jnp.asarray(rng.standard_normal((n2, na)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((n2, nb)), jnp.float32)
    out = gather_rows_scaled(x, src, s, t, interpret=True)
    ref = (np.asarray(x)[np.asarray(src)]
           * np.asarray(s)[:, :, None] * np.asarray(t)[:, None, :])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-6)


def test_linearity_vjps():
    """The mutual custom VJPs (E_pq^T = E_qp pair transpose) match AD
    through the XLA grid kernels — the gradient-only optimizer path."""
    import jax

    gm = _maps(3, 2)
    x = _rand((gm.dim,), seed=5)
    w = _rand((gm.n2, gm.dim), seed=6)

    def loss_pallas(v):
        return jnp.sum(phi_all_pallas(v, gm, interpret=True) * w)

    def loss_ref(v):
        return jnp.sum(grid.phi_all(v, gm) * w)

    np.testing.assert_allclose(np.asarray(jax.grad(loss_pallas)(x)),
                               np.asarray(jax.grad(loss_ref)(x)),
                               rtol=0, atol=1e-5)

    g = _rand((gm.dim,), seed=7)
    Y = _rand((gm.n2, gm.dim), seed=8)

    def sloss_pallas(v):
        return jnp.sum(epq_sum_pallas(v, gm, interpret=True) * g)

    def sloss_ref(v):
        return jnp.sum(grid.epq_sum(v, gm) * g)

    np.testing.assert_allclose(np.asarray(jax.grad(sloss_pallas)(Y)),
                               np.asarray(jax.grad(sloss_ref)(Y)),
                               rtol=0, atol=1e-5)


def test_config_dispatch():
    """config.set_pallas routes the f32 grid ops through the pallas
    kernels (interpreted on CPU) and leaves f64 on the XLA path."""
    from auto_oo_tpu import config

    gm = _maps(3, 2)
    x32 = _rand((gm.dim,), seed=9)
    x64 = x32.astype(jnp.float64)
    ref32 = grid.phi_all(x32, gm)
    ref64 = grid.phi_all(x64, gm)
    config.set_pallas(True)
    try:
        out32 = grid.phi_all(x32, gm)
        out64 = grid.phi_all(x64, gm)
    finally:
        config.set_pallas(False)
    np.testing.assert_allclose(np.asarray(out32), np.asarray(ref32),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out64), np.asarray(ref64),
                               rtol=0, atol=0)


def test_gather_reduce_partial_block():
    rng = np.random.default_rng(8)
    ns, na, nb, n2 = 9, 13, 17, 5
    Y = jnp.asarray(rng.standard_normal((n2, ns, nb)), jnp.float32)
    src = jnp.asarray(rng.integers(0, ns, size=(n2, na)), jnp.int32)
    s = jnp.asarray(rng.standard_normal((n2, na)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((n2, nb)), jnp.float32)
    out = gather_reduce(Y, src, s, t, interpret=True)
    yn = np.asarray(Y)
    ref = np.zeros((na, nb), np.float32)
    for k in range(n2):
        ref += (yn[k][np.asarray(src)[k]]
                * np.asarray(s)[k][:, None] * np.asarray(t)[k][None, :])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-5)
