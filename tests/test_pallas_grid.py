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


@pytest.mark.slow
def test_nr_core_with_pallas_flag():
    """Mixed-precision sector grad+Hessian with the pallas kernels
    enabled (interpreted on CPU) matches the XLA grid path — the f32
    Hessian stages dispatch to pallas, the f64 energy/gradient stay XLA.
    A dispatch counter proves the pallas path is actually traced (the
    nr-core cache key includes the flag; a flag-blind cache would
    silently serve the XLA core and make this test vacuous)."""
    from auto_oo_tpu import config
    from auto_oo_tpu.moldata import Moldata
    from auto_oo_tpu.utils.misc import get_formal_geo
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc
    import auto_oo_tpu.ops.pallas_grid as pg

    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    pqc = Parameterized_circuit(3, 4, ansatz="np_fabric", n_layers=1,
                                sector=True)
    oo = OO_pqc(pqc, mol, 3, 4, freeze_active=True, precision="mixed")
    theta = 0.05 * jnp.arange(pqc.theta_shape, dtype=jnp.float64)
    e_r, g_r, h_r = oo._grad_hess_jit(theta, oo.oao_mo_coeff)

    calls = {"phi": 0}
    orig = pg.phi_all_pallas

    def counting(*a, **k):
        calls["phi"] += 1
        return orig(*a, **k)

    config.set_pallas(True)
    pg.phi_all_pallas = counting
    try:
        oo2 = OO_pqc(pqc, mol, 3, 4, freeze_active=True,
                     precision="mixed")
        e_p, g_p, h_p = oo2._grad_hess_jit(theta, oo2.oao_mo_coeff)
    finally:
        pg.phi_all_pallas = orig
        config.set_pallas(False)
    assert calls["phi"] > 0, "pallas path never traced"
    assert abs(float(e_p) - float(e_r)) < 1e-12
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_r),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("db", [False, True])
def test_gather_rows_partial_block(db):
    """Na not a multiple of the row-block size: clipped DMAs, dropped
    out-of-bounds writes — serial AND double-buffered kernels."""
    rng = np.random.default_rng(7)
    ns, na, nb, n2 = 11, 13, 17, 5
    x = jnp.asarray(rng.standard_normal((ns, nb)), jnp.float32)
    src = jnp.asarray(rng.integers(0, ns, size=(n2, na)), jnp.int32)
    s = jnp.asarray(rng.standard_normal((n2, na)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((n2, nb)), jnp.float32)
    out = gather_rows_scaled(x, src, s, t, interpret=True,
                             double_buffer=db)
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


def test_sliced_maps_vjp():
    """pair_slice'd maps: forward on the pallas kernels, backward via
    the XLA adjoint (the pair-transpose identity does not hold for a
    pair subset)."""
    import jax

    gm = _maps(3, 2)
    sl = grid.pair_slice(gm, 2, 7)
    x = _rand((gm.dim,), seed=11)
    w = _rand((5, gm.dim), seed=12)
    out = phi_all_pallas(x, sl, interpret=True, full_pairs=False)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(grid.phi_all(x, sl)),
                               rtol=0, atol=1e-6)
    g_p = jax.grad(lambda v: jnp.sum(
        phi_all_pallas(v, sl, interpret=True, full_pairs=False) * w))(x)
    g_r = jax.grad(lambda v: jnp.sum(grid.phi_all(v, sl) * w))(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               rtol=0, atol=1e-5)

    Y = _rand((5, gm.dim), seed=13)
    gv = _rand((gm.dim,), seed=14)
    s_p = jax.grad(lambda v: jnp.sum(
        epq_sum_pallas(v, sl, interpret=True, full_pairs=False) * gv))(Y)
    s_r = jax.grad(lambda v: jnp.sum(grid.epq_sum(v, sl) * gv))(Y)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_r),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("ncas,nelecas,r0,r1", [
    (3, 4, 0, 3), (4, 4, 2, 6), (4, (3, 1), 1, 4)])
def test_phi_rows_matches_grid(ncas, nelecas, r0, r1):
    from auto_oo_tpu.ops.pallas_grid import phi_rows_pallas

    gm = _maps(ncas, nelecas)
    x = _rand((gm.dim,), seed=15)
    ref = grid.phi_rows(x, gm, r0, r1)
    out = phi_rows_pallas(x, gm, r0, r1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)

    # batched + VJP (gradient through streamed RDMs)
    import jax

    xb = _rand((2, gm.dim), seed=16)
    np.testing.assert_allclose(
        np.asarray(phi_rows_pallas(xb, gm, r0, r1, interpret=True)),
        np.asarray(grid.phi_rows(xb, gm, r0, r1)), rtol=0, atol=1e-6)
    w = _rand((gm.n2, r1 - r0, gm.Nb), seed=17)
    g_p = jax.grad(lambda v: jnp.sum(
        phi_rows_pallas(v, gm, r0, r1, interpret=True) * w))(x)
    g_r = jax.grad(lambda v: jnp.sum(grid.phi_rows(v, gm, r0, r1) * w))(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
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


@pytest.mark.parametrize("db", [False, True])
def test_gather_reduce_partial_block(db):
    rng = np.random.default_rng(8)
    ns, na, nb, n2 = 9, 13, 17, 5
    Y = jnp.asarray(rng.standard_normal((n2, ns, nb)), jnp.float32)
    src = jnp.asarray(rng.integers(0, ns, size=(n2, na)), jnp.int32)
    s = jnp.asarray(rng.standard_normal((n2, na)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((n2, nb)), jnp.float32)
    out = gather_reduce(Y, src, s, t, interpret=True, double_buffer=db)
    yn = np.asarray(Y)
    ref = np.zeros((na, nb), np.float32)
    for k in range(n2):
        ref += (yn[k][np.asarray(src)[k]]
                * np.asarray(s)[k][:, None] * np.asarray(t)[k][None, :])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-5)
