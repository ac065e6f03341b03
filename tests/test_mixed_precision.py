"""Mixed-precision (f32-Hessian) path validation (models/oo_pqc.py).

``OO_pqc(..., precision='mixed')`` runs the Hessian blocks in f32 while
energy and gradient stay f64.  The contract: the converged energy is
unchanged to ~1e-9 Ha (the stationary point is fixed by the f64
gradient; the Hessian only conditions the steps), and the Hessian
entries carry f32 accuracy.

The GRADIENT-ONLY pipeline (``energy_and_gradient`` — the beyond-Hessian
path that drives ``gradient_optimization`` at (14e,14o)+/(16e,16o)+) has
a different mixed contract: there the H-apply/RDM streams ARE the cost,
so they run on an f32 state (half the gather/scatter traffic) with the
VJP backward and RDM hand-off kept f64 — energy/gradient carry f32-level
(~1e-6 relative) error, which the 1e-2-scale Adam steps absorb.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from auto_oo_tpu import Moldata, get_formal_geo
from auto_oo_tpu.models import Parameterized_circuit, OO_pqc


@pytest.mark.parametrize("ncas,nelecas,ansatz,kw", [
    (2, 2, "ucc", {}),
    (3, 4, "np_fabric", {"n_layers": 2}),
])
@pytest.mark.slow
def test_mixed_converges_to_f64_energy(ncas, nelecas, ansatz, kw):
    """freeze_active=False: with active-active rotations in kappa the
    minimum is path-independent, so the two modes must land on the SAME
    energy.  (With freeze_active=True the converged energy is path-
    dependent at the ~1e-7 level for ANY two different step sequences —
    frozen directions accumulate a different gauge; that applies to the
    f64 path vs itself under perturbations too, not to mixed precision
    specifically.)"""
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    pqc = Parameterized_circuit(ncas, nelecas, ansatz=ansatz, **kw)
    oo64 = OO_pqc(pqc, mol, ncas, nelecas)
    e64, *_ = oo64.full_optimization(pqc.init_zeros(), verbose=0)
    oomx = OO_pqc(pqc, mol, ncas, nelecas, precision="mixed")
    emx, *_ = oomx.full_optimization(pqc.init_zeros(), verbose=0)
    assert abs(e64[-1] - emx[-1]) < 1e-9


@pytest.mark.slow
def test_mixed_hessian_f32_accurate_gradient_f64_exact():
    """At a generic (non-stationary) point: the mixed gradient/energy are
    BIT-level f64 (same program), the mixed Hessian matches f64 to f32
    accuracy across all five blocks."""
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    pqc = Parameterized_circuit(6, 6, ansatz="np_fabric", n_layers=2)
    oo64 = OO_pqc(pqc, mol, 6, 6, freeze_active=True)
    oomx = OO_pqc(pqc, mol, 6, 6, freeze_active=True, precision="mixed")
    theta = jnp.asarray(0.05 * np.arange(pqc.theta_shape))
    e64, g64, h64 = oo64._grad_hess_jit(theta, oo64.oao_mo_coeff)
    emx, gmx, hmx = oomx._grad_hess_jit(theta, oomx.oao_mo_coeff)
    assert abs(float(e64) - float(emx)) < 1e-13
    assert np.allclose(np.asarray(g64), np.asarray(gmx), atol=1e-12)
    h64 = np.asarray(h64)
    hmx = np.asarray(hmx)
    assert hmx.dtype == np.float64  # uniform f64 surface for the solver
    rel = np.linalg.norm(hmx - h64) / np.linalg.norm(h64)
    assert rel < 1e-5  # f32-accurate entries
    assert rel > 0.0   # and the f32 path genuinely ran


@pytest.mark.slow
def test_mixed_staged_matches_mixed_fused():
    """The staged large-D pipeline in mixed mode computes the same
    (f32-accurate) Hessian as the fused mixed program."""
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    pqc = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=2,
                                sector=True)
    oo = OO_pqc(pqc, mol, 4, 4, freeze_active=True, precision="mixed")
    theta = 0.05 * jnp.arange(pqc.theta_shape, dtype=jnp.float64)
    core, margs = oo._core, oo._mol_args
    e_f, g_f, h_f = core["grad_hess_fused_jit"](
        theta, oo.oao_mo_coeff, *margs)
    e_s, g_s, h_s = core["grad_hess_staged"](
        theta, oo.oao_mo_coeff, *margs)
    assert abs(float(e_f) - float(e_s)) < 1e-12
    assert np.allclose(np.asarray(g_f), np.asarray(g_s), atol=1e-12)
    # both Hessians are f32-accurate; they agree to f32 resolution (the
    # staged row order sums grams differently, so not bit-identical)
    hn = np.linalg.norm(np.asarray(h_f))
    assert np.linalg.norm(np.asarray(h_f) - np.asarray(h_s)) < 1e-5 * hn


@pytest.mark.slow
def test_mixed_streamed_gradient_matches_f64():
    """The NON-hosted mixed gradient pipeline (f32 H-apply + RDM streams,
    f64 VJP backward) must match the f64 energy_and_gradient to f32
    accuracy, return f64 RDMs, and drive a descending Adam loop."""
    mol = Moldata("H 0 0 0; H 0 0 1.2; H 0 0 2.4; H 0 0 3.6", "sto-3g")
    pqc = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=1,
                                sector=True)
    theta = 0.05 * jnp.arange(pqc.theta_shape, dtype=jnp.float64)
    oo64 = OO_pqc(pqc, mol, 4, 4)
    e64, g64, (g1_64, G2_64) = oo64.energy_and_gradient(theta)
    oomx = OO_pqc(pqc, mol, 4, 4, precision="mixed")
    emx, gmx, (g1_mx, G2_mx) = oomx.energy_and_gradient(theta)
    assert g1_mx.dtype == jnp.float64 and G2_mx.dtype == jnp.float64
    assert abs(float(emx) - float(e64)) < 1e-5
    scale = float(jnp.max(jnp.abs(g64))) + 1.0
    assert float(jnp.max(jnp.abs(gmx - g64))) < 1e-4 * scale
    assert float(jnp.max(jnp.abs(gmx - g64))) > 0.0  # f32 genuinely ran
    assert float(jnp.max(jnp.abs(g1_mx - g1_64))) < 1e-5
    el, _ = oomx.gradient_optimization(pqc.init_zeros(), max_iterations=4,
                                       learning_rate=0.05,
                                       orbital_every=0, verbose=0)
    assert el[-1] < el[0]
