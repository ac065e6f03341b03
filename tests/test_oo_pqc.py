"""OO_pqc tests: five-block AD consistency and the north-star end-to-end
full_optimization == CASSCF test — mirroring
/root/reference/test/test_oo_pqc.py:85-185.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import auto_oo_tpu
from auto_oo_tpu import Moldata, get_formal_geo
from auto_oo_tpu.models import Parameterized_circuit, OO_pqc


@pytest.fixture(scope="module")
def setup_22():
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    pqc = Parameterized_circuit(2, 2, ansatz="np_fabric", n_layers=1)
    oo = OO_pqc(pqc, mol, 2, 2, freeze_active=True)
    return mol, pqc, oo


def test_full_derivatives(setup_22):
    """All five gradient/Hessian blocks match jax AD of the energy
    (reference test_oo_pqc.py:85-148)."""
    mol, pqc, oo = setup_22
    theta = jnp.array([0.8324, 0.2490])
    kappa = jnp.zeros(oo.n_kappa)

    def energy(th, ka):
        return oo._energy_pure(th, ka, oo.oao_mo_coeff)

    g_auto = jax.jit(jax.grad(energy, argnums=(0, 1)))(theta, kappa)
    assert np.allclose(np.asarray(g_auto[0]),
                       np.asarray(oo.circuit_gradient(theta)), atol=1e-10)
    assert np.allclose(np.asarray(g_auto[1]),
                       np.asarray(oo.orbital_gradient(theta)), atol=1e-10)

    h_auto = jax.jit(jax.hessian(energy, argnums=(0, 1)))(theta, kappa)
    assert np.allclose(np.asarray(h_auto[0][0]),
                       np.asarray(oo.circuit_circuit_hessian(theta)),
                       atol=1e-9)
    assert np.allclose(np.asarray(h_auto[1][0]),
                       np.asarray(oo.orbital_circuit_hessian(theta)),
                       atol=1e-9)
    assert np.allclose(np.asarray(h_auto[1][1]),
                       np.asarray(oo.orbital_orbital_hessian(theta)),
                       atol=1e-9)


def test_full_gradient_hessian_assembly(setup_22):
    mol, pqc, oo = setup_22
    theta = jnp.array([0.1, -0.2])
    grad = oo.full_gradient(theta)
    hess = oo.full_hessian(theta)
    n = pqc.theta_shape + oo.n_kappa
    assert grad.shape == (n,)
    assert hess.shape == (n, n)
    assert np.allclose(np.asarray(hess), np.asarray(hess).T, atol=1e-9)


def test_full_optimization_matches_casscf(setup_22):
    """North-star: full_optimization energy == CASSCF e_tot
    (reference test_oo_pqc.py:160-185)."""
    mol, pqc, oo = setup_22
    mol.run_casscf(2, 2)
    energy_l, theta_l, kappa_l, oao_l, eig_l = oo.full_optimization(
        pqc.init_zeros())
    assert abs(energy_l[-1] - mol.casscf.e_tot) < 1e-8
    # trajectories are recorded consistently (kappa bug of the reference
    # oo_pqc.py:189 is fixed: kappa_l holds kappas, not thetas)
    assert len(theta_l) == len(kappa_l) == len(oao_l) == len(energy_l)
    assert kappa_l[-1].shape == (oo.n_kappa,)
    # warm-start state: oao_mo_coeff was folded in
    assert np.allclose(np.asarray(oao_l[-1]),
                       np.asarray(oo.oao_mo_coeff))


def test_full_optimization_ucc_matches_casci_limit():
    """UCCD (2e,2o) full space: OO-VQE == FCI for H2."""
    mol = Moldata("H 0 0 0; H 0 0 0.74", "sto-3g")
    mol.run_fci()
    pqc = Parameterized_circuit(2, 2, ansatz="ucc")
    oo = OO_pqc(pqc, mol, 2, 2, freeze_active=True)
    energy_l, *_ = oo.full_optimization(pqc.init_zeros())
    assert abs(energy_l[-1] - mol.fci.e_tot) < 1e-8


def test_quadratic_form_hessian_vs_pure_ad(setup_22):
    """The quadratic-form Hessian blocks (2 J H J^T + second-order term,
    transition-RDM mixed block) equal brute-force jax AD of the energy —
    an independent check of the grad_hess formulation beyond the block
    methods (which are views into grad_hess itself)."""
    mol, pqc, oo = setup_22
    theta = jnp.array([0.31, -0.17])
    oao = oo.oao_mo_coeff
    nt = pqc.theta_shape

    def energy_flat(flat):
        return oo._energy_pure(flat[:nt], flat[nt:], oao)

    flat0 = jnp.concatenate([theta, jnp.zeros(oo.n_kappa)])
    h_ad = np.asarray(jax.jit(jax.hessian(energy_flat))(flat0))
    g_ad = np.asarray(jax.jit(jax.grad(energy_flat))(flat0))
    e0, grad, hess = oo._grad_hess_jit(theta, oao)
    assert abs(float(e0) - float(energy_flat(flat0))) < 1e-12
    assert np.allclose(np.asarray(grad), g_ad, atol=1e-10)
    # theta-theta and mixed blocks must match AD; kappa-kappa is the
    # analytic expression (equals AD per test_full_derivatives)
    assert np.allclose(np.asarray(hess)[:nt, :nt], h_ad[:nt, :nt],
                       atol=1e-9)
    assert np.allclose(np.asarray(hess)[nt:, :nt], h_ad[nt:, :nt],
                       atol=1e-9)


@pytest.mark.slow
def test_staged_grad_hess_equals_fused():
    """The staged large-D pipeline (separate modest-peak programs, used
    above D = 2^19 where the fused program forces XLA into
    compressed-remat spilling) computes the identical energy, gradient
    and Hessian as the fused program, full-space and sector."""
    import jax.numpy as jnp
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    for sector in (False, True):
        pqc = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=2,
                                    sector=sector)
        oo = OO_pqc(pqc, mol, 4, 4, freeze_active=True)
        theta = 0.05 * jnp.arange(pqc.theta_shape, dtype=jnp.float64)
        core, margs = oo._core, oo._mol_args
        e_f, g_f, h_f = core["grad_hess_fused_jit"](
            theta, oo.oao_mo_coeff, *margs)
        e_s, g_s, h_s = core["grad_hess_staged"](
            theta, oo.oao_mo_coeff, *margs)
        assert abs(float(e_f) - float(e_s)) < 1e-12
        assert np.allclose(np.asarray(g_f), np.asarray(g_s), atol=1e-12)
        assert np.allclose(np.asarray(h_f), np.asarray(h_s), atol=1e-12)


@pytest.mark.slow
def test_staged_newton_update_equals_fused():
    """The staged host-driven damped-Newton update (small solve program +
    one forward-pass program per Armijo trial) reproduces the fused
    while_loop program's step exactly."""
    import jax.numpy as jnp
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    pqc = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=2,
                                sector=True)
    oo = OO_pqc(pqc, mol, 4, 4, freeze_active=True)
    theta = pqc.init_zeros()
    core, margs = oo._core, oo._mol_args
    e0, g, h = core["grad_hess_fused_jit"](theta, oo.oao_mo_coeff, *margs)
    args = (theta, oo.oao_mo_coeff) + margs + (e0, g, h,
                                              1e-4, 0.5, 1e-6, 1.1, 1e-6)
    out_f = core["newton_update_jit"](*args)
    out_s = core["newton_update_staged"](*args)
    assert abs(float(out_f[3]) - float(out_s[3])) < 1e-12
    assert np.allclose(np.asarray(out_f[0]), np.asarray(out_s[0]),
                       atol=1e-12)
    assert np.allclose(np.asarray(out_f[2]), np.asarray(out_s[2]),
                       atol=1e-12)


@pytest.mark.slow
def test_energy_gradient_staged_equals_hessian_path():
    """The gradient-only pipeline (forward + streamed H-apply + VJP +
    streamed RDMs — the only derivative path that fits (14e,14o))
    reproduces the quadratic-form grad_hess energy and gradient exactly,
    full-space and sector."""
    import jax.numpy as jnp
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    for sector in (False, True):
        pqc = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=2,
                                    sector=sector)
        oo = OO_pqc(pqc, mol, 4, 4, freeze_active=True)
        theta = 0.05 * jnp.arange(pqc.theta_shape, dtype=jnp.float64)
        core, margs = oo._core, oo._mol_args
        e_f, g_f, _ = core["grad_hess_fused_jit"](
            theta, oo.oao_mo_coeff, *margs)
        e_g, g_g, (g1, G2) = core["energy_gradient_staged"](
            theta, oo.oao_mo_coeff, *margs)
        assert abs(float(e_f) - float(e_g)) < 1e-12
        assert np.allclose(np.asarray(g_f), np.asarray(g_g), atol=1e-11)
        g1_ref, G2_ref = pqc.get_rdms(theta)
        assert np.allclose(np.asarray(g1), np.asarray(g1_ref), atol=1e-11)
        assert np.allclose(np.asarray(G2), np.asarray(G2_ref), atol=1e-11)


def test_gradient_optimization_converges_toward_casscf():
    """Two-step first-order OO-VQE (Adam circuit steps + periodic
    orbital Newton relaxations) drives the (2e,2o) formaldimine energy
    toward the CASSCF oracle."""
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    mol.run_casscf(2, 2)
    pqc = Parameterized_circuit(2, 2, ansatz="ucc")
    oo = OO_pqc(pqc, mol, 2, 2)
    e_start = float(oo.energy_from_parameters(pqc.init_zeros()))
    energy_l, theta = oo.gradient_optimization(
        pqc.init_zeros(), max_iterations=60, learning_rate=0.1,
        orbital_every=5, conv_tol=0)
    e_ref = float(mol.casscf.e_tot)
    assert energy_l[-1] < e_start - 1e-4
    assert energy_l[-1] - e_ref < 2e-4, (energy_l[-1], e_ref)


@pytest.mark.slow
def test_device_loop_full_optimization_matches_host_loop():
    """full_optimization(device_loop=True) — the whole damped-Newton run
    as ONE lax.while_loop device program — reproduces the host loop's
    trajectories (energies, thetas, kappas, MO coefficients, Hessian
    eigenvalues) and converges to the same CASSCF energy."""
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    mol.run_casscf(2, 2)
    pqc = Parameterized_circuit(2, 2, ansatz="np_fabric", n_layers=1)

    oo_h = OO_pqc(pqc, mol, 2, 2, freeze_active=True)
    ref = oo_h.full_optimization(pqc.init_zeros())

    oo_d = OO_pqc(pqc, mol, 2, 2, freeze_active=True)
    dev = oo_d.full_optimization(pqc.init_zeros(), device_loop=True)

    e_h, th_h, k_h, oao_h, eig_h = ref
    e_d, th_d, k_d, oao_d, eig_d = dev
    # identical iteration counts and per-iteration trajectories (the body
    # is the same two fused programs; only XLA fusion roundoff differs)
    assert len(e_d) == len(e_h)
    np.testing.assert_allclose(e_d, e_h, atol=1e-11, rtol=0)
    np.testing.assert_allclose(eig_d, eig_h, atol=1e-9, rtol=0)
    for a, b in zip(th_d, th_h):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-9, rtol=0)
    for a, b in zip(k_d, k_h):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-9, rtol=0)
    np.testing.assert_allclose(np.asarray(oao_d[-1]),
                               np.asarray(oao_h[-1]), atol=1e-9, rtol=0)
    # warm-start state folded in, north-star energy reached
    np.testing.assert_allclose(np.asarray(oo_d.oao_mo_coeff),
                               np.asarray(oao_d[-1]), atol=0, rtol=0)
    assert abs(e_d[-1] - mol.casscf.e_tot) < 1e-8


def test_device_loop_rejected_for_staged_pipeline():
    """The staged large-D pipeline is host-driven by design; device_loop
    must be rejected loudly, not silently fall back."""
    mol = Moldata("H 0 0 0; H 0 0 0.74", "sto-3g")
    pqc = Parameterized_circuit(2, 2, ansatz="ucc")
    oo = OO_pqc(pqc, mol, 2, 2, freeze_active=True)
    oo._full_opt_jit = None  # what _build_nr_core sets when use_staged
    with pytest.raises(ValueError, match="staged"):
        oo.full_optimization(pqc.init_zeros(), device_loop=True)


@pytest.mark.slow
def test_streamed_rows_equal_fused():
    """The streamed per-tangent Hessian rows (no materialized (n2, D)
    Phi — the (14e,14o)-scale path: ham_apply streams its own Phi,
    transition RDMs stream both Phis over grid A-rows) must equal the
    fused-phi staged pipeline exactly.  Forced on at small D via the
    module escape hatch.  (~10 min on the CPU mesh: compiles both row
    pipelines at (4e,4o) sector.)"""
    import jax.numpy as jnp
    from auto_oo_tpu.models import oo_pqc as _mod

    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    pqc = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=2,
                                sector=True)
    oo = OO_pqc(pqc, mol, 4, 4, freeze_active=True)
    theta = 0.05 * jnp.arange(pqc.theta_shape, dtype=jnp.float64)
    core, margs = oo._core, oo._mol_args
    e_f, g_f, h_f = core["grad_hess_staged"](
        theta, oo.oao_mo_coeff, *margs)
    _mod._FORCE_STREAMED_ROWS[0] = True
    try:
        e_s, g_s, h_s = core["grad_hess_staged"](
            theta, oo.oao_mo_coeff, *margs)
    finally:
        _mod._FORCE_STREAMED_ROWS[0] = False
    assert abs(float(e_f) - float(e_s)) < 1e-12
    assert np.allclose(np.asarray(g_f), np.asarray(g_s), atol=1e-12)
    assert np.allclose(np.asarray(h_f), np.asarray(h_s), atol=1e-11)
