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


def test_mapped_hessian_path_equals_batched(setup_22):
    """The lax.map HVP Hessian path (used for large statevectors to avoid
    tile-padded tangent buffers) equals the batched jacfwd path."""
    import auto_oo_tpu.models.oo_pqc as M
    mol, pqc, oo = setup_22
    theta = jnp.array([0.31, -0.17])
    h_batched = np.asarray(oo.full_hessian(theta))
    old = M._MAPPED_HESSIAN_MIN_DIM
    try:
        M._MAPPED_HESSIAN_MIN_DIM = 1
        pqc2 = type(pqc)(2, 2, ansatz="np_fabric", n_layers=1)
        oo2 = type(oo)(pqc2, mol, 2, 2, freeze_active=True)
        # earlier tests may have folded optimized orbitals into the
        # module-scoped oo; compare at the same point
        oo2.oao_mo_coeff = oo.oao_mo_coeff
        h_mapped = np.asarray(oo2.full_hessian(theta))
    finally:
        M._MAPPED_HESSIAN_MIN_DIM = old
    assert np.allclose(h_mapped, h_batched, atol=1e-11)
