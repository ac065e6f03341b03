"""OO_energy tests: transform cross-validation, kappa packing, AD vs
analytic derivatives, golden energies — mirroring
/root/reference/test/test_oo_energy.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import auto_oo_tpu
from auto_oo_tpu import (Moldata, get_formal_geo, int1e_transform,
                        int2e_transform, vector_to_skew_symmetric,
                        skew_symmetric_to_vector, non_redundant_indices)
from auto_oo_tpu.models import OO_energy, mo_ao_to_mo_oao


@pytest.fixture(scope="module")
def mol():
    return Moldata(get_formal_geo(140, 80), "sto-3g")


def test_int_transforms_vs_numpy(mol):
    """Device transforms equal an independent numpy contraction
    (pattern of reference test_oo_energy.py:114-185 vs pyscf.ao2mo)."""
    mol.run_rhf()
    C = mol.hf.mo_coeff
    h_dev = np.asarray(int1e_transform(jnp.asarray(mol.int1e_ao),
                                       jnp.asarray(C)))
    assert np.allclose(h_dev, C.T @ mol.int1e_ao @ C)
    g_dev = np.asarray(int2e_transform(jnp.asarray(mol.int2e_ao),
                                       jnp.asarray(C)))
    g_np = np.einsum("pqrs,pi,qj,rk,sl->ijkl", mol.int2e_ao, C, C, C, C,
                     optimize=True)
    assert np.allclose(g_dev, g_np, atol=1e-10)


def test_mo_ao_to_mo_oao_identity(mol):
    """S^{1/2} applied to the OAO basis itself gives the identity
    (reference test_oo_energy.py:95-102)."""
    assert np.allclose(mo_ao_to_mo_oao(mol.oao_coeff, mol.overlap),
                       np.eye(mol.nao))


def test_skew_packing_roundtrip():
    v = jnp.arange(1.0, 7.0)
    m = vector_to_skew_symmetric(v)
    ref = np.array([[0, -1, -2, -4],
                    [1, 0, -3, -5],
                    [2, 3, 0, -6],
                    [4, 5, 6, 0]], dtype=float)
    assert np.allclose(np.asarray(m), ref)
    assert np.allclose(np.asarray(skew_symmetric_to_vector(m)),
                       np.asarray(v))


def test_non_redundant_indices_counts():
    occ, act, virt = [0, 1], [2, 3], [4, 5, 6]
    idx = non_redundant_indices(occ, act, virt, freeze_active=False)
    no, na, nv = 2, 2, 3
    assert len(idx) == no * na + na * nv + no * nv + na * (na - 1) // 2
    idx_f = non_redundant_indices(occ, act, virt, freeze_active=True)
    assert len(idx_f) == no * na + na * nv + no * nv


@pytest.fixture(scope="module")
def oo_with_rdms(mol):
    oo = OO_energy(mol, 2, 2, freeze_active=False)
    # closed-shell HF-like active RDMs
    one = jnp.array([[2.0, 0.0], [0.0, 0.0]])
    two = jnp.zeros((2, 2, 2, 2)).at[0, 0, 0, 0].set(2.0)
    return oo, one, two


def test_energy_from_mo_coeff_equals_rhf(mol, oo_with_rdms):
    oo, one, two = oo_with_rdms
    mol.run_rhf()
    e = float(oo.energy_from_mo_coeff(jnp.asarray(mol.hf.mo_coeff),
                                      one, two))
    assert abs(e - mol.hf.e_tot) < 1e-9


def test_ad_vs_analytic_gradient_hessian(oo_with_rdms):
    """Autodiff of energy_from_kappa vs closed-form Fock expressions
    (reference test_oo_energy.py:923-971)."""
    oo, one, two = oo_with_rdms
    kappa0 = jnp.zeros(oo.n_kappa)
    g_auto = jax.jit(jax.grad(oo.energy_from_kappa))(kappa0, one, two)
    g_exact = oo.kappa_matrix_to_vector(oo.analytic_gradient(one, two))
    assert np.allclose(np.asarray(g_auto), np.asarray(g_exact), atol=1e-9)
    h_auto = jax.jit(jax.hessian(oo.energy_from_kappa))(kappa0, one, two)
    h_exact = oo.full_hessian_to_matrix(oo.analytic_hessian(one, two))
    assert np.allclose(np.asarray(h_auto), np.asarray(h_exact), atol=1e-8)


def test_orbital_optimization_golden(mol, oo_with_rdms):
    """Orbital-only optimization with the closed-shell RDM reaches the RHF
    minimum (reference test_oo_energy.py:396 golden -92.66372193556138)."""
    oo, one, two = oo_with_rdms
    energy_l = oo.orbital_optimization(one, two, conv_tol=1e-10,
                                       max_iterations=80)
    assert abs(energy_l[-1] - (-92.66372193556138)) < 5e-7


def test_energy_from_kappa_consistency(oo_with_rdms):
    oo, one, two = oo_with_rdms
    k = jnp.zeros(oo.n_kappa).at[0].set(0.05)
    e1 = float(oo.energy_from_kappa(k, one, two))
    mo = oo.get_transformed_mo(oo.mo_coeff, k)
    e2 = float(oo.energy_from_mo_coeff(mo, one, two))
    assert abs(e1 - e2) < 1e-12


def test_expm_vs_scipy():
    from auto_oo_tpu import expm
    from scipy.linalg import expm as sexpm
    rng = np.random.RandomState(3)
    a = rng.randn(7, 7)
    k = a - a.T
    assert np.allclose(np.asarray(expm(jnp.asarray(k))), sexpm(k),
                       atol=1e-12)
    # differentiability
    def f(x):
        m = jnp.zeros((3, 3)).at[0, 1].set(x).at[1, 0].set(-x)
        return expm(m)[0, 0]
    g = jax.grad(f)(0.3)
    assert abs(float(g) - (-np.sin(0.3))) < 1e-10


def test_jacobi_eigh_matches_numpy():
    """The in-house Jacobi eigensolver (the TPU path of eigh, used because
    jnp.linalg.eigh NaNs for f64 on the TPU backend) matches numpy to
    machine precision."""
    from auto_oo_tpu.ops.linalg import jacobi_eigh
    for n in (2, 7, 33, 66):
        rng = np.random.RandomState(n)
        a = rng.randn(n, n)
        a = a + a.T
        w1, v1 = jacobi_eigh(jnp.asarray(a))
        w0 = np.linalg.eigvalsh(a)
        assert np.allclose(np.asarray(w1), w0, atol=1e-11)
        recon = np.asarray(v1) @ np.diag(np.asarray(w1)) @ np.asarray(v1).T
        assert np.allclose(recon, a, atol=1e-11)
