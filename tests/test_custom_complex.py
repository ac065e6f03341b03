"""First-class custom (callable) ansatze, including COMPLEX statevectors.

The reference accepts any user QNode as the ansatz with complex128 states
throughout (reference pqc.py:163, 22-66).  These tests pin (a) the jitted
RDM kernels conjugating the bra side for complex states (checked against
dense sparse operators), and (b) a complex custom-circuit ansatz
optimizing END-TO-END through the OO_pqc Newton core to the CASSCF
minimum.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from auto_oo_tpu import Moldata, get_formal_geo
from auto_oo_tpu.models import Parameterized_circuit, OO_pqc
from auto_oo_tpu.ops import fermion


def _dense_rdms_restricted(psi, ncas):
    """Oracle: gamma/Gamma from explicit sparse operators (the reference's
    own formulation, pqc.py:192-218)."""
    gamma = np.zeros((ncas, ncas))
    Gamma = np.zeros((ncas, ncas, ncas, ncas))
    for p in range(ncas):
        for q in range(ncas):
            op = fermion.epq_sparse(p, q, ncas)
            gamma[p, q] = np.real(np.vdot(psi, op @ psi))
            for r in range(ncas):
                for s in range(ncas):
                    op2 = fermion.epqrs_sparse(p, q, r, s, ncas)
                    Gamma[p, q, r, s] = np.real(np.vdot(psi, op2 @ psi))
    return gamma, Gamma


def test_complex_state_rdms_match_sparse_oracle():
    ncas = 2
    D = 1 << (2 * ncas)
    rng = np.random.RandomState(7)
    psi = rng.randn(D) + 1j * rng.randn(D)
    psi /= np.linalg.norm(psi)
    pqc = Parameterized_circuit(ncas, 2, ansatz="ucc")
    g, G = pqc.get_rdms_from_state(jnp.asarray(psi))
    g_ref, G_ref = _dense_rdms_restricted(psi, ncas)
    assert np.allclose(np.asarray(g), g_ref, atol=1e-12)
    assert np.allclose(np.asarray(G), G_ref, atol=1e-12)


def test_complex_state_unrestricted_rdms_match_sparse_oracle():
    ncas = 2
    nm = 2 * ncas
    D = 1 << nm
    rng = np.random.RandomState(3)
    psi = rng.randn(D) + 1j * rng.randn(D)
    psi /= np.linalg.norm(psi)
    pqc = Parameterized_circuit(ncas, 2, ansatz="ucc")
    g, G = pqc.get_rdms_from_state(jnp.asarray(psi), restricted=False)
    for p in range(nm):
        for q in range(nm):
            op = fermion.apq_sparse(p, q, ncas)
            assert abs(g[p, q] - np.real(np.vdot(psi, op @ psi))) < 1e-12
    for idx in [(0, 1, 2, 3), (0, 2, 1, 3), (1, 3, 3, 1), (2, 0, 0, 2)]:
        p, q, r, s = idx
        op = fermion.apqrs_sparse(p, q, r, s, ncas)
        assert abs(G[p, q, r, s]
                   - np.real(np.vdot(psi, op @ psi))) < 1e-12


def test_global_phase_invariance():
    """RDMs of e^{i phi} psi equal RDMs of psi."""
    pqc = Parameterized_circuit(2, 2, ansatz="ucc")
    theta = jnp.array([0.3])
    psi = pqc.state(theta)
    g0, G0 = pqc.get_rdms_from_state(psi)
    psi_c = psi.astype(jnp.complex128) * np.exp(1j * 0.7)
    g1, G1 = pqc.get_rdms_from_state(psi_c)
    assert np.allclose(np.asarray(g0), np.asarray(g1), atol=1e-13)
    assert np.allclose(np.asarray(G0), np.asarray(G1), atol=1e-13)


def test_callable_ansatz_requires_theta_shape():
    with pytest.raises(ValueError, match="theta_shape"):
        Parameterized_circuit(2, 2, ansatz=lambda th: th)


@pytest.fixture(scope="module")
def formal_mol():
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    mol.run_casscf(2, 2)
    return mol


@pytest.mark.slow
def test_complex_custom_ansatz_full_optimization(formal_mol):
    """A genuinely complex parameterized state (UCCD rotation times a
    parameterized occupation-dependent local phase) optimized end-to-end:
    the OO_pqc Newton core must reach the CASSCF minimum (reference
    capability: any QNode is a valid ansatz, pqc.py:163)."""
    ncas, nelecas = 2, 2
    base = Parameterized_circuit(ncas, nelecas, ansatz="ucc")
    prog = base.program
    nm = 2 * ncas
    idx = np.arange(1 << nm)
    # occupation of mode 0: 1 on the HF determinant, 0 on the doubly
    # excited one, so the phase parameter genuinely mixes the state
    nvec = jnp.asarray(((idx >> (nm - 1)) & 1).astype(np.float64))

    def custom(theta):
        psi = prog.apply(theta[:1])
        return psi.astype(jnp.complex128) * jnp.exp(1j * theta[1] * nvec)

    pqc = Parameterized_circuit(ncas, nelecas, ansatz=custom,
                                theta_shape=2)
    assert int(pqc.theta_shape) == 2
    oo = OO_pqc(pqc, formal_mol, ncas, nelecas)
    energy_l, *_ = oo.full_optimization(pqc.init_zeros(), conv_tol=1e-12,
                                        verbose=0)
    assert abs(energy_l[-1] - formal_mol.casscf.e_tot) < 1e-7

    # the five derivative blocks at a complex point agree with AD through
    # the (complex) energy
    import jax
    theta = jnp.array([0.2, 0.4])
    oo2 = OO_pqc(pqc, formal_mol, ncas, nelecas)

    def e_fn(th):
        return oo2._energy_pure(th, jnp.zeros(oo2.n_kappa),
                                oo2.oao_mo_coeff)

    g_ad = jax.grad(e_fn)(theta)
    g_qf = oo2.circuit_gradient(theta)
    assert np.allclose(np.asarray(g_qf), np.asarray(g_ad), atol=1e-9)
    h_ad = jax.hessian(e_fn)(theta)
    h_qf = oo2.circuit_circuit_hessian(theta)
    assert np.allclose(np.asarray(h_qf), np.asarray(h_ad), atol=1e-9)
