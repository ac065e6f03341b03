"""Simulator tests: golden statevectors and RDMs from the reference suite
(/root/reference/test/test_pqc.py), plus structural checks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import auto_oo_tpu  # noqa: F401
from auto_oo_tpu.models import Parameterized_circuit
from .goldens import STATE_GOLDENS


@pytest.mark.parametrize(
    "ncas,ne,add_s,ansatz,L,theta,ref_map", STATE_GOLDENS,
    ids=[f"{g[3]}-{g[0]}-{g[1]}-{g[2]}-{g[4]}" for g in STATE_GOLDENS])
def test_state_goldens(ncas, ne, add_s, ansatz, L, theta, ref_map):
    pqc = Parameterized_circuit(ncas, ne, ansatz=ansatz, n_layers=L or 3,
                                add_singles=bool(add_s))
    psi = np.asarray(pqc.state(jnp.asarray(theta)))
    ref = np.zeros(psi.shape)
    for k, v in ref_map.items():
        ref[k] = v
    assert np.allclose(psi, ref, atol=2e-5)
    assert abs(np.linalg.norm(psi) - 1.0) < 1e-12


def test_rdms_ucc_golden():
    """Reference test_pqc.py:273-291 (2,2,'ucc')."""
    pqc = Parameterized_circuit(2, 2, ansatz="ucc")
    g1, G2 = pqc.get_rdms(jnp.array([2.71668364]))
    ref1 = np.array([[8.89237535e-02, 0.0], [0.0, 1.91107625e+00]])
    assert np.allclose(np.asarray(g1), ref1, atol=1e-7)
    ref2 = np.zeros((2, 2, 2, 2))
    ref2[0, 0, 0, 0] = 8.89237535e-02
    ref2[0, 1, 0, 1] = -4.12237884e-01
    ref2[1, 0, 1, 0] = -4.12237884e-01
    ref2[1, 1, 1, 1] = 1.91107625e+00
    assert np.allclose(np.asarray(G2), ref2, atol=1e-7)


def test_rdms_fabric_golden():
    """Reference test_pqc.py:405-424 (2,2,'np_fabric',1)."""
    pqc = Parameterized_circuit(2, 2, ansatz="np_fabric", n_layers=1)
    g1, G2 = pqc.get_rdms(jnp.array([3.66358854, 4.97356552]))
    ref1 = np.array([[0.77617054, -0.83742894], [-0.83742894, 1.22382946]])
    assert np.allclose(np.asarray(g1), ref1, atol=1e-7)
    ref2 = np.array(
        [[[[0.54219149, -0.35617615], [-0.35617615, 0.23397904]],
          [[-0.35617615, 0.73259025], [0.23397904, -0.4812528]]],
         [[[-0.35617615, 0.23397904], [0.73259025, -0.4812528]],
          [[0.23397904, -0.4812528], [-0.4812528, 0.98985042]]]])
    assert np.allclose(np.asarray(G2), ref2, atol=1e-7)


def test_rdm_trace_particle_number():
    """tr(gamma) = nelecas for any theta."""
    for ncas, ne, ansatz in [(3, 4, "ucc"), (3, 2, "np_fabric"),
                             (2, 2, "kupccd")]:
        pqc = Parameterized_circuit(ncas, ne, ansatz=ansatz, n_layers=2)
        key = jax.random.PRNGKey(0)
        theta = jax.random.uniform(key, (pqc.theta_shape,), minval=0.0,
                                   maxval=2 * np.pi, dtype=jnp.float64)
        g1, G2 = pqc.get_rdms(theta)
        assert abs(float(jnp.trace(g1)) - ne) < 1e-10
        # partial-trace sum rule (chemist order, last pair contracted):
        # sum_r Gamma_{p q r r} = (N - 1) gamma_pq
        part = jnp.einsum("pqrr->pq", G2)
        assert np.allclose(np.asarray(part), (ne - 1) * np.asarray(g1),
                           atol=1e-10)


def test_kupccd_first_class():
    """k-UpCCD is wired in (the reference exported it but never connected
    it to Parameterized_circuit — SURVEY.md gap)."""
    pqc = Parameterized_circuit(3, 2, ansatz="kupccd", k=2)
    assert pqc.theta_shape == 2 * len(pqc.d_wires)
    psi = pqc.state(pqc.init_zeros())
    # zero angles leave the HF determinant
    hf_idx = pqc.program.init_idx
    assert abs(float(psi[hf_idx]) - 1.0) < 1e-12


def test_state_differentiable():
    pqc = Parameterized_circuit(2, 2, ansatz="ucc")

    def overlap_sq(theta):
        psi = pqc._state_impl(theta)
        return psi[3] ** 2

    g = jax.grad(overlap_sq)(jnp.array([0.3]))
    # d/dth sin^2(th/2) = sin(th/2)cos(th/2)
    assert np.allclose(float(g[0]), np.sin(0.15) * np.cos(0.15), atol=1e-12)


def test_init_zeros_and_draw():
    pqc = Parameterized_circuit(2, 2, ansatz="np_fabric", n_layers=1)
    th = pqc.init_zeros()
    assert th.shape == (pqc.theta_shape,)
    txt = pqc.draw_circuit(th)
    assert "GateProgram" in txt


def test_custom_gate_program_ansatz():
    """A user-built GateProgram is accepted as the ansatz (the reference
    accepted custom QNodes, pqc.py:163)."""
    from auto_oo_tpu.simulator import gates as G
    from auto_oo_tpu.simulator.program import GateProgram
    from auto_oo_tpu.ops import fermion

    nm = 4
    init_idx, _ = fermion.hf_bitstring(2, 2)
    prog = GateProgram(
        [G.fermionic_double_pairs(3, 2, 1, 0, nm, param=0, half=0.5)],
        n_params=1, init_idx=init_idx, dim=1 << nm)
    pqc = Parameterized_circuit(2, 2, ansatz=prog)
    psi = pqc.state(jnp.array([1.3661890029907227]))
    assert abs(float(psi[12]) - 0.77562) < 1e-4
    g1, _ = pqc.get_rdms(jnp.array([1.3661890029907227]))
    assert abs(float(jnp.trace(g1)) - 2.0) < 1e-10


def test_custom_callable_ansatz():
    """A callable theta -> statevector is accepted (reference pqc.py:163)."""
    def my_state(theta):
        psi = jnp.zeros(16, dtype=theta.dtype)
        return (psi.at[12].set(jnp.cos(theta[0]))
                .at[3].set(jnp.sin(theta[0])))

    pqc = Parameterized_circuit(2, 2, ansatz=my_state, theta_shape=1)
    assert int(pqc.theta_shape) == 1
    g1, G2 = pqc.get_rdms_from_state(pqc.state(jnp.array([0.3])))
    assert abs(float(jnp.trace(g1)) - 2.0) < 1e-10


def test_uccd_circuit_flat_api():
    """auto_oo_tpu.uccd_circuit (flat export, reference __init__.py:4)
    equals the Parameterized_circuit 'ucc' state."""
    import auto_oo_tpu
    from auto_oo_tpu.models import Parameterized_circuit

    pqc = Parameterized_circuit(2, 2, ansatz="ucc")
    theta = jnp.array([0.4217])
    direct = auto_oo_tpu.uccd_circuit(theta, 2, 2)
    assert np.allclose(np.asarray(direct), np.asarray(pqc.state(theta)),
                       atol=1e-14)


def test_gatefabric_circuit_flat_api():
    import auto_oo_tpu
    from auto_oo_tpu.simulator import ansatze as A

    full_shape = A.gatefabric_full_shape(1, 4)
    theta = jnp.asarray(0.1 * np.arange(int(np.prod(full_shape))))
    state = np.asarray(auto_oo_tpu.gatefabric_circuit(theta, 2, 2,
                                                      n_layers=1))
    assert abs(np.linalg.norm(state) - 1.0) < 1e-12


def test_gatefabric_redundant_idx_geometry():
    """Every eliminated parameter must belong to a first-sub-layer brick
    lying entirely inside the occupied or the virtual qubits, and the
    straddling brick must never be eliminated (the reference's index
    arithmetic at pqc.py:146-150 strips it for nelecas % 4 == 2 with
    even ncas — e.g. (6e,6o) — leaving layer 1 a no-op from HF)."""
    from auto_oo_tpu.simulator.ansatze import gatefabric_redundant_idx

    for ncas in range(2, 11):
        for nelecas in range(2, 2 * ncas + 1, 2):
            red = gatefabric_redundant_idx(ncas, nelecas)
            assert len(red) == len(set(red))
            for x in red:
                lo = 4 * (x // 2)
                assert lo + 3 < nelecas or lo >= nelecas, (
                    ncas, nelecas, x)


def test_gatefabric_half_filled_not_degenerate():
    """(6e,6o) np_fabric must MOVE the HF state for nonzero theta —
    with the reference's over-elimination the whole L=1 fabric was an
    exact no-op from the HF start (measured at (6e,6o)/(10e,10o)/
    (14e,14o): zero gradient, E(theta) == E_HF for every theta)."""
    from auto_oo_tpu.models import Parameterized_circuit

    for sector in (False, True):
        pqc = Parameterized_circuit(6, 6, ansatz="np_fabric",
                                    n_layers=1, sector=sector)
        rng = np.random.default_rng(7)
        theta = jnp.asarray(rng.standard_normal(pqc.theta_shape))
        moved = float(jnp.linalg.norm(
            pqc.state(theta) - pqc.state(pqc.init_zeros())))
        assert moved > 1e-3, (sector, moved)
