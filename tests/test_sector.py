"""Particle-sector simulation: sector-projected programs and RDM maps
must reproduce the full-space results exactly (simulator/sector.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from auto_oo_tpu.models import Parameterized_circuit
from auto_oo_tpu.simulator import sector as S


@pytest.mark.parametrize("ncas,nelecas,ansatz,kw", [
    (2, 2, "ucc", {}),
    (2, 2, "np_fabric", {"n_layers": 1}),
    (3, 4, "np_fabric", {"n_layers": 2}),
    (4, 4, "ucc", {"add_singles": True}),
])
def test_sector_state_equals_full_space(ncas, nelecas, ansatz, kw):
    pqc = Parameterized_circuit(ncas, nelecas, ansatz=ansatz, **kw)
    prog_s, basis = S.project_program(pqc.program, ncas, nelecas)
    rng = np.random.RandomState(1)
    theta = jnp.asarray(0.2 * rng.randn(pqc.theta_shape))
    full = np.asarray(pqc.state(theta))
    psi_s = np.asarray(prog_s.apply(
        jnp.asarray(pqc._expand_theta(jnp.ravel(theta)))))
    # amplitudes outside the sector are exactly zero
    mask = np.ones(full.size, dtype=bool)
    mask[basis] = False
    assert np.all(full[mask] == 0.0)
    assert np.allclose(psi_s, full[basis], atol=1e-14)
    # size win
    assert prog_s.dim == len(basis) < full.size


def test_sector_rdms_equal_full_space():
    ncas, nelecas = 3, 4
    pqc = Parameterized_circuit(ncas, nelecas, ansatz="np_fabric",
                                n_layers=2)
    prog_s, basis = S.project_program(pqc.program, ncas, nelecas)
    maps = S.sector_epq_maps(ncas, nelecas)
    theta = jnp.asarray(0.1 * np.arange(pqc.theta_shape))
    psi_s = prog_s.apply(jnp.asarray(pqc._expand_theta(theta)))
    g_s, G_s = S.rdms_from_sector_state(psi_s, maps)
    g_f, G_f = pqc.get_rdms(theta)
    assert np.allclose(np.asarray(g_s), np.asarray(g_f), atol=1e-13)
    assert np.allclose(np.asarray(G_s), np.asarray(G_f), atol=1e-13)


def test_sector_dimension_scaling():
    """The sector dimension is C(ncas, na) * C(ncas, nb) — the scaling
    argument of the README roadmap (16x at (10e,10o))."""
    from math import comb
    basis, rank = S.sector_basis_and_rank(10, 10)
    assert len(basis) == comb(10, 5) ** 2 == 63504
    assert (1 << 20) / len(basis) > 16
