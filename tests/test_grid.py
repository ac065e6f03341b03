"""String-grid sector kernels (ops/grid.py) vs the flat gather maps.

The flat (2, n2, D) sector maps are themselves pinned against dense
operators in tests/test_sector.py, so bit-exact agreement here certifies
the factorized kernels end to end."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from auto_oo_tpu.ops import grid as G
from auto_oo_tpu.ops import rdms as _rdms
from auto_oo_tpu.ops import hamiltonian as _ham
from auto_oo_tpu.simulator import sector as S


CASES = [(3, (2, 2)), (4, 4), (4, (3, 1)), (5, 6), (4, (0, 2))]


@pytest.mark.parametrize("ncas,nelec", CASES)
def test_phi_matches_flat_maps(ncas, nelec):
    gm = G.build_grid_maps(ncas, nelec)
    src, sign = S.sector_epq_maps(ncas, nelec)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(gm.dim))
    phi_flat = _rdms.apply_epq_all(x, ncas, False, (src, sign))
    phi_grid = G.phi_all(G.to_grid(x, gm), gm)
    np.testing.assert_array_equal(np.asarray(G.from_grid(phi_grid, gm)),
                                  np.asarray(phi_flat))
    # per-spin components (unrestricted 1-RDM path)
    for s in range(2):
        ps = G.from_grid(G.phi_all(G.to_grid(x, gm), gm, spin=s), gm)
        ref = x[src[s]] * sign[s].astype(x.dtype)
        np.testing.assert_array_equal(np.asarray(ps), np.asarray(ref))


@pytest.mark.parametrize("ncas,nelec", CASES)
def test_epq_sum_matches_flat(ncas, nelec):
    gm = G.build_grid_maps(ncas, nelec)
    src, sign = S.sector_epq_maps(ncas, nelec)
    rng = np.random.default_rng(2)
    Y = jnp.asarray(rng.standard_normal((gm.n2, gm.dim)))
    rows = jnp.arange(gm.n2)[:, None]
    flat = sum((Y[rows, src[s]] * sign[s].astype(Y.dtype)).sum(axis=0)
               for s in range(2))
    got = G.from_grid(G.epq_sum(G.to_grid(Y, gm), gm), gm)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(flat))


def test_perm_roundtrip():
    gm = G.build_grid_maps(4, 4)
    x = jnp.arange(gm.dim, dtype=jnp.float64)
    np.testing.assert_array_equal(
        np.asarray(G.from_grid(G.to_grid(x, gm), gm)), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(G.to_grid(G.from_grid(x, gm), gm)), np.asarray(x))


def test_grid_dets_match_sector_basis():
    from auto_oo_tpu.ops import fermion

    for ncas, nelec in CASES:
        gm = G.build_grid_maps(ncas, nelec)
        basis = fermion.sector_basis(ncas, nelec)
        # grid dets, permuted to canonical order, equal the sorted basis
        Agrid = np.asarray(gm.s2g)
        na = nelec[0] if isinstance(nelec, tuple) else nelec - nelec // 2
        nb = nelec[1] if isinstance(nelec, tuple) else nelec // 2
        As = G.spin_strings(ncas, na, 0)
        Bs = G.spin_strings(ncas, nb, 1)
        dets = (As[:, None] | Bs[None, :]).ravel()
        np.testing.assert_array_equal(dets[Agrid], basis)


def test_ham_apply_grid_matches_flat():
    ncas, nelec = 4, 4
    gm = G.build_grid_maps(ncas, nelec)
    src, sign = S.sector_epq_maps(ncas, nelec)
    rng = np.random.default_rng(3)
    c1 = rng.standard_normal((ncas, ncas))
    c1 = jnp.asarray(c1 + c1.T)
    c2 = rng.standard_normal((ncas,) * 4)
    c2 = jnp.asarray(c2 + np.transpose(c2, (1, 0, 3, 2)))
    x = jnp.asarray(rng.standard_normal((3, gm.dim)))
    c1eff = _ham.c1_effective(c1, c2)
    flat = _ham.ham_apply(c1eff, c2, x, ncas, maps=(src, sign))
    got = G.from_grid(
        _ham.ham_apply(c1eff, c2, G.to_grid(x, gm), ncas, maps=gm), gm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(flat),
                               rtol=0, atol=1e-12)


def test_rdms_from_sector_state_grid():
    ncas, nelec = 4, 4
    gm = G.build_grid_maps(ncas, nelec)
    src, sign = S.sector_epq_maps(ncas, nelec)
    rng = np.random.default_rng(4)
    psi = rng.standard_normal(gm.dim) + 1j * rng.standard_normal(gm.dim)
    psi = jnp.asarray(psi / np.linalg.norm(psi))
    g1, G1 = S.rdms_from_sector_state(psi, (src, sign))
    g2, G2 = S.rdms_from_sector_state(psi, gm)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-13)
    np.testing.assert_allclose(np.asarray(G2), np.asarray(G1), atol=1e-13)


def test_unrestricted_rdms_grid():
    ncas, nelec = 3, (2, 2)
    gm = G.build_grid_maps(ncas, nelec)
    src, sign = S.sector_epq_maps(ncas, nelec)
    umaps = S.sector_pair_annihilation_maps(ncas, nelec)
    rng = np.random.default_rng(5)
    psi = jnp.asarray(rng.standard_normal(gm.dim))
    psi = psi / jnp.linalg.norm(psi)
    g1, G1 = S.rdms_from_sector_state_unrestricted(
        psi, (src, sign), umaps, ncas)
    g2, G2 = S.rdms_from_sector_state_unrestricted(psi, gm, umaps, ncas)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-13)
    np.testing.assert_allclose(np.asarray(G2), np.asarray(G1), atol=1e-13)


@pytest.mark.parametrize("name,builder,ncas,nelec", [
    ("np_fabric", lambda d: __import__(
        "auto_oo_tpu.simulator.ansatze", fromlist=["x"]
    ).gatefabric_program(4, 4, 2, dets=d), 4, 4),
    ("ucc", lambda d: __import__(
        "auto_oo_tpu.simulator.ansatze", fromlist=["x"]
    ).uccd_program(4, 4, add_singles=True, dets=d), 4, 4),
    ("kupccd", lambda d: __import__(
        "auto_oo_tpu.simulator.ansatze", fromlist=["x"]
    ).kupccd_program(4, 4, k=2, dets=d), 4, 4),
    ("ucc_open", lambda d: __import__(
        "auto_oo_tpu.simulator.ansatze", fromlist=["x"]
    ).uccd_program(4, (3, 1), add_singles=True, dets=d), 4, (3, 1)),
])
def test_grid_program_matches_sector_program(name, builder, ncas, nelec):
    """The factorized row-block circuit reproduces the flat pair-scan
    circuit (state AND Jacobian) for every ansatz family."""
    from auto_oo_tpu.ops import fermion
    from auto_oo_tpu.simulator import grid_program as GP

    dets = fermion.sector_basis(ncas, nelec)
    prog = builder(dets)
    gprog = GP.factorize_program(prog, dets, ncas)
    gm = G.build_grid_maps(ncas, nelec)
    rng = np.random.default_rng(7)
    theta = jnp.asarray(rng.standard_normal(prog.n_params) * 0.3)
    psi_sorted = prog.apply(theta)
    psi_grid = gprog.apply(theta)
    np.testing.assert_allclose(np.asarray(G.from_grid(psi_grid, gm)),
                               np.asarray(psi_sorted), atol=1e-13)
    Jg = jax.jacfwd(lambda th: gprog.apply(th))(theta)
    Js = jax.jacfwd(lambda th: prog.apply(th))(theta)
    np.testing.assert_allclose(np.asarray(G.from_grid(Jg.T, gm)),
                               np.asarray(Js.T), atol=1e-12)


@pytest.mark.parametrize("name,kw,builder,ncas,nelec", [
    ("ucc", dict(ansatz="ucc", add_singles=True),
     lambda d: __import__("auto_oo_tpu.simulator.ansatze",
                          fromlist=["x"]).uccd_program(
         4, 4, add_singles=True, dets=d), 4, 4),
    ("np_fabric", dict(ansatz="np_fabric", n_layers=2),
     lambda d: __import__("auto_oo_tpu.simulator.ansatze",
                          fromlist=["x"]).gatefabric_program(
         4, 4, 2, dets=d), 4, 4),
    ("kupccd", dict(ansatz="kupccd", k=2),
     lambda d: __import__("auto_oo_tpu.simulator.ansatze",
                          fromlist=["x"]).kupccd_program(
         4, 4, k=2, dets=d), 4, 4),
    ("ucc_open", dict(ansatz="ucc", add_singles=True),
     lambda d: __import__("auto_oo_tpu.simulator.ansatze",
                          fromlist=["x"]).uccd_program(
         4, (3, 1), add_singles=True, dets=d), 4, (3, 1)),
])
def test_direct_grid_gates_match_factorized(name, kw, builder, ncas,
                                            nelec):
    """simulator/grid_gates.build_direct (no flat tables at any point)
    produces bit-identical circuits to factorize_program(flat program)
    — the (14e,14o)-scale construction path is certified against the
    golden-calibrated one."""
    from auto_oo_tpu.ops import fermion
    from auto_oo_tpu.simulator import grid_program as GP
    from auto_oo_tpu.simulator import grid_gates as GG

    dets = fermion.sector_basis(ncas, nelec)
    prog = builder(dets)
    gfac = GP.factorize_program(prog, dets, ncas)
    gdir = GG.build_direct(ncas, nelec, **kw)
    assert gdir.n_params == gfac.n_params
    assert gdir.init_idx == gfac.init_idx
    assert len(gdir.gates) == len(gfac.gates)
    rng = np.random.default_rng(11)
    theta = jnp.asarray(rng.standard_normal(prog.n_params) * 0.3)
    np.testing.assert_array_equal(np.asarray(gdir.apply(theta)),
                                  np.asarray(gfac.apply(theta)))


def test_chunked_kernels_match_full():
    """Pair-axis-streamed ham_apply / RDM kernels (the (14e,14o) memory
    path) equal the full-materialization kernels at any chunk size."""
    ncas, nelec = 4, 4
    gm = G.build_grid_maps(ncas, nelec)
    rng = np.random.default_rng(13)
    c1 = rng.standard_normal((ncas, ncas))
    c1 = jnp.asarray(c1 + c1.T)
    c2 = rng.standard_normal((ncas,) * 4)
    c2 = jnp.asarray(c2 + np.transpose(c2, (1, 0, 3, 2)))
    c1eff = _ham.c1_effective(c1, c2)
    x = jnp.asarray(rng.standard_normal((2, gm.dim)))
    full = _ham.ham_apply(c1eff, c2, x, ncas, maps=gm)
    n2 = gm.n2
    C2g = c2.reshape(n2, n2)
    c1f = c1eff.reshape(n2)
    for chunk in (1, 3, 7, n2):
        got = G.ham_apply_chunked(c1f, C2g, x, gm, chunk)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                   rtol=0, atol=1e-12)
    psi = jnp.asarray(rng.standard_normal(gm.dim))
    psi = psi / jnp.linalg.norm(psi)
    g_full, G_full = _rdms.rdms_from_state(psi, ncas, maps=gm,
                                           grid_order=True)
    for chunk in (1, 5, n2):
        g_c, G_c = G.rdms_chunked(psi, gm, ncas, chunk)
        np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_full),
                                   atol=1e-13)
        np.testing.assert_allclose(np.asarray(G_c), np.asarray(G_full),
                                   atol=1e-13)


@pytest.mark.slow
def test_row_streamed_kernels_match_full():
    """A-row-streamed (D-axis) kernels — phi_rows / ham_apply_rows /
    rdms_rows, the one-gather-pass (14e,14o) path — equal the full
    kernels at any row chunk, batched and complex included."""
    ncas, nelec = 4, (3, 1)
    gm = G.build_grid_maps(ncas, nelec)
    rng = np.random.default_rng(17)
    c1 = rng.standard_normal((ncas, ncas))
    c1 = jnp.asarray(c1 + c1.T)
    c2 = rng.standard_normal((ncas,) * 4)
    c2 = jnp.asarray(c2 + np.transpose(c2, (1, 0, 3, 2)))
    c1eff = _ham.c1_effective(c1, c2)
    n2 = gm.n2
    C2g = c2.reshape(n2, n2)
    c1f = c1eff.reshape(n2)
    x = jnp.asarray(rng.standard_normal((2, gm.dim)))
    full = _ham.ham_apply(c1eff, c2, x, ncas, maps=gm)
    phi_full = G.phi_all(x, gm)
    for rc in (1, 3, gm.Na):
        blocks = [G.phi_rows(x, gm, r0, min(gm.Na, r0 + rc))
                  for r0 in range(0, gm.Na, rc)]
        phi_r = jnp.concatenate(blocks, axis=-2).reshape(phi_full.shape)
        np.testing.assert_allclose(np.asarray(phi_r),
                                   np.asarray(phi_full), atol=1e-13)
        for pb in (None, 1, 5):
            got = G.ham_apply_rows(c1f, C2g, x, gm, rc, pair_block=pb)
            np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                       rtol=0, atol=1e-12)
    psi_c = rng.standard_normal(gm.dim) + 1j * rng.standard_normal(gm.dim)
    psi_c = jnp.asarray(psi_c / np.linalg.norm(psi_c))
    g_full, G_full = _rdms.rdms_from_state(psi_c, ncas, maps=gm,
                                           grid_order=True)
    for rc in (1, 4, gm.Na):
        g_r, G_r = G.rdms_rows(psi_c, gm, ncas, rc)
        np.testing.assert_allclose(np.asarray(g_r), np.asarray(g_full),
                                   atol=1e-13)
        np.testing.assert_allclose(np.asarray(G_r), np.asarray(G_full),
                                   atol=1e-13)


def test_auto_dispatch_streamed_paths(monkeypatch):
    """Forcing tiny byte budgets engages the streamed kernels through
    the PUBLIC ham_apply / rdms_from_state dispatch — both tiers (rows
    within Y budget, pair-streamed above it) — with unchanged results."""
    ncas, nelec = 4, 4
    gm = G.build_grid_maps(ncas, nelec)
    rng = np.random.default_rng(19)
    c1 = rng.standard_normal((ncas, ncas))
    c1 = jnp.asarray(c1 + c1.T)
    c2 = rng.standard_normal((ncas,) * 4)
    c2 = jnp.asarray(c2 + np.transpose(c2, (1, 0, 3, 2)))
    c1eff = _ham.c1_effective(c1, c2)
    x = jnp.asarray(rng.standard_normal(gm.dim))
    psi = x / jnp.linalg.norm(x)
    full = _ham.ham_apply(c1eff, c2, x, ncas, maps=gm)
    g_full, G_full = _rdms.rdms_from_state(psi, ncas, maps=gm,
                                           grid_order=True)
    monkeypatch.setattr(G, "_PAIR_CHUNK_BYTES", 4096)
    for ybudget in (1 << 40, 0):   # one-pass Y / pair-blocked Y
        monkeypatch.setattr(G, "_Y_BUDGET_BYTES", ybudget)
        got = _ham.ham_apply(c1eff, c2, x, ncas, maps=gm)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                   rtol=0, atol=1e-12)
    g_s, G_s = _rdms.rdms_from_state(psi, ncas, maps=gm, grid_order=True)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_full),
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(G_s), np.asarray(G_full),
                               atol=1e-13)


def test_lazy_flat_program_in_direct_grid_mode():
    """Sector + built-in ansatz never builds the flat pair tables unless
    a consumer explicitly asks (sharded paths / draw_circuit)."""
    from auto_oo_tpu.models import Parameterized_circuit

    pqc = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=1,
                                sector=True)
    assert pqc._program is None and pqc._program_builder is not None
    assert pqc.state_dim == 36
    theta = pqc.init_zeros() + 0.1
    pqc.state(theta)
    pqc.get_rdms(theta)
    assert pqc._program is None, "hot paths must not build the flat " \
                                 "program"
    # explicit request builds it lazily, and it agrees with the grid one
    tabs = pqc._tables(flat_sector_maps=True)
    assert tabs["gates"] is not None and pqc._program is not None


def test_state_public_api_canonical_order():
    """Parameterized_circuit.state still returns canonical-order sector
    vectors with the grid program underneath."""
    from auto_oo_tpu.models import Parameterized_circuit

    pqc_g = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=1,
                                  sector=True)
    assert pqc_g.grid_program is not None
    pqc_f = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=1,
                                  sector=True)
    pqc_f.grid_program = None  # force the flat pair-scan path
    theta = pqc_g.init_zeros() + 0.1
    np.testing.assert_allclose(np.asarray(pqc_g.state(theta)),
                               np.asarray(pqc_f.state(theta)), atol=1e-13)


def test_grad_hess_grid_equals_flat_maps():
    """Full NR grad+Hessian with grid maps vs the same circuit forced
    onto the flat maps — the end-to-end certification at (4e,4o)."""
    from auto_oo_tpu import Moldata, get_formal_geo
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc

    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    pqc = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=1,
                                sector=True)
    assert isinstance(pqc.sector_maps, G.GridMaps)
    oo = OO_pqc(pqc, mol, 4, 4, freeze_active=True)
    theta = pqc.init_zeros() + 0.05
    e_g, grad_g, hess_g = oo._grad_hess_jit(theta, oo.oao_mo_coeff)

    # swap in the flat maps and rebuild the pure functions
    pqc2 = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=1,
                                 sector=True)
    pqc2.sector_maps = S.sector_epq_maps(4, 4)
    oo2 = OO_pqc(pqc2, mol, 4, 4, freeze_active=True)
    e_f, grad_f, hess_f = oo2._grad_hess_jit(theta, oo2.oao_mo_coeff)

    np.testing.assert_allclose(float(e_g), float(e_f), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(grad_g), np.asarray(grad_f),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(hess_g), np.asarray(hess_f),
                               atol=1e-9)


@pytest.mark.parametrize("ncas,nelec,ansatz", [
    (4, 4, "np_fabric"), (4, (3, 1), "np_fabric"), (4, 4, "ucc")])
def test_grid_program_adjoint_gradients(ncas, nelec, ansatz):
    """apply_adjoint (reversible backward, O(D) residuals) returns the
    SAME forward state as apply and the same reverse-mode gradients —
    both theta- and psi-cotangents — to machine precision, under jit."""
    from auto_oo_tpu.models import Parameterized_circuit

    kw = {"n_layers": 2} if ansatz == "np_fabric" else {}
    pqc = Parameterized_circuit(ncas, nelec, ansatz=ansatz, sector=True,
                                **kw)
    gp = pqc.grid_program
    assert gp is not None
    theta = 0.13 * jnp.arange(pqc.theta_shape, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal(gp.dim))

    out_p = gp.apply(pqc._expand_theta(theta))
    out_a = gp.apply_adjoint(pqc._expand_theta(theta))
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_a))

    g_p = jax.jit(jax.grad(
        lambda th: gp.apply(pqc._expand_theta(th)) @ w))(theta)
    g_a = jax.jit(jax.grad(
        lambda th: gp.apply_adjoint(pqc._expand_theta(th)) @ w))(theta)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_p),
                               rtol=0, atol=1e-13)

    psi0 = jnp.asarray(rng.standard_normal(gp.dim))
    psi0 = psi0 / jnp.linalg.norm(psi0)
    gp_p = jax.grad(lambda p: gp.apply(
        pqc._expand_theta(theta), p) @ w)(psi0)
    gp_a = jax.grad(lambda p: gp.apply_adjoint(
        pqc._expand_theta(theta), p) @ w)(psi0)
    np.testing.assert_allclose(np.asarray(gp_a), np.asarray(gp_p),
                               rtol=0, atol=1e-13)


@pytest.mark.parametrize("ncas,nelec", [(4, 4), (4, (3, 1)), (3, (2, 2)),
                                        (4, (1, 3)), (4, (0, 2)),
                                        (3, (3, 3))])
def test_sminus_grid_s2_matches_dense(ncas, nelec):
    """Grid-native <S^2> (string-factorized S^- maps — the only form that
    fits at (16e,16o), where the flat cross-sector tables are ~10 GB)
    vs the dense s2_matrix quadratic form on the embedded full-space
    vector, over a COMPLEX sector state."""
    from auto_oo_tpu.ops import fermion

    gm = G.build_grid_maps(ncas, nelec)
    sm = G.sminus_grid_maps(ncas, nelec)
    basis = fermion.sector_basis(ncas, nelec)
    D = len(basis)
    rng = np.random.default_rng(11)
    v = rng.standard_normal(D) + 1j * rng.standard_normal(D)
    v = v / np.linalg.norm(v)
    psi = jnp.asarray(v)
    s2_grid = float(G.s2_expectation_grid(psi, gm, sm, nelec))
    full = np.zeros(4 ** ncas, dtype=complex)
    full[np.asarray(basis)] = v
    s2_mat = np.asarray(_rdms.s2_matrix(ncas))
    s2_dense = float(np.real(np.conj(full) @ (s2_mat @ full)))
    assert abs(s2_grid - s2_dense) < 1e-12


def test_sminus_grid_none_sectors():
    """S^- is the zero map when na = 0 or nb = ncas; <S^2> reduces to
    Sz^2 - Sz exactly."""
    assert G.sminus_grid_maps(3, (0, 2)) is None
    assert G.sminus_grid_maps(3, (1, 3)) is None
    gm = G.build_grid_maps(3, (0, 2))
    psi = jnp.zeros(gm.dim, dtype=jnp.float64).at[0].set(1.0)
    s2 = float(G.s2_expectation_grid(psi, gm, None, (0, 2)))
    assert abs(s2 - (1.0 + 1.0)) < 1e-14  # sz=-1: sz^2 - sz = 2


# ---- matmul-form kernels (ops/grid._phi_all_mm / _epq_sum_mm) -----------


@pytest.mark.parametrize("ncas,nelec", CASES)
@pytest.mark.parametrize("dt", [jnp.float64, jnp.float32])
def test_mm_kernels_match_gather(ncas, nelec, dt):
    """The dense-operator matmul forms equal the row-gather forms: phi
    exactly (every output element is a 1-sparse dot), epq_sum to
    accumulation-order roundoff."""
    gm = G.build_grid_maps(ncas, nelec)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(gm.dim), dtype=dt)
    tol = 0.0 if dt == jnp.float64 else 1e-6
    np.testing.assert_allclose(np.asarray(G._phi_all_mm(x, gm)),
                               np.asarray(G._phi_all_xla(x, gm)),
                               atol=tol, rtol=0)
    for s in range(2):
        np.testing.assert_allclose(
            np.asarray(G._phi_all_mm(x, gm, spin=s)),
            np.asarray(G._phi_all_xla(x, gm, spin=s)), atol=tol, rtol=0)
    Y = jnp.asarray(rng.standard_normal((gm.n2, gm.dim)), dtype=dt)
    np.testing.assert_allclose(np.asarray(G._epq_sum_mm(Y, gm)),
                               np.asarray(G._epq_sum_xla(Y, gm)),
                               atol=5e-6 if tol else 1e-13, rtol=0)


def test_mm_kernels_batched_sliced_and_ad():
    """Batched operands, pair-sliced maps (the chunked kernels' form)
    and reverse-mode AD all agree with the gather path."""
    gm = G.build_grid_maps(4, 4)
    rng = np.random.default_rng(4)
    xb = jnp.asarray(rng.standard_normal((3, gm.dim)))
    np.testing.assert_array_equal(np.asarray(G._phi_all_mm(xb, gm)),
                                  np.asarray(G._phi_all_xla(xb, gm)))
    sl = G.pair_slice(gm, 3, 11)
    x = xb[0]
    np.testing.assert_array_equal(np.asarray(G._phi_all_mm(x, sl)),
                                  np.asarray(G._phi_all_xla(x, sl)))
    Ys = jnp.asarray(rng.standard_normal((8, gm.dim)))
    np.testing.assert_allclose(np.asarray(G._epq_sum_mm(Ys, sl)),
                               np.asarray(G._epq_sum_xla(Ys, sl)),
                               atol=1e-13, rtol=0)
    w = jnp.asarray(rng.standard_normal((gm.n2, gm.dim)))
    g_mm = jax.grad(lambda v: jnp.sum(G._phi_all_mm(v, gm) * w))(x)
    g_xla = jax.grad(lambda v: jnp.sum(G._phi_all_xla(v, gm) * w))(x)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_xla),
                               atol=1e-12, rtol=0)


def test_mm_dispatch_policy(monkeypatch):
    """auto: f32 within budget -> mm; f64 or over budget -> gather;
    off/on override.  Pinned by intercepting the mm kernel."""
    from auto_oo_tpu import config

    gm = G.build_grid_maps(3, (2, 2))
    x64 = jnp.zeros(gm.dim)
    x32 = jnp.zeros(gm.dim, dtype=jnp.float32)
    calls = []
    real = G._phi_all_mm
    monkeypatch.setattr(G, "_phi_all_mm",
                        lambda *a, **k: calls.append(1) or real(*a, **k))
    monkeypatch.setattr(config, "_GRID_MM", "auto")
    G.phi_all(x64, gm)
    assert not calls
    G.phi_all(x32, gm)
    assert len(calls) == 1
    monkeypatch.setattr(G, "_MM_BYTES", 0)
    G.phi_all(x32, gm)
    assert len(calls) == 1          # over budget -> gather
    monkeypatch.setattr(config, "_GRID_MM", "on")
    G.phi_all(x32, gm)
    assert len(calls) == 2          # forced
    monkeypatch.setattr(config, "_GRID_MM", "off")
    G.phi_all(x32, gm)
    assert len(calls) == 2


def test_state_and_s2_programs_carry_no_large_constants():
    """The jitted state / S^2 programs must receive the grid maps as
    ARGUMENTS (the _tables bundle), never closure constants: a captured
    s2g permutation is a D-sized HLO literal — 662 MB at (16e,16o) —
    which stalls the remote compile service (found by the 16e16o demo's
    35-minute state-stage hang)."""
    from auto_oo_tpu.models import Parameterized_circuit

    pqc = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=1,
                                sector=True)
    theta = pqc.init_zeros()
    jaxpr = jax.make_jaxpr(pqc._state_impl)(theta, pqc._tables())
    const_bytes = sum(np.asarray(c).nbytes for c in jaxpr.consts)
    assert const_bytes < 4096, const_bytes
    jaxpr2 = jax.make_jaxpr(pqc._s2_grid_impl)(
        theta, pqc._tables(), pqc._s2maps())
    const_bytes2 = sum(np.asarray(c).nbytes for c in jaxpr2.consts)
    assert const_bytes2 < 4096, const_bytes2
    # and the public entry points still agree with the dense operator
    psi = pqc.state(theta)
    assert abs(float(psi @ psi) - 1.0) < 1e-12
    s2 = float(pqc.s2_expectation(theta))
    assert abs(s2) < 1e-10


# ---- host-segmented drivers (ops/grid_hosted, (16e,16o)-scale path) -------


@pytest.mark.parametrize("ncas,nelec", [(4, 4), (4, (3, 1)), (5, (3, 2))])
def test_hosted_rdms_and_ham_match_fused(ncas, nelec):
    """The host-segmented drivers (bounded multi-dispatch, scatter-form
    H-apply) must be machine-precision equal to the in-jit kernels —
    forced multi-segment + ragged remainder via tiny row_chunk/seg."""
    from auto_oo_tpu.ops import grid_hosted as gh

    gm = G.build_grid_maps(ncas, nelec, False)
    D = gm.Na * gm.Nb
    x = jax.random.normal(jax.random.PRNGKey(1), (D,), jnp.float64)
    x = x / jnp.linalg.norm(x)
    g1a, G2a = _rdms.rdms_from_state(x, ncas, maps=gm, grid_order=True)
    g1b, G2b = gh.rdms_hosted(x, gm, ncas, row_chunk=3, seg_chunks=2)
    assert float(jnp.max(jnp.abs(g1a - g1b))) < 1e-13
    assert float(jnp.max(jnp.abs(G2a - G2b))) < 1e-13

    c1 = jax.random.normal(jax.random.PRNGKey(2), (ncas, ncas))
    c1 = (c1 + c1.T) / 2
    c2 = jax.random.normal(jax.random.PRNGKey(3), (ncas,) * 4)
    c2 = (c2 + jnp.transpose(c2, (1, 0, 3, 2))
          + jnp.transpose(c2, (2, 3, 0, 1))) / 3
    ha = _ham.ham_apply(c1, c2, x, ncas, maps=gm)
    hb = gh.ham_apply_hosted(c1, c2, x, gm, row_chunk=3, seg_chunks=2)
    assert float(jnp.max(jnp.abs(ha - hb))) < 1e-13
    # canonical-order round trip
    xc = G.from_grid(x, gm)
    hc = gh.ham_apply_hosted(c1, c2, xc, gm, row_chunk=3, seg_chunks=2,
                             grid_order=False)
    assert float(jnp.max(jnp.abs(hc - G.from_grid(ha, gm)))) < 1e-13


def test_hosted_routes_match_fused_end_to_end(monkeypatch):
    """Forcing the hosted-traffic budget to zero must leave every public
    value unchanged: energy_from_parameters, energy_and_gradient, the
    line-search energies inside newton_update_staged, and get_rdms all
    reroute through ops/grid_hosted at (4e,4o) and agree to 1e-12."""
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc
    from auto_oo_tpu.moldata import Moldata

    mol = Moldata("H 0 0 0; H 0 0 1.2; H 0 0 2.4; H 0 0 3.6", "sto-3g")
    pqc = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=1,
                                sector=True)
    theta = 0.05 * jnp.arange(pqc.theta_shape, dtype=jnp.float64)
    oo = OO_pqc(pqc, mol, 4, 4)
    e_ref = float(oo.energy_from_parameters(theta))
    eg_ref, grad_ref, (g1_ref, G2_ref) = oo.energy_and_gradient(theta)
    rdm_ref = pqc.get_rdms(theta)

    monkeypatch.setenv("AUTO_OO_TPU_HOSTED_MIN_BYTES", "1")
    # fresh objects: the route check is call-time but get_rdms caches
    # nothing, so the same instances must reroute too
    e_h = float(oo.energy_from_parameters(theta))
    eg_h, grad_h, (g1_h, G2_h) = oo.energy_and_gradient(theta)
    rdm_h = pqc.get_rdms(theta)
    assert abs(e_h - e_ref) < 1e-12
    assert abs(float(eg_h) - float(eg_ref)) < 1e-12
    assert float(jnp.max(jnp.abs(grad_h - grad_ref))) < 1e-12
    assert float(jnp.max(jnp.abs(g1_h - g1_ref))) < 1e-12
    assert float(jnp.max(jnp.abs(G2_h - G2_ref))) < 1e-12
    assert float(jnp.max(jnp.abs(rdm_h[0] - rdm_ref[0]))) < 1e-12
    assert float(jnp.max(jnp.abs(rdm_h[1] - rdm_ref[1]))) < 1e-12


@pytest.mark.parametrize("ncas,nelec", [(4, 4), (4, (3, 1))])
def test_fused_hosted_ham_rdms(ncas, nelec):
    """ham_and_rdms_hosted (one Phi pass) == the separate drivers."""
    from auto_oo_tpu.ops import grid_hosted as gh

    gm = G.build_grid_maps(ncas, nelec, False)
    D = gm.Na * gm.Nb
    x = jax.random.normal(jax.random.PRNGKey(4), (D,), jnp.float64)
    x = x / jnp.linalg.norm(x)
    c1 = jax.random.normal(jax.random.PRNGKey(5), (ncas, ncas))
    c1 = (c1 + c1.T) / 2
    c2 = jax.random.normal(jax.random.PRNGKey(6), (ncas,) * 4)
    c2 = (c2 + jnp.transpose(c2, (1, 0, 3, 2))
          + jnp.transpose(c2, (2, 3, 0, 1))) / 3
    h, g1, G2 = gh.ham_and_rdms_hosted(c1, c2, x, gm, ncas,
                                       row_chunk=3, seg_chunks=2)
    h_ref = _ham.ham_apply(c1, c2, x, ncas, maps=gm)
    g1_ref, G2_ref = _rdms.rdms_from_state(x, ncas, maps=gm,
                                           grid_order=True)
    assert float(jnp.max(jnp.abs(h - h_ref))) < 1e-13
    assert float(jnp.max(jnp.abs(g1 - g1_ref))) < 1e-13
    assert float(jnp.max(jnp.abs(G2 - G2_ref))) < 1e-13


@pytest.mark.parametrize("ncas,nelec", [(4, 4), (4, (3, 1))])
def test_hosted_drivers_f32_state(ncas, nelec):
    """The mixed-precision hosted pass: an f32 state through the hosted
    drivers must return f64 RDM accumulators at f32-level accuracy and
    an f32 H|x> — the (16e,16o)-scale route where casting the state
    halves every gather/scatter byte of the pass."""
    from auto_oo_tpu.ops import grid_hosted as gh

    gm = G.build_grid_maps(ncas, nelec, False)
    D = gm.Na * gm.Nb
    x = jax.random.normal(jax.random.PRNGKey(7), (D,), jnp.float64)
    x = x / jnp.linalg.norm(x)
    c1 = jax.random.normal(jax.random.PRNGKey(8), (ncas, ncas))
    c1 = (c1 + c1.T) / 2
    c2 = jax.random.normal(jax.random.PRNGKey(9), (ncas,) * 4)
    c2 = (c2 + jnp.transpose(c2, (1, 0, 3, 2))
          + jnp.transpose(c2, (2, 3, 0, 1))) / 3
    x32 = x.astype(jnp.float32)

    g1_ref, G2_ref = _rdms.rdms_from_state(x, ncas, maps=gm,
                                           grid_order=True)
    g1, G2 = gh.rdms_hosted(x32, gm, ncas, row_chunk=3, seg_chunks=2)
    assert g1.dtype == jnp.float64 and G2.dtype == jnp.float64
    assert float(jnp.max(jnp.abs(g1 - g1_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(G2 - G2_ref))) < 1e-5

    h, g1f, G2f = gh.ham_and_rdms_hosted(c1, c2, x32, gm, ncas,
                                         row_chunk=3, seg_chunks=2)
    h_ref = _ham.ham_apply(c1, c2, x, ncas, maps=gm)
    assert h.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(h - h_ref.astype(jnp.float32)))) < 1e-4
    assert float(jnp.max(jnp.abs(g1f - g1_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(G2f - G2_ref))) < 1e-5


def test_hosted_mixed_gradient_matches_f64(monkeypatch):
    """precision='mixed' + forced hosting: energy_and_gradient runs the
    f32 hosted pass (f64 VJP backward) and must agree with the f64 path
    to f32 accuracy — the gradient contract of the (16e,16o)-scale
    gradient-only pipeline (BASELINE.md round-4 ninth phase)."""
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc
    from auto_oo_tpu.moldata import Moldata

    mol = Moldata("H 0 0 0; H 0 0 1.2; H 0 0 2.4; H 0 0 3.6", "sto-3g")
    pqc = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=1,
                                sector=True)
    theta = 0.05 * jnp.arange(pqc.theta_shape, dtype=jnp.float64)
    oo = OO_pqc(pqc, mol, 4, 4)
    e_ref, grad_ref, (g1_ref, G2_ref) = oo.energy_and_gradient(theta)

    monkeypatch.setenv("AUTO_OO_TPU_HOSTED_MIN_BYTES", "1")
    oo_m = OO_pqc(pqc, mol, 4, 4, precision="mixed")
    e_m, grad_m, (g1_m, G2_m) = oo_m.energy_and_gradient(theta)
    # energy carries the f32 H|psi> error; RDMs are f64-accumulated
    assert abs(float(e_m) - float(e_ref)) < 1e-5
    scale = float(jnp.max(jnp.abs(grad_ref))) + 1.0
    assert float(jnp.max(jnp.abs(grad_m - grad_ref))) < 1e-4 * scale
    assert float(jnp.max(jnp.abs(g1_m - g1_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(G2_m - G2_ref))) < 1e-5
    # the f64 hosted route of the SAME spec stays bit-exact
    e_h, grad_h, _ = oo.energy_and_gradient(theta)
    assert abs(float(e_h) - float(e_ref)) < 1e-12
    assert float(jnp.max(jnp.abs(grad_h - grad_ref))) < 1e-12


@pytest.mark.slow
def test_hosted_grad_hess_matches_fused(monkeypatch):
    """Forced hosting must leave the FULL quadratic-form (e0, grad,
    hess) unchanged: grad_hess_staged reroutes through
    models/oo_pqc.grad_hess_hosted (pair-jvp tangent columns, hosted
    H J_i / transition-RDM passes, pair-adjoint cc rows) and must equal
    the fused single-program pipeline to near machine precision — the
    exactness pin of the (16e,16o)-scale second-order engine.  Covers
    n_kappa > 0 (formaldimine: oc/oo blocks + ham_and_trdms_hosted) and
    n_kappa = 0 (full-valence H4: ham_apply_hosted route), closed and
    open shell."""
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc
    from auto_oo_tpu.moldata import Moldata
    from auto_oo_tpu.utils.misc import get_formal_geo

    cases = [
        (Moldata(get_formal_geo(140, 80), "sto-3g"), 4, 4,
         dict(ansatz="np_fabric", n_layers=1), {}),
        (Moldata("H 0 0 0; H 0 0 1.2; H 0 0 2.4; H 0 0 3.6", "sto-3g"),
         4, 4, dict(ansatz="np_fabric", n_layers=1),
         dict(freeze_active=True)),
        (Moldata(get_formal_geo(140, 80), "sto-3g"), 4, (3, 1),
         dict(ansatz="ucc", add_singles=True), {}),
    ]
    for mol, ncas, nelecas, pqc_kw, oo_kw in cases:
        pqc = Parameterized_circuit(ncas, nelecas, sector=True, **pqc_kw)
        theta = 0.05 * jnp.arange(pqc.theta_shape, dtype=jnp.float64)
        oo = OO_pqc(pqc, mol, ncas, nelecas, **oo_kw)
        args = (theta, oo.oao_mo_coeff) + oo._mol_args
        e_ref, g_ref, h_ref = oo._core["grad_hess_fused_jit"](*args)

        monkeypatch.setenv("AUTO_OO_TPU_HOSTED_MIN_BYTES", "1")
        try:
            e_h, g_h, h_h = oo._core["grad_hess_staged"](*args)
            # full hosted NR update from the hosted derivatives == the
            # fused damped-Newton step (line-search energies rerouted)
            up_h = oo._core["newton_update_staged"](
                *args, e_h, g_h, h_h, 1e-4, 0.5, 1e-6, 1.1, 1e-6)
            up_f = oo._core["newton_update_fused"](
                *args, e_ref, g_ref, h_ref, 1e-4, 0.5, 1e-6, 1.1, 1e-6)
        finally:
            monkeypatch.delenv("AUTO_OO_TPU_HOSTED_MIN_BYTES")
        assert abs(float(e_h) - float(e_ref)) < 1e-11
        assert float(jnp.max(jnp.abs(g_h - g_ref))) < 1e-11
        assert float(jnp.max(jnp.abs(h_h - h_ref))) < 1e-9
        assert float(jnp.max(jnp.abs(up_h[0] - up_f[0]))) < 1e-9
        assert abs(float(up_h[3]) - float(up_f[3])) < 1e-11


@pytest.mark.slow
def test_hosted_grad_hess_mixed_accuracy(monkeypatch):
    """Mixed + forced hosting: the f32 hosted second-order pipeline's
    (e0, grad, hess) agree with the f64 fused values to f32-level
    accuracy — the measurement contract of the (16e,16o) mixed NR."""
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc
    from auto_oo_tpu.moldata import Moldata
    from auto_oo_tpu.utils.misc import get_formal_geo

    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    pqc = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=1,
                                sector=True)
    theta = 0.05 * jnp.arange(pqc.theta_shape, dtype=jnp.float64)
    oo = OO_pqc(pqc, mol, 4, 4)
    args = (theta, oo.oao_mo_coeff) + oo._mol_args
    e_ref, g_ref, h_ref = oo._core["grad_hess_fused_jit"](*args)

    monkeypatch.setenv("AUTO_OO_TPU_HOSTED_MIN_BYTES", "1")
    oo_m = OO_pqc(pqc, mol, 4, 4, precision="mixed")
    args_m = (theta, oo_m.oao_mo_coeff) + oo_m._mol_args
    e_m, g_m, h_m = oo_m._core["grad_hess_staged"](*args_m)
    assert abs(float(e_m) - float(e_ref)) < 1e-5
    gs = float(jnp.max(jnp.abs(g_ref))) + 1.0
    hs = float(jnp.max(jnp.abs(h_ref))) + 1.0
    assert float(jnp.max(jnp.abs(g_m - g_ref))) < 1e-4 * gs
    assert float(jnp.max(jnp.abs(h_m - h_ref))) < 5e-4 * hs


def test_apply_pair_adjoint_matches_plain_ad():
    """FAST default-profile pin of the tangent-pair adjoint program (the
    (16e,16o) Hessian-row engine's core math): forward (psi, J v) equals
    jax.jvp of the plain apply, and the reverse pass with both cotangent
    seeds equals plain AD — closed shell (np_fabric) and open shell
    (uccsd), under jit."""
    from auto_oo_tpu.models import Parameterized_circuit

    for ncas, nel, kw in ((4, 4, dict(ansatz="np_fabric", n_layers=1)),
                          (3, (2, 1), dict(ansatz="ucc",
                                           add_singles=True))):
        pqc = Parameterized_circuit(ncas, nel, sector=True, **kw)
        gp = pqc.grid_program
        rng = np.random.RandomState(0)
        th = jnp.asarray(0.3 * rng.randn(pqc.theta_shape))
        v = jnp.asarray(rng.randn(pqc.theta_shape))
        f = lambda t: pqc._state_impl_grid(t)
        psi_ref, Jv_ref = jax.jvp(f, (th,), (v,))
        psi, dl = pqc._pair_state_impl_grid(th, v)
        assert float(jnp.max(jnp.abs(psi - psi_ref))) < 1e-13
        assert float(jnp.max(jnp.abs(dl - Jv_ref))) < 1e-13
        a = jnp.asarray(rng.randn(gp.dim))
        b = jnp.asarray(rng.randn(gp.dim))

        def g_pair(t):
            ps, d = pqc._pair_state_impl_grid(t, v)
            return ps @ a + d @ b

        def g_plain(t):
            ps, d = jax.jvp(f, (t,), (v,))
            return ps @ a + d @ b

        r_ref = jax.grad(g_plain)(th)
        assert float(jnp.max(jnp.abs(jax.grad(g_pair)(th) - r_ref))) \
            < 1e-11
        assert float(jnp.max(jnp.abs(
            jax.jit(jax.grad(g_pair))(th) - r_ref))) < 1e-11


def test_hosted_grad_hess_fast_pin(monkeypatch):
    """FAST default-profile pin of the hosted second-order route: at
    one small closed-shell full-valence config (n_kappa = 0, the
    (16e,16o) flagship shape) forced hosting must reproduce the fused
    (e0, grad, hess) — the broader sweep (n_kappa > 0, open shell,
    mixed, NR update) lives in the @slow tests above."""
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc
    from auto_oo_tpu.moldata import Moldata

    mol = Moldata("H 0 0 0; H 0 0 1.2; H 0 0 2.4; H 0 0 3.6", "sto-3g")
    pqc = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=1,
                                sector=True)
    theta = 0.05 * jnp.arange(pqc.theta_shape, dtype=jnp.float64)
    oo = OO_pqc(pqc, mol, 4, 4, freeze_active=True)
    args = (theta, oo.oao_mo_coeff) + oo._mol_args
    e_ref, g_ref, h_ref = oo._core["grad_hess_fused_jit"](*args)
    monkeypatch.setenv("AUTO_OO_TPU_HOSTED_MIN_BYTES", "1")
    e_h, g_h, h_h = oo._core["grad_hess_staged"](*args)
    assert abs(float(e_h) - float(e_ref)) < 1e-11
    assert float(jnp.max(jnp.abs(g_h - g_ref))) < 1e-11
    assert float(jnp.max(jnp.abs(h_h - h_ref))) < 1e-9
