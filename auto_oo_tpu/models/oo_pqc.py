"""OO_pqc: hybrid circuit + orbital cost with exact gradients/Hessians.

API mirror of reference oo_pqc.py:30-207 on a fully jitted JAX core.  The
cost is E(theta, kappa) = c0 + sum h~ gamma(theta) + sum g Gamma(theta)
with MOs rotated by expm(-kappa).  Derivative blocks (all views into one
compiled grad+Hessian program):

* circuit gradient / circuit-circuit Hessian: quadratic-form contraction
  2 J (H psi) / 2 J H J^T + d2<w, psi(theta)> with J = jacfwd of the
  simulator state and a batched Hamiltonian-apply kernel
  (ops/hamiltonian.py) — replacing both PennyLane backprop (reference
  oo_pqc.py:86-111) and naive AD-through-RDM-extraction;
* orbital gradient / orbital-orbital Hessian: closed-form generalized-Fock
  expressions (reference oo_pqc.py:97-101,127-130);
* mixed block: the affine analytic-gradient map applied to transition
  RDMs built from J and the Phi gram (reference oo_pqc.py:113-125 used
  jacobian-of-analytic-gradient).

``full_optimization`` runs one damped-Newton iteration as TWO
back-to-back XLA programs (grad+Hessian, then augmented solve + Armijo
line search + MO update — splitting compiles faster than one fused
program); the Python loop only records trajectories and checks
convergence.

Compile/memory design: the NR programs take ALL problem arrays — AO
integrals, OAO coefficients, nuclear repulsion AND the compiled gate
tables — as runtime ARGUMENTS (closure capture would embed them as
program constants: GBs at 20 qubits), and are cached on the pqc keyed by
the static problem spec, so all geometries of the same active-space
problem share one compiled program (Berry-phase loops / PES scans
compile once).  The AO->MO transform is hoisted out of every
differentiated sub-function, tangent batches stream in ~256 MB chunks,
and the line-search energy is reused instead of re-evaluated.

Known reference bugs fixed here (SURVEY.md):
* kappa trajectory records kappa, not theta (reference oo_pqc.py:189);
"""

import contextlib
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import kappa as _kappa
from ..ops import fock as _fock
from ..ops import transforms as _tr
from ..ops import rdms as _rdms
from ..ops import hamiltonian as _ham
from ..ops.linalg import expm
from ..utils.newton_raphson import damped_newton_step_pure
from .oo_energy import OO_energy


# test escape hatch: force the streamed (no materialized Phi) per-tangent
# Hessian rows in grad_hess_staged at any D, so streamed == fused can be
# pinned at small shapes (list so tests can flip it in place)
_FORCE_STREAMED_ROWS = [False]


def _lowp(x):
    """f64-family -> f32-family cast (mixed-precision mode); ints and
    already-low dtypes pass through."""
    if x is None:
        return x
    d = jnp.asarray(x).dtype
    if d == jnp.float64:
        return jnp.asarray(x).astype(jnp.float32)
    if d == jnp.complex128:
        return jnp.asarray(x).astype(jnp.complex64)
    return x


def _lowp_tables(tables):
    """Gate-table / map bundle with every float leaf cast to f32, so a
    statevector application started from an f32 theta STAYS f32 (x64
    promotion rules would silently upcast at the first f64 operand)."""
    def cast_gates(g):
        return None if g is None else tuple(
            _lowp(x) if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)
            else x for x in g)

    if isinstance(tables, dict):
        from ..ops.grid import GridMaps

        m = tables.get("maps")
        if isinstance(m, GridMaps):
            pass  # all-integer (int32 ranks, int8 signs): nothing to cast
        elif m is not None:
            m = (m[0], m[1])
        gg = tables.get("gates_grid")  # all-integer: pass through
        return {"gates": cast_gates(tables.get("gates")), "maps": m,
                "gates_grid": gg}
    return cast_gates(tables)


def _build_nr_core(pqc, nao, occ, act, params_idx, mesh=None,
                   tangent_axis="tp", state_axis=None, newton_method=None,
                   precision="f64"):
    """Geometry-independent functional core for one problem spec.

    All molecule data (int1e_ao, int2e_ao, oao_coeff, nuc) are runtime
    arguments; only index maps / shapes are baked in, so one compiled
    program serves every geometry of the same problem.

    With ``mesh`` given, the SAME quadratic-form formulation is
    GSPMD-partitioned: the tangent batch J (nt, D) — and everything
    batched over it (H J, Phi_J, the transition-RDM rows) — is sharded
    over ``tangent_axis``, and the statevector dimension is additionally
    sharded over ``state_axis`` if given.  Molecule arrays and gate
    tables stay runtime ARGUMENTS (never closure-captured constants), so
    the multi-chip path obeys the same compile-service discipline as the
    single-device one."""
    params_idx = tuple(int(i) for i in params_idx)
    params_idx_dev = jnp.asarray(np.asarray(params_idx, dtype=np.int32))
    n_kappa = len(params_idx)
    tril_size = nao * (nao - 1) // 2
    nt = int(pqc.theta_shape)
    # mixed precision: energy + gradient stay f64 (they drive the
    # convergence test at 1e-10 Ha), but the HESSIAN blocks — the O(nt)
    # batched Hamiltonian-applies, grams and transition RDMs that
    # dominate the iteration — run on the MXU in f32 (one matmul pass
    # instead of the ~8-pass f64 emulation).  Newton is self-correcting:
    # an O(1e-6)-relative Hessian perturbs the step direction, not the
    # stationary point, so converged energies agree with the f64 path to
    # ~1e-10 Ha (pinned by tests/test_mixed_precision.py).  Promised at
    # config.py:8; SURVEY.md section 7 "Hard parts" (x64 vs f32 on TPU).
    mixed = (precision == "mixed")
    lp = _lowp if mixed else (lambda x: x)

    def prec_ctx():
        """Trace-time matmul-precision scope for the f32 blocks: TPU f32
        dots default to ONE bf16 pass (~1e-2 relative error — measured to
        derail the Newton trajectory by 8e-2 Ha); 'float32' stamps the
        bf16x3 passes that deliver true f32 accuracy.  f64 ops are kept
        OUTSIDE these scopes (their emulation path is precision-flag
        sensitive on some backends)."""
        return (jax.default_matmul_precision("float32") if mixed
                else contextlib.nullcontext())

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        def shard(x, *spec):
            # a mesh axis may appear at most once per spec: when tangent
            # and state share an axis (e.g. both "tp"), the earlier
            # (tangent) dimension keeps it — sharding the independent
            # tangent rows is communication-free, sharding the state
            # dimension costs collectives
            seen, clean = set(), []
            for s in spec:
                if s is not None and s in seen:
                    clean.append(None)
                else:
                    clean.append(s)
                    if s is not None:
                        seen.add(s)
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, PartitionSpec(*clean)))
    else:
        def shard(x, *spec):
            return x
    t_ax, s_ax = tangent_axis, state_axis

    def k2m(kappa):
        total = jnp.zeros(tril_size, dtype=kappa.dtype)
        total = total.at[params_idx_dev].set(kappa)
        return _kappa.vector_to_skew_symmetric(total, nao)

    def active_coeffs(int1e_ao, int2e_ao, nuc, mo):
        h1 = _tr.int1e_transform(int1e_ao, mo)
        g2 = _tr.int2e_transform(int2e_ao, mo)
        c0, c1, c2 = _tr.molecular_hamiltonian_coefficients(
            nuc, h1, g2, occ, act)
        return h1, g2, c0, c1, c2

    # the energy needs integrals with ALL indices in occ+act, so the
    # 4-index transform runs with the (nao, ns) sub-coefficients —
    # O(nao^4 ns) instead of O(nao^5); this is the line-search hot path
    sub = np.asarray(tuple(occ) + tuple(act), dtype=int)
    occ_rel = tuple(range(len(occ)))
    act_rel = tuple(range(len(occ), len(sub)))

    def energy(theta, kappa, oao, int1e_ao, int2e_ao, oao_coeff, nuc,
               tables):
        mo = oao_coeff @ oao @ expm(-k2m(kappa))
        mo_sub = mo[:, sub]
        h1 = _tr.int1e_transform(int1e_ao, mo_sub)
        g2 = _tr.int2e_transform(int2e_ao, mo_sub)
        c0, c1, c2 = _tr.molecular_hamiltonian_coefficients(
            nuc, h1, g2, occ_rel, act_rel)
        one_rdm, two_rdm = pqc._rdms_impl(theta, tables)
        return _tr.energy_from_rdms(c0, c1, c2, one_rdm, two_rdm)

    def orbital_gradient(theta, oao, int1e_ao, int2e_ao, oao_coeff,
                         tables):
        mo = oao_coeff @ oao
        h1 = _tr.int1e_transform(int1e_ao, mo)
        g2 = _tr.int2e_transform(int2e_ao, mo)
        one_rdm, two_rdm = pqc._rdms_impl(theta, tables)
        grad4 = _fock.analytic_gradient_from_integrals(
            h1, g2, one_rdm, two_rdm, occ, act)
        return _kappa.skew_symmetric_to_vector(grad4)[params_idx_dev]

    ncas = pqc.ncas
    utd = pqc.up_then_down

    def grad_hess(theta, oao, int1e_ao, int2e_ao, oao_coeff, nuc,
                  tables):
        """Energy, full gradient, full (theta+kappa) Hessian.

        Quadratic-form formulation: E(theta) = c0 + <psi|H|psi> with H
        the fixed active-space Hamiltonian, so with J = d psi/d theta
        (ONE forward pass through the simulator, (nt, D)):

          grad_c   = 2 J (H psi)
          hess_cc  = 2 J (H J^T) + hess_theta <w, psi(theta)>,  w = 2 H psi
          hess_oc  = analytic-gradient linear map applied to the
                     transition RDMs d(gamma, Gamma)/d theta_i built from
                     J and Phi (product rule on the Phi gram)

        No RDM extraction is ever differentiated: the batched gathers all
        keep the state dimension minor (the jacfwd-of-RDM route
        materialized (pairs*D, nt) buffers whose minor tangent axis was
        tile-padded 128x -> OOM at (8e,8o), and sequential HVPs were 20x
        slower).  The AO->MO transform runs once per call."""
        mo = oao_coeff @ oao
        h1, g2, c0, c1, c2 = active_coeffs(int1e_ao, int2e_ao, nuc, mo)
        c1eff = _ham.c1_effective(c1, c2)

        def state_fn(th):
            return pqc._state_impl(th, tables)

        # all inner products conjugate the bra side and take the real
        # part, so COMPLEX custom-ansatz states are handled exactly
        # (grad = 2 Re<d_i psi|H|psi>, etc.); conj/real are XLA no-ops
        # for the real-valued built-in ansatze.
        # NOTE on a measured negative result: computing J natively in f32
        # (it only feeds Hessian blocks) and recovering the f64 gradient
        # by one reverse-mode pass was tried and made mixed mode SLOWER
        # on chip (10e10o sector: 3.77 s -> 4.61 s/iter): XLA batches all
        # nt jacfwd tangents into ONE scan pass, so the f64 Jacobian is
        # cheap, while the extra backward scan pays full-D f64 traffic.
        maps = pqc._maps_from(tables)
        # string-grid sector maps: the grid gate program emits GRID order
        # directly (zero boundary permutations); the whole quadratic form
        # runs in that order — every gram/dot below contracts the state
        # axis of two same-order operands, so the layout is invisible to
        # the math (ops/grid.py).  Fallback: grid maps without a grid
        # program (hand-swapped maps) convert the canonical-order state.
        from ..ops.grid import GridMaps as _GM, to_grid as _tg
        is_grid = isinstance(maps, _GM)
        grid_state = is_grid and pqc.grid_program is not None

        def state_fn_g(th):
            s = (pqc._state_impl_grid(th, tables) if grid_state
                 else state_fn(th))
            return _tg(s, maps) if (is_grid and not grid_state) else s

        psi = shard(state_fn_g(theta), s_ax)
        J = shard(jax.jacfwd(state_fn_g)(theta).T, t_ax, s_ax)  # (nt, D)
        Hpsi = shard(_ham.ham_apply(c1eff, c2, psi, ncas, utd, maps),
                     s_ax)
        e0 = c0 + jnp.real(jnp.conj(psi) @ Hpsi)
        w = 2.0 * Hpsi
        # term2 re-differentiates the simulator: with a grid program its
        # states come out grid-ordered (same order as w); the fallback
        # (grid maps, canonical simulator) converts w back instead
        from ..ops.grid import from_grid as _fg
        w_s = _fg(w, maps) if (is_grid and not grid_state) else w
        grad_c = jnp.real(jnp.conj(J) @ w)
        # tangent batches run in chunks: the (chunk, n^2, D) Y/Phi
        # intermediates must stay ~O(100 MB) under f64 emulation (the
        # full 20-tangent batch allocated 3x 5G buffers at (8e,8o)).
        # Under a mesh the tangent axis is partitioned instead: each
        # device holds nt/n_dev tangent rows, so the per-device
        # intermediates shrink by the mesh size and no host-level
        # chunk loop is needed.
        D = psi.shape[0]
        n2 = ncas * ncas
        chunk = max(1, min(nt, (1 << 25) // max(1, n2 * D)))

        def map_chunked(f, X):
            if mesh is not None:
                return f(X)
            B = X.shape[0]
            pad = (-B) % chunk
            Xp = (jnp.concatenate(
                [X, jnp.zeros((pad,) + X.shape[1:], X.dtype)])
                if pad else X)
            n_chunks = (B + pad) // chunk
            out = jax.lax.map(
                f, Xp.reshape(n_chunks, chunk, *X.shape[1:]))
            return out.reshape(n_chunks * chunk, *out.shape[2:])[:B]

        with prec_ctx():
            Jl = lp(J)
            HJ = map_chunked(
                lambda Jc: shard(
                    _ham.ham_apply(lp(c1eff), lp(c2), Jc, ncas, utd,
                                   maps),
                    t_ax, s_ax),
                Jl)
            if mixed:
                tabs_l = _lowp_tables(tables)
                w_l = lp(w_s)

                def state_fn_l(th):
                    return (pqc._state_impl_grid(th, tabs_l) if grid_state
                            else pqc._state_impl(th, tabs_l))

                term2 = jax.jacfwd(jax.grad(
                    lambda th: jnp.real(state_fn_l(th) @ jnp.conj(w_l))))(
                    theta.astype(jnp.float32))
            else:
                term2_state = (
                    (lambda th: pqc._state_impl_grid(th, tables))
                    if grid_state else state_fn)
                term2 = jax.jacfwd(jax.grad(
                    lambda th: jnp.real(term2_state(th) @ jnp.conj(w_s))))(
                    theta)
            hess_cc = (2.0 * jnp.real(_rdms.gram_last(jnp.conj(Jl), HJ))
                       + term2)

        # RDMs and their theta-tangents from the Phi gram (product rule)
        phi = shard(_rdms.apply_epq_all(psi, ncas, utd, maps),
                    None, s_ax)                          # (n^2, D)
        gamma = jnp.real(phi @ jnp.conj(psi)).reshape(ncas, ncas)
        corr = jnp.real(_rdms.gram_last(jnp.conj(phi), phi)).reshape(
            ncas, ncas, ncas, ncas)
        delta = jnp.eye(ncas, dtype=gamma.dtype)
        Gamma = (jnp.transpose(corr, (1, 0, 2, 3))
                 - jnp.einsum("qr,ps->pqrs", delta, gamma))

        phi_l = lp(phi)
        psi_l = lp(psi)

        def transition_rdms(Jc):
            # mixed mode: the O(nt n^4 D) grams over the big state axis
            # run in f32 (prec_ctx), then the tiny (ncas^4) tangent RDMs
            # are promoted to f64 for the nao-space Fock pack — the pack
            # is O(ns^2 nao^2) per tangent (noise next to the grams) and
            # the TPU f32 path of the fock contractions was measured
            # unreliable (oc block rel error ~7 on chip, CPU fine).
            with prec_ctx():
                phiJ = jax.vmap(
                    lambda v: _rdms.apply_epq_all(v, ncas, utd, maps))(Jc)
                phiJ = shard(phiJ, t_ax, None, s_ax)
                # d corr[a,b] = <dphi_a|phi_b> + <phi_a|dphi_b>, real
                # part; both contractions via gram_last so the big D
                # axis never gets relayed out (see ops/rdms.gram_last)
                dgram = jnp.real(
                    _rdms.gram_last(jnp.conj(phiJ), phi_l)
                    + jnp.transpose(
                        _rdms.gram_last(jnp.conj(phi_l), phiJ),
                        (1, 0, 2)))
                dgamma = jnp.real(
                    (phiJ @ jnp.conj(psi_l))
                    + jnp.einsum("ad,id->ia", phi_l,
                                 jnp.conj(Jc))).reshape(-1, ncas, ncas)
            dgamma = dgamma.astype(jnp.float64)
            dcorr = dgram.reshape(-1, ncas, ncas, ncas, ncas).astype(
                jnp.float64)
            delta_t = jnp.eye(ncas, dtype=jnp.float64)
            dGamma = (jnp.transpose(dcorr, (0, 2, 1, 3, 4))
                      - jnp.einsum("qr,ips->ipqrs", delta_t, dgamma))
            return dgamma, dGamma

        def pack_grad(g1, G2):
            grad4 = _fock.analytic_gradient_from_integrals(
                h1, g2, g1, G2, occ, act)
            return _kappa.skew_symmetric_to_vector(grad4)[params_idx_dev]

        grad_o = pack_grad(gamma, Gamma)
        # the analytic gradient is affine in the RDMs: subtract its value
        # at zero RDMs to get the linear part applied to each tangent
        G0 = pack_grad(jnp.zeros_like(gamma), jnp.zeros_like(Gamma))

        def oc_rows(Jc):
            dgamma, dGamma = transition_rdms(Jc)
            return jax.vmap(pack_grad)(dgamma, dGamma) - G0[None, :]

        if n_kappa:
            hess_oc = map_chunked(oc_rows, Jl).T.reshape(n_kappa, nt)
        else:  # full-space active problems have no orbital parameters
            hess_oc = jnp.zeros((0, nt), dtype=theta.dtype)

        hess4 = _fock.analytic_hessian_from_integrals(
            h1, g2, gamma, Gamma, occ, act)
        hess_oo = _fock.full_hessian_to_matrix(hess4, params_idx, nao)
        grad = jnp.concatenate([grad_c, grad_o])
        hess = jnp.block([[hess_cc.reshape(nt, nt), hess_oc.T],
                          [hess_oc, hess_oo]])
        # mixed mode: the solver consumes a uniform f64 matrix (entries
        # carry f32 accuracy where blocks ran in f32)
        return e0, grad, hess.astype(jnp.float64)

    # ---- staged large-D pipeline ---------------------------------------
    # ONE fused grad_hess program at D ~ 850k ((12e,12o) sector) exceeds
    # HBM working-set comfort and XLA resorts to compressed
    # rematerialization of the ~1 GB (ncas^2, D) buffers — measured to
    # inflate a ~60 s iteration to > 900 s, at which point the device
    # runtime gives up.  Above _STAGED_MIN_D the SAME math runs as
    # separate modest-peak programs; every intermediate stays
    # device-resident between dispatches, and each program's peak is a
    # few GB so nothing spills.  Exactness vs the fused program is
    # pinned in tests/test_oo_pqc.py.
    n2s = ncas * ncas

    def _coeffs(oao, int1e_ao, int2e_ao, oao_coeff, nuc):
        mo = oao_coeff @ oao
        h1, g2, c0, c1, c2 = active_coeffs(int1e_ao, int2e_ao, nuc, mo)
        return h1, g2, c0, c2, _ham.c1_effective(c1, c2)

    def _state_and_J(theta, tables):
        maps = pqc._maps_from(tables)
        from ..ops.grid import GridMaps as _GM, to_grid as _tg
        is_grid = isinstance(maps, _GM)
        grid_state = is_grid and pqc.grid_program is not None

        def f(th):
            # grid order from here on: every staged program downstream
            # (_hrow, _phi_of, _row_fused, the grams) contracts
            # consistently-ordered operands
            if grid_state:
                return pqc._state_impl_grid(th, tables)
            s = pqc._state_impl(th, tables)
            return _tg(s, maps) if is_grid else s

        return f(theta), jax.jacfwd(f)(theta).T

    def _hrow(c1eff, c2, v, tables):
        return _ham.ham_apply(c1eff, c2, v, ncas, utd,
                              pqc._maps_from(tables))

    def _misc(c0, psi, Hpsi, J):
        # vdot_big, not a raw dot: at (16e,16o) the f64 dot emulation's
        # operand expansion on two D-vectors is ~10.6 GB (ops/rdms)
        e0 = c0 + jnp.real(_rdms.vdot_big(jnp.conj(psi), Hpsi))
        w = 2.0 * Hpsi
        # gram_last, not a raw J @ w: at (14e,14o) the unchunked f64
        # dot's operand expansion on the (nt, D) Jacobian is ~5 GB
        return e0, w, jnp.real(_rdms.gram_last(jnp.conj(J), w))

    def _term2_scalar(tables):
        """The scalar whose theta-Hessian is term2: f(th) = Re<psi(th)|w>.
        Returns (f, lowered tables/weight prep) respecting mixed mode."""
        maps = pqc._maps_from(tables)
        from ..ops.grid import GridMaps as _GM, from_grid as _fg
        is_grid = isinstance(maps, _GM)
        grid_state = is_grid and pqc.grid_program is not None

        def state_of(th, tabs):
            return (pqc._state_impl_grid(th, tabs) if grid_state
                    else pqc._state_impl(th, tabs))

        def prep_w(w):
            if is_grid and not grid_state:
                w = _fg(w, maps)  # canonical simulator, grid-ordered w
            return lp(w)

        tabs = _lowp_tables(tables) if mixed else tables
        return state_of, prep_w, tabs

    def _term2(theta, w, tables):
        state_of, prep_w, tabs = _term2_scalar(tables)
        w = prep_w(w)
        th0 = theta.astype(jnp.float32) if mixed else theta
        with prec_ctx():
            return jax.jacfwd(jax.grad(
                lambda th: jnp.real(state_of(th, tabs)
                                    @ jnp.conj(w))))(th0)

    def _term2_hvp(theta, w, tables, v):
        """One Hessian row of Re<psi(th)|w> via jvp-of-grad: the
        (14e,14o)+ streamed path, where the full jacfwd(grad) program's
        tangent-batched VJP residuals (~4 GB per tangent at D = 11.78M)
        cannot all be live at once.  One dispatch per tangent keeps the
        program at a single tangent's working set."""
        state_of, prep_w, tabs = _term2_scalar(tables)
        w = prep_w(w)
        th0 = theta.astype(jnp.float32) if mixed else theta
        v = v.astype(th0.dtype)
        with prec_ctx():
            g = jax.grad(lambda th: jnp.real(state_of(th, tabs)
                                             @ jnp.conj(w)))
            return jax.jvp(g, (th0,), (v,))[1]

    def _cc(J, HJ, term2):
        with prec_ctx():
            return (2.0 * jnp.real(_rdms.gram_last(jnp.conj(lp(J)), HJ))
                    + term2)

    def _phi_of(psi, tables):
        return _rdms.apply_epq_all(psi, ncas, utd,
                                   pqc._maps_from(tables))

    def _rdms_of(phi, psi):
        gamma = jnp.real(phi @ jnp.conj(psi)).reshape(ncas, ncas)
        corr = jnp.real(_rdms.gram_last(jnp.conj(phi), phi)).reshape(
            ncas, ncas, ncas, ncas)
        delta = jnp.eye(ncas, dtype=gamma.dtype)
        Gamma = (jnp.transpose(corr, (1, 0, 2, 3))
                 - jnp.einsum("qr,ps->pqrs", delta, gamma))
        return gamma, Gamma

    def _pack(h1, g2, g1, G2):
        grad4 = _fock.analytic_gradient_from_integrals(
            h1, g2, g1, G2, occ, act)
        return _kappa.skew_symmetric_to_vector(grad4)[params_idx_dev]

    def _orb(h1, g2, gamma, Gamma):
        grad_o = _pack(h1, g2, gamma, Gamma)
        G0 = _pack(h1, g2, jnp.zeros_like(gamma), jnp.zeros_like(Gamma))
        hess4 = _fock.analytic_hessian_from_integrals(
            h1, g2, gamma, Gamma, occ, act)
        return grad_o, G0, _fock.full_hessian_to_matrix(
            hess4, params_idx, nao)

    def _row_fused(Jrow, phi, psi, h1, g2, G0, c1eff, c2, tables):
        """Per-tangent program: ONE E_pq gather of the tangent feeds both
        the Hamiltonian-apply row (H J_i, for hess_cc) and the
        transition-RDM row (for hess_oc).  In mixed mode the whole row —
        a pure Hessian contribution — runs in f32."""
        with prec_ctx():
            Jrow, phi, psi = lp(Jrow), lp(phi), lp(psi)
            h1, g2, G0, c1eff, c2 = (lp(h1), lp(g2), lp(G0), lp(c1eff),
                                     lp(c2))
            maps = pqc._maps_from(tables)
            phiJ = _rdms.apply_epq_all(Jrow, ncas, utd, maps)
            # dgram[a,b] = <dphi_a|phi_b> + <phi_a|dphi_b> (both terms
            # are (a,b)-indexed grams here — no transpose, unlike the
            # batched 3-D form where the tangent axis leads)
            HJrow = _ham.ham_apply(c1eff, c2, Jrow, ncas, utd, maps,
                                   phi_pre=phiJ[None])
            dgram = jnp.real(_rdms.gram_last(jnp.conj(phiJ), phi)
                             + _rdms.gram_last(jnp.conj(phi), phiJ))
            dgamma = jnp.real(
                phiJ @ jnp.conj(psi)
                + _rdms.gram_last(phi, jnp.conj(Jrow[None, :]))[:, 0]
            ).reshape(ncas, ncas)
            delta = jnp.eye(ncas, dtype=dgamma.dtype)
            dcorr = dgram.reshape(ncas, ncas, ncas, ncas)
            dGamma = (jnp.transpose(dcorr, (1, 0, 2, 3))
                      - jnp.einsum("qr,ps->pqrs", delta, dgamma))
            return HJrow, _pack(h1, g2, dgamma, dGamma) - G0

    def _row_streamed(Jrow, psi, h1, g2, G0, c1eff, c2, tables):
        """Per-tangent program for (14e,14o)+ grid sectors where a full
        (n2, D) Phi cannot materialize: the Hamiltonian apply streams
        its own Phi internally (pair-blocked, ops/grid.ham_apply_rows)
        and the transition-RDM row streams both Phis over grid A-rows
        (ops/grid.transition_rdms_rows) — same math as _row_fused, no
        (n2, D) buffer anywhere."""
        from ..ops.grid import transition_rdms_rows, _row_chunk
        with prec_ctx():
            Jrow, psi = lp(Jrow), lp(psi)
            h1, g2, G0, c1eff, c2 = (lp(h1), lp(g2), lp(G0), lp(c1eff),
                                     lp(c2))
            maps = pqc._maps_from(tables)
            HJrow = _ham.ham_apply(c1eff, c2, Jrow, ncas, utd, maps)
            itemsize = jnp.dtype(Jrow.dtype).itemsize
            dgamma_f, dcorr = transition_rdms_rows(
                psi, Jrow, maps, ncas,
                _row_chunk(1, n2s, maps.Nb, itemsize))
            dgamma = dgamma_f.reshape(ncas, ncas)
            delta = jnp.eye(ncas, dtype=dgamma.dtype)
            dGamma = (jnp.transpose(
                dcorr.reshape(ncas, ncas, ncas, ncas), (1, 0, 2, 3))
                - jnp.einsum("qr,ps->pqrs", delta, dgamma))
            return HJrow, _pack(h1, g2, dgamma, dGamma) - G0

    def _assemble(grad_c, grad_o, hess_cc, oc_stack, hess_oo):
        hess_oc = oc_stack.T.reshape(n_kappa, nt).astype(jnp.float64)
        grad = jnp.concatenate([grad_c, grad_o])
        hess = jnp.block([[hess_cc.reshape(nt, nt).astype(jnp.float64),
                           hess_oc.T],
                          [hess_oc, hess_oo]])
        return grad, hess

    _staged_jits = {}

    def _sj(name, fn):
        if name not in _staged_jits:
            _staged_jits[name] = jax.jit(fn)
        return _staged_jits[name]

    # tangent rows per staged program: one-row-per-dispatch left most of
    # the (12e,12o) iteration in dispatch+sync overhead (nt programs of
    # ~1 s each).  Rows are grouped so the dominant (chunk, n2, D)
    # intermediates stay ~1.5 GB — far under the spill threshold the
    # staging exists to avoid — which cuts dispatches nt -> nt/chunk.
    # In mixed mode the f32 buffers are half-size, so the chunk doubles.
    _row_itemsize = 4 if mixed else 8
    D_prog = max(1, pqc.state_dim)
    _stage_chunk = int(min(
        8, max(1, int(1.5e9 // max(1, n2s * D_prog * _row_itemsize)))))

    _rows_fused = jax.vmap(_row_fused,
                           in_axes=(0,) + (None,) * 8)
    _rows_streamed = jax.vmap(_row_streamed,
                              in_axes=(0,) + (None,) * 7)

    # a full (n2, D) Phi fits comfortably up to ~(12e,12o) (1 GB f64);
    # above that ((14e,14o): 18.5 GB) every per-tangent row program must
    # stream its own Phi (grid sectors only — dense paths never reach
    # such D).  _FORCE_STREAMED_ROWS is the test escape hatch pinning
    # streamed == fused at small D.
    from ..ops.grid import _pair_chunk as __pair_chunk
    _grid_staged = pqc.grid_program is not None
    _phi_fits = (not _grid_staged) or (
        __pair_chunk(1, D_prog, n2s, 8) >= n2s)

    def _pair_jvp(theta, v, tables):
        """One Jacobian column J(theta) @ v via the hand-written
        tangent-pair program (grid_program.apply_pair forward) — NOT
        jax.jvp over the plain apply: at (16e,16o) XLA's jvp lowering
        rematerializes per-gate row-block copies (measured 25.5 GB at
        compile), while the explicit pair chain schedules in-place like
        the plain apply.  Mixed mode computes it in f32 — the column
        only ever feeds Hessian blocks."""
        tabs = _lowp_tables(tables) if mixed else tables
        th0 = theta.astype(jnp.float32) if mixed else theta
        v0 = v.astype(th0.dtype)
        return pqc._pair_state_impl_grid(th0, v0, tabs)[1]

    def _cc_row_pair(theta, v, HJ, Hpsi, tables):
        """One hess_cc row — 2 Re<J_j|H J_i> + 2 Re<d2psi/dth_i th_j|
        H psi> — as ONE reverse pass over the tangent-pair adjoint
        program with both cotangent seeds: the row is the theta-gradient
        of Re<psi(th)|2 H J_i> + Re<J(th) e_i|2 H psi>
        (grid_program.apply_pair_adjoint; O(D) residuals)."""
        tabs = _lowp_tables(tables) if mixed else tables
        th0 = theta.astype(jnp.float32) if mixed else theta
        v0 = v.astype(th0.dtype)
        a = lp(2.0 * HJ)
        b = lp(2.0 * Hpsi)
        with prec_ctx():
            def f(th):
                ps, dl = pqc._pair_state_impl_grid(th, v0, tabs)
                return (jnp.real(_rdms.vdot_big(ps, jnp.conj(a)))
                        + jnp.real(_rdms.vdot_big(dl, jnp.conj(b))))

            return jax.grad(f)(th0)

    def _oc_row_hosted(h1, g2, G0, dgamma_f, dcorr):
        """hess_oc row from the hosted transition-RDM accumulators
        (same dgamma/dGamma assembly as _row_streamed; the pack runs
        f64 — the accumulators already are)."""
        dgamma = dgamma_f.reshape(ncas, ncas).astype(jnp.float64)
        dcorr4 = dcorr.reshape(ncas, ncas, ncas, ncas).astype(
            jnp.float64)
        delta = jnp.eye(ncas, dtype=dgamma.dtype)
        dGamma = (jnp.transpose(dcorr4, (1, 0, 2, 3))
                  - jnp.einsum("qr,ps->pqrs", delta, dgamma))
        return _pack(h1, g2, dgamma, dGamma) - G0

    def _t2_row_pair(theta, v, Hpsi, tables):
        """term2 row i = the theta-gradient of Re<J(theta) e_i, 2 H psi>
        — the pair-adjoint program with only the delta cotangent seeded
        (gram-route companion of _cc_row_pair)."""
        tabs = _lowp_tables(tables) if mixed else tables
        th0 = theta.astype(jnp.float32) if mixed else theta
        v0 = v.astype(th0.dtype)
        b = lp(2.0 * Hpsi)
        with prec_ctx():
            def f(th):
                _, dl = pqc._pair_state_impl_grid(th, v0, tabs)
                return jnp.real(_rdms.vdot_big(dl, jnp.conj(b)))

            return jax.grad(f)(th0)

    def _gram_asm(M1, gsmall, cross0, c1eff, c0):
        """e0 / circuit gradient / symmetrized term1 / psi RDMs from the
        cross-sweep accumulators: <s_a|H|s_b> = M1 + c1f . gsmall."""
        c1f = c1eff.reshape(n2s).astype(M1.dtype)
        ham = M1 + gsmall @ c1f
        e0 = c0 + ham[0, 0]
        grad_c = 2.0 * ham[1:, 0]
        t1 = ham[1:, 1:]
        term1 = t1 + t1.T          # 2 * sym(<J_i|H|J_j>)
        gamma_f = gsmall[0, 0]
        from ..ops.grid_hosted import _assemble_rdms
        gamma, Gamma = _assemble_rdms(gamma_f, cross0[0], ncas)
        return e0, grad_c, term1, gamma, Gamma

    def _oc_rows_gram(h1, g2, G0, gsmall, cross0):
        """All hess_oc rows from the cross-sweep accumulators:
        dgamma_i = gsmall[0,i] + gsmall[i,0], dcorr_i = cross0[i] +
        cross0[i].T (transition_rdms_rows' pair ordering)."""
        delta = jnp.eye(ncas, dtype=jnp.float64)
        rows = []
        for i in range(nt):
            dgamma = (gsmall[0, i + 1]
                      + gsmall[i + 1, 0]).reshape(ncas, ncas)
            dcorr4 = (cross0[i + 1] + cross0[i + 1].T).reshape(
                ncas, ncas, ncas, ncas)
            dGamma = (jnp.transpose(dcorr4, (1, 0, 2, 3))
                      - jnp.einsum("qr,ps->pqrs", delta, dgamma))
            rows.append(_pack(h1, g2, dgamma, dGamma) - G0)
        return jnp.stack(rows)

    def grad_hess_hosted_gram(theta, oao, int1e_ao, int2e_ao, oao_coeff,
                              nuc, tables, h1, g2, c0, c2, c1eff):
        """Gram-route hosted second order: ONE multi-state cross sweep
        (ops/grid_hosted.cross_hosted) replaces the per-tangent
        H-apply passes — the phi+gram pass is ~4x cheaper than the
        scatter-form pass (measured, BASELINE round 5), and term1,
        grad_c, e0, psi's RDMs and the oc transition RDMs all read off
        the sweep's accumulators.  Remaining dispatches: one hosted
        H-apply of psi (term2's cotangent) and one pair-adjoint row
        per tangent."""
        from ..ops import grid_hosted as _gh
        gm = pqc.sector_maps
        cdt = jnp.float32 if mixed else jnp.float64
        # pre-warm the hosted table caches while the heap is empty
        # (see grid_hosted.warm_tables_for) — both the H-apply pass's
        # tables and the sweep's own row_chunk variant
        _gh.warm_tables_for(gm, cdt)
        from ..ops.grid import _row_scan_tables as _rst
        rc_sweep, _ = _gh.cross_stack_spec(gm, nt + 1, cdt)
        _rst(gm, rc_sweep)
        psi = _sj("state_g", _state_only)(theta, tables)
        psi_p = _sj("lowp_psi", _lowp)(psi) if mixed else psi
        # e0/grad come from the sweep accumulators — the f64 state is
        # not needed again (1.3 GB at (16e,16o))
        del psi
        states = [psi_p]
        for i in range(nt):
            v = jnp.zeros((nt,), theta.dtype).at[i].set(1.0)
            states.append(_sj("pair_jvp", _pair_jvp)(theta, v, tables))
        # settle barrier: let the pair programs' workspaces drain
        # before the sweep dispatches under a near-full heap
        states[-1].block_until_ready()
        M1, gsmall, cross0 = _gh.cross_hosted(states, c2, gm, ncas)
        del states
        # barrier: the ~10 GB tangent-column set must actually be
        # RELEASED (its last async consumer finished) before the
        # H-apply pass below allocates — only psi_p stays live for it
        M1.block_until_ready()
        # H|psi> (term2's cotangent) AFTER the sweep: the H-apply pass
        # and the (nt+1)-state column set are never co-resident at
        # (16e,16o)
        Hpsi = _gh.ham_apply_hosted(c1eff, c2, psi_p, gm)
        del psi_p
        e0, grad_c, term1, gamma, Gamma = _sj("gram_asm", _gram_asm)(
            M1, gsmall, cross0, c1eff, c0)
        grad_o, G0, hess_oo = _sj("orb", _orb)(h1, g2, gamma, Gamma)
        oc = (_sj("oc_rows_g", _oc_rows_gram)(h1, g2, G0, gsmall,
                                              cross0)
              if n_kappa else jnp.zeros((nt, 0), dtype=jnp.float64))
        t2 = jnp.stack([
            _sj("t2_row", _t2_row_pair)(
                theta, jnp.zeros((nt,), theta.dtype).at[i].set(1.0),
                Hpsi, tables)
            for i in range(nt)])
        hess_cc = term1 + t2.astype(jnp.float64)
        grad, hess = _sj("asm", _assemble)(grad_c, grad_o, hess_cc, oc,
                                           hess_oo)
        return e0, grad, hess

    # gram route: the (nt+1, D) stack must fit HBM next to the chunk
    # temps; above the budget (f64 at (16e,16o): 20 GB) the per-tangent
    # route streams one column at a time instead
    def _hosted_stack_max_bytes():
        return int(float(os.environ.get(
            "AUTO_OO_TPU_HOSTED_STACK_MAX_BYTES", 11e9)))

    def grad_hess_hosted(theta, oao, int1e_ao, int2e_ao, oao_coeff, nuc,
                         tables):
        """(e0, grad, hess) with every large-D kernel host-segmented —
        the (16e,16o)-scale second-order engine (reference capability
        at scales its architecture cannot represent: oo_pqc.py:136-148).

        Default: the GRAM route (one multi-state cross sweep,
        grad_hess_hosted_gram).  The PER-TANGENT route below (one
        hosted H-apply pass per tangent) serves stacks over the HBM
        budget and the A/B toggle AUTO_OO_TPU_HOSTED_PER_TANGENT=1.
        In mixed mode everything Hessian-only runs f32; e0/grad inherit
        the f32 sweep (documented ~1e-6-relative noise, same contract
        as the hosted gradient pipeline)."""
        from ..ops import grid_hosted as _gh
        gm = pqc.sector_maps
        h1, g2, c0, c2, c1eff = _sj("coeffs", _coeffs)(
            oao, int1e_ao, int2e_ao, oao_coeff, nuc)
        cdt = jnp.float32 if mixed else jnp.float64
        stack_bytes = (nt + 1) * pqc.state_dim * jnp.dtype(cdt).itemsize
        if (os.environ.get("AUTO_OO_TPU_HOSTED_PER_TANGENT", "") != "1"
                and stack_bytes <= _hosted_stack_max_bytes()):
            return grad_hess_hosted_gram(
                theta, oao, int1e_ao, int2e_ao, oao_coeff, nuc, tables,
                h1, g2, c0, c2, c1eff)
        psi = _sj("state_g", _state_only)(theta, tables)
        psi_p = _sj("lowp_psi", _lowp)(psi) if mixed else psi
        Hpsi, g1, G2 = _gh.ham_and_rdms_hosted(c1eff, c2, psi_p, gm,
                                               ncas)
        e0, grad_c = _sj("vjp_g", _grad_c_vjp)(theta, c0, psi, Hpsi,
                                               tables)
        grad_o, G0, hess_oo = _sj("orb", _orb)(h1, g2, g1, G2)
        cc_rows, oc_rows = [], []
        for i in range(nt):
            v = jnp.zeros((nt,), theta.dtype).at[i].set(1.0)
            Ji = _sj("pair_jvp", _pair_jvp)(theta, v, tables)
            if n_kappa:
                HJi, dg_i, dc_i = _gh.ham_and_trdms_hosted(
                    c1eff, c2, psi_p, Ji, gm, ncas)
                oc_rows.append(_sj("oc_row_h", _oc_row_hosted)(
                    h1, g2, G0, dg_i, dc_i))
            else:
                HJi = _gh.ham_apply_hosted(c1eff, c2, Ji, gm)
            cc_rows.append(_sj("cc_row", _cc_row_pair)(
                theta, v, HJi, Hpsi, tables))
        hess_cc = jnp.stack(cc_rows)
        oc = (jnp.stack(oc_rows) if n_kappa
              else jnp.zeros((nt, 0), dtype=jnp.float64))
        grad, hess = _sj("asm", _assemble)(grad_c, grad_o, hess_cc, oc,
                                           hess_oo)
        return e0, grad, hess

    def grad_hess_staged(theta, oao, int1e_ao, int2e_ao, oao_coeff, nuc,
                         tables):
        if _hosted_mode():
            return grad_hess_hosted(theta, oao, int1e_ao, int2e_ao,
                                    oao_coeff, nuc, tables)
        h1, g2, c0, c2, c1eff = _sj("coeffs", _coeffs)(
            oao, int1e_ao, int2e_ao, oao_coeff, nuc)
        psi, J = _sj("stateJ", _state_and_J)(theta, tables)
        Hpsi = _sj("hrow", _hrow)(c1eff, c2, psi, tables)
        streamed = _grid_staged and (not _phi_fits
                                     or _FORCE_STREAMED_ROWS[0])
        if streamed:
            gamma, Gamma = _sj("rdms_s", _rdms_streamed)(psi, tables)
        else:
            phi = _sj("phi", _phi_of)(psi, tables)
            gamma, Gamma = _sj("rdms", _rdms_of)(phi, psi)
        grad_o, G0, hess_oo = _sj("orb", _orb)(h1, g2, gamma, Gamma)
        rows = (_sj("rows_s", _rows_streamed) if streamed
                else _sj("rows", _rows_fused))
        ck = _stage_chunk
        n_chunks = -(-nt // ck)
        pad = n_chunks * ck - nt
        Jp = (jnp.concatenate(
            [J, jnp.zeros((pad,) + J.shape[1:], J.dtype)]) if pad else J)
        HJ_parts, oc_parts = [], []
        for c in range(n_chunks):
            Jc = Jp[c * ck:(c + 1) * ck]
            if streamed:
                HJc, occ_c = rows(Jc, psi, h1, g2, G0, c1eff, c2,
                                  tables)
            else:
                HJc, occ_c = rows(Jc, phi, psi, h1, g2, G0, c1eff, c2,
                                  tables)
            HJ_parts.append(HJc)
            oc_parts.append(occ_c)
        HJ = jnp.concatenate(HJ_parts)[:nt]
        oc = (jnp.concatenate(oc_parts)[:nt] if n_kappa
              else jnp.zeros((nt, 0), dtype=jnp.float64))
        e0, w, grad_c = _sj("misc", _misc)(c0, psi, Hpsi, J)
        if streamed:
            eye = jnp.eye(nt, dtype=theta.dtype)
            term2 = jnp.stack([
                _sj("term2_hvp", _term2_hvp)(theta, w, tables, eye[i])
                for i in range(nt)])
        else:
            term2 = _sj("term2", _term2)(theta, w, tables)
        hess_cc = _sj("cc", _cc)(J, HJ, term2)
        grad, hess = _sj("asm", _assemble)(grad_c, grad_o, hess_cc, oc,
                                           hess_oo)
        return e0, grad, hess

    # ---- gradient-only pipeline (beyond-Hessian scales) ---------------
    # At (14e,14o) (D = 11.78M) even ONE (n2, D) buffer exceeds HBM, so
    # the quadratic-form Hessian (nt such buffers worth of tangent
    # traffic) is out of reach on a single chip; the energy+gradient is
    # not: forward state, one streamed Hamiltonian apply, one VJP
    # (reverse pass, O(n_gates * D) residuals) for the circuit gradient
    # — no (nt, D) Jacobian — and streamed RDMs for the orbital
    # gradient.  Drives OO_pqc.gradient_optimization.

    def _state_only(theta, tables):
        maps = pqc._maps_from(tables)
        from ..ops.grid import GridMaps as _GM, to_grid as _tg
        is_grid = isinstance(maps, _GM)
        if is_grid and pqc.grid_program is not None:
            # adjoint (reversible) backward: the VJP in _grad_c_vjp
            # reconstructs states by inverse rotation — O(D) residuals
            # instead of O(n_gates * D), the memory wall at (14e,14o)+
            return pqc._state_impl_grid(theta, tables, adjoint=True)
        s = pqc._state_impl(theta, tables)
        return _tg(s, maps) if is_grid else s

    def _rdms_streamed(psi, tables):
        maps = pqc._maps_from(tables)
        from ..ops.grid import GridMaps as _GM
        if isinstance(maps, _GM):
            return _rdms.rdms_from_state(psi, ncas, utd, maps,
                                         grid_order=True)
        phi = _rdms.apply_epq_all(psi, ncas, utd, maps)
        return _rdms_of(phi, psi)

    def _hrow_mixed(c1eff, c2, v32, tables):
        # coefficients cast INSIDE the program: f64 c1eff/c2 arguments
        # would silently upcast every phi product back to f64
        return _hrow(_lowp(c1eff), _lowp(c2), v32, tables)

    def _rdms_streamed_mixed(v32, tables):
        g1, G2 = _rdms_streamed(v32, tables)
        return g1.astype(jnp.float64), G2.astype(jnp.float64)

    def _grad_c_vjp(theta, c0, psi, Hpsi, tables):
        # vdot_big everywhere a D-dot appears: the f64 dot emulation's
        # ~8x operand expansion OOMs at (16e,16o); the inner scalar is
        # differentiated, which vdot_big supports (gram_last does not)
        e0 = c0 + jnp.real(_rdms.vdot_big(jnp.conj(psi), Hpsi))
        w = 2.0 * Hpsi

        def g(th):
            return jnp.real(_rdms.vdot_big(_state_only(th, tables),
                                           jnp.conj(w)))

        return e0, jax.grad(g)(theta)

    def _pack_only(h1, g2, g1, G2):
        return _pack(h1, g2, g1, G2)

    # ---- (16e,16o)-scale hosted routing --------------------------------
    # one full-Phi pass at D = 165.6M is ~339 GB of gather traffic
    # (~100 s) — over the device worker's single-program execution
    # window — and ham_apply's pair blocks degenerate to 1 there, so the
    # streamed RDM / H-apply programs run through the host-segmented
    # drivers (ops/grid_hosted) instead.  Checked at call time (env-
    # tunable budget) so tests can force the route at small D.

    def _hosted_mode():
        if not _grid_staged:
            return False
        from ..ops import grid_hosted as _gh
        # routing deliberately keyed on the f64 itemsize even in mixed
        # mode (where the hosted pass actually runs on an f32 state):
        # a sector either needs hosting in BOTH precision modes or in
        # neither, so mixed/f64 runs of one problem take the same route
        return _gh.needs_hosting(pqc.sector_maps, 8)

    def energy_gradient_staged(theta, oao, int1e_ao, int2e_ao, oao_coeff,
                               nuc, tables):
        h1, g2, c0, c2, c1eff = _sj("coeffs", _coeffs)(
            oao, int1e_ao, int2e_ao, oao_coeff, nuc)
        psi = _sj("state_g", _state_only)(theta, tables)
        if _hosted_mode():
            # ONE hosted full-Phi pass yields H|psi> AND the RDMs
            from ..ops import grid_hosted as _gh
            # mixed mode: the hosted pass IS the traffic (339 GB of f64
            # gathers+scatters at (16e,16o)), so the state is cast to
            # f32 for it — every byte of the pass halves.  The grams
            # are computed from the f32 state, so H|psi>, the RDMs and
            # everything they feed (energy, both gradient halves) carry
            # f32-level (~1e-6 relative, ~1e-5 per the tests) error;
            # the driver's f64 accumulators only avoid cross-dispatch
            # summation loss on top of that.  The VJP backward (gate
            # program) runs f64.  Acceptable here: the gradient-only
            # Adam loop this pipeline drives at these scales takes
            # 1e-2-scale steps.
            psi_p = _sj("lowp_psi", _lowp)(psi) if mixed else psi
            Hpsi, g1, G2 = _gh.ham_and_rdms_hosted(
                c1eff, c2, psi_p, pqc.sector_maps, ncas)
            e0, grad_c = _sj("vjp_g", _grad_c_vjp)(theta, c0, psi, Hpsi,
                                                   tables)
        elif mixed:
            # same traffic split below the hosted budget ((14e,14o)-class
            # streamed kernels): H-apply + RDM streams on an f32 state,
            # RDMs cast back to f64 for the orbital block, VJP f64
            psi_p = _sj("lowp_psi", _lowp)(psi)
            with prec_ctx():
                Hpsi = _sj("hrow32", _hrow_mixed)(c1eff, c2, psi_p,
                                                  tables)
                g1, G2 = _sj("rdms_g32", _rdms_streamed_mixed)(psi_p,
                                                               tables)
            e0, grad_c = _sj("vjp_g", _grad_c_vjp)(theta, c0, psi, Hpsi,
                                                   tables)
        else:
            Hpsi = _sj("hrow", _hrow)(c1eff, c2, psi, tables)
            e0, grad_c = _sj("vjp_g", _grad_c_vjp)(theta, c0, psi, Hpsi,
                                                   tables)
            g1, G2 = _sj("rdms_g", _rdms_streamed)(psi, tables)
        grad_o = (_sj("orb_g", _pack_only)(h1, g2, g1, G2) if n_kappa
                  else jnp.zeros((0,), dtype=theta.dtype))
        return e0, jnp.concatenate([grad_c, grad_o]), (g1, G2)

    def _energy_coeffs(kappa, oao, int1e_ao, int2e_ao, oao_coeff, nuc):
        mo = oao_coeff @ oao @ expm(-k2m(kappa))
        mo_sub = mo[:, sub]
        h1 = _tr.int1e_transform(int1e_ao, mo_sub)
        g2 = _tr.int2e_transform(int2e_ao, mo_sub)
        return _tr.molecular_hamiltonian_coefficients(
            nuc, h1, g2, occ_rel, act_rel)

    def energy_hosted(theta, kappa, oao, int1e_ao, int2e_ao, oao_coeff,
                      nuc, tables):
        """E(theta, kappa) with the RDM extraction host-segmented: a
        small coefficients program, one state dispatch, the hosted RDM
        driver, one tiny contraction — same value as the fused
        ``energy`` program (reference oo_pqc.py:64-84)."""
        from ..ops import grid_hosted as _gh
        c0, c1, c2 = _sj("ecoeffs", _energy_coeffs)(
            kappa, oao, int1e_ao, int2e_ao, oao_coeff, nuc)
        psi = _sj("state_g", _state_only)(theta, tables)
        # mixed mode: the hosted RDM pass runs on the f32 state (halves
        # the full-Phi traffic — this E feeds line-search trials of the
        # hosted NR loop, whose Armijo slack absorbs the ~1e-6-relative
        # noise; see newton_update_staged)
        if mixed:
            psi = _sj("lowp_psi", _lowp)(psi)
        g1, G2 = _gh.rdms_hosted(psi, pqc.sector_maps, ncas)
        return _sj("efr", _tr.energy_from_rdms)(c0, c1, c2, g1, G2)

    def _energy_call(theta, kappa, oao, int1e_ao, int2e_ao, oao_coeff,
                     nuc, tables):
        if _hosted_mode():
            return energy_hosted(theta, kappa, oao, int1e_ao, int2e_ao,
                                 oao_coeff, nuc, tables)
        return _sj("energy", energy)(theta, kappa, oao, int1e_ao,
                                     int2e_ao, oao_coeff, nuc, tables)

    _STAGED_MIN_D = 1 << 19
    D_static = pqc.state_dim
    use_staged = mesh is None and D_static >= _STAGED_MIN_D

    def _solve_dir(grad, hess, mu, rho, lambda_min):
        from ..utils.newton_raphson import newton_step_pure
        return newton_step_pure(grad, hess, mu=mu, rho=rho,
                                lambda_min=lambda_min,
                                method=newton_method)

    def _fold_oao(oao, new_kappa):
        return oao @ expm(-k2m(new_kappa))

    def newton_update_staged(theta, oao, int1e_ao, int2e_ao, oao_coeff,
                             nuc, tables, e0, grad, hess, alpha, beta,
                             mu, rho, lambda_min, lmax=20):
        """Host-driven damped Newton update for large D: the augmented
        solve is one small program, each Armijo trial is one forward-pass
        program (core energy), and the loop runs in Python — mirroring
        utils/newton_raphson.backtracking_pure trial for trial (incl. the
        roundoff slack), because the fused while_loop line-search program
        at D ~ 850k hits the same spill regime as the fused grad_hess."""
        import numpy as np_

        dp, lowest = _sj("solve", _solve_dir)(grad, hess, mu, rho,
                                              lambda_min)
        flat0 = jnp.concatenate(
            [theta, jnp.zeros(n_kappa, dtype=theta.dtype)])
        e_jit = _energy_call
        e0_f = float(e0)
        gdp = float(grad @ dp)
        slack = 64.0 * np_.finfo(np_.float64).eps * max(1.0, abs(e0_f))
        if mixed and _hosted_mode():
            # hosted mixed trials come from the f32 full-Phi pass
            # (~1e-6-relative noise); a roundoff-level slack would burn
            # every halving on precision, not physics
            slack = max(slack, 2e-6 * max(1.0, abs(e0_f)))
        t = 1.0
        e_t = None
        for num in range(lmax):
            trial = flat0 + t * dp
            e_t = float(e_jit(trial[:nt], trial[nt:], oao, int1e_ao,
                              int2e_ao, oao_coeff, nuc, tables))
            if e_t <= e0_f + alpha * t * gdp + slack:
                break
            t *= beta
        else:
            t, e_t = 0.0, e0_f
        new_flat = flat0 + t * dp
        new_theta = new_flat[:nt]
        new_kappa = new_flat[nt:]
        new_oao = _sj("fold", _fold_oao)(oao, new_kappa)
        return new_theta, new_kappa, new_oao, jnp.asarray(e_t), lowest

    def newton_update(theta, oao, int1e_ao, int2e_ao, oao_coeff, nuc,
                      tables, e0, grad, hess, alpha, beta, mu, rho,
                      lambda_min):
        """Augmented-Newton solve + Armijo line search + MO update, given
        precomputed (e0, grad, hess)."""

        def objective(flat):
            return energy(flat[:nt], flat[nt:], oao, int1e_ao, int2e_ao,
                          oao_coeff, nuc, tables)

        flat0 = jnp.concatenate(
            [theta, jnp.zeros(n_kappa, dtype=theta.dtype)])
        new_flat, lowest, t, e_t = damped_newton_step_pure(
            objective, flat0, grad, hess, alpha=alpha, beta=beta,
            mu=mu, rho=rho, lambda_min=lambda_min, e0=e0,
            method=newton_method)
        new_theta = new_flat[:nt]
        new_kappa = new_flat[nt:]
        new_oao = oao @ expm(-k2m(new_kappa))
        # e_t IS the energy at (new_theta, new_oao): folding kappa into
        # the OAO coefficients leaves the MO matrix (hence the energy)
        # bit-identical, so no trailing re-evaluation is needed.
        return new_theta, new_kappa, new_oao, e_t, lowest

    grad_hess_fused_jit = jax.jit(grad_hess)
    # dispatcher: the staged pipeline replaces the fused programs above
    # the spill threshold (single-device only — under a mesh the tangent
    # axis is already partitioned, which removes the pressure)
    grad_hess_jit = (grad_hess_staged if use_staged
                     else grad_hess_fused_jit)
    newton_update_jit = (newton_update_staged if use_staged
                         else jax.jit(newton_update))

    def nr_iteration(theta, oao, int1e_ao, int2e_ao, oao_coeff, nuc,
                     tables, alpha, beta, mu, rho, lambda_min):
        """One NR iteration as TWO back-to-back device programs (grad+hess,
        then solve+line-search+update).  Splitting compiles ~25% faster
        than the fused program (XLA whole-module passes scale superlinearly
        in program size) and all intermediates stay on device."""
        e0, grad, hess = grad_hess_jit(theta, oao, int1e_ao, int2e_ao,
                                       oao_coeff, nuc, tables)
        return newton_update_jit(theta, oao, int1e_ao, int2e_ao, oao_coeff,
                                 nuc, tables, e0, grad, hess, alpha, beta,
                                 mu, rho, lambda_min)

    def full_opt_loop(theta, oao, int1e_ao, int2e_ao, oao_coeff, nuc,
                      tables, alpha, beta, mu, rho, lambda_min, conv_tol,
                      max_iterations):
        """The WHOLE damped-Newton optimization as ONE device program.

        lax.while_loop over complete NR iterations (grad+Hessian, solve,
        Armijo, MO fold) with the |dE| < conv_tol convergence test on
        device and fixed-size trajectory buffers — so a full OO-VQE run
        (reference oo_pqc.py:155-207) costs ONE dispatch and ONE
        trajectory fetch instead of one dispatch + two scalar syncs per
        iteration.  On the tunneled device, dispatch+sync latency is the
        dominant cost of every small/medium tier (BASELINE.md round-4
        environmental note), so this is the wall-clock path for
        production runs; the host loop remains for per-iteration
        monitoring and the staged large-D pipeline.

        Convergence semantics mirror the host loop exactly: iteration n
        (0-based) is the last one if n > 1 and |e_n - e_{n-1}| <
        conv_tol; buffers beyond the final iteration hold zeros and are
        sliced off by the caller using the returned iteration count."""
        dt = theta.dtype
        bufs0 = (
            jnp.zeros((max_iterations,), dtype=dt),           # energy
            jnp.zeros((max_iterations,), dtype=dt),           # lowest eig
            jnp.zeros((max_iterations, nt), dtype=dt),        # theta
            jnp.zeros((max_iterations, n_kappa), dtype=dt),   # kappa
            jnp.zeros((max_iterations,) + oao.shape, dtype=oao.dtype),
        )
        inf = jnp.asarray(jnp.inf, dtype=dt)

        def cond(carry):
            n, _th, _oao, e1, e2, _bufs = carry
            converged = jnp.logical_and(n >= 3,
                                        jnp.abs(e1 - e2) < conv_tol)
            return jnp.logical_and(n < max_iterations,
                                   jnp.logical_not(converged))

        def body(carry):
            n, th, oa, e1, _e2, bufs = carry
            e0, grad, hess = grad_hess(th, oa, int1e_ao, int2e_ao,
                                       oao_coeff, nuc, tables)
            th2, kap, oa2, e_t, lowest = newton_update(
                th, oa, int1e_ao, int2e_ao, oao_coeff, nuc, tables,
                e0, grad, hess, alpha, beta, mu, rho, lambda_min)
            e_buf, l_buf, t_buf, k_buf, o_buf = bufs
            bufs2 = (e_buf.at[n].set(e_t), l_buf.at[n].set(lowest),
                     t_buf.at[n].set(th2), k_buf.at[n].set(kap),
                     o_buf.at[n].set(oa2))
            return n + 1, th2, oa2, e_t, e1, bufs2

        n_done, _th, _oao, _e1, _e2, bufs = jax.lax.while_loop(
            cond, body, (jnp.asarray(0), theta, oao, inf, inf, bufs0))
        return n_done, bufs

    return {
        "energy": energy,
        # dispatcher, not a bare jit: above the hosted-traffic budget
        # ((16e,16o)+) the fused state+RDM energy program cannot execute
        # as one dispatch, so E routes through energy_hosted
        "energy_jit": _energy_call,
        "orbital_gradient": orbital_gradient,
        "grad_hess_fused": grad_hess,
        "grad_hess_jit": grad_hess_jit,
        "grad_hess_fused_jit": grad_hess_fused_jit,
        "grad_hess_staged": grad_hess_staged,
        "energy_gradient_staged": energy_gradient_staged,
        "newton_update_fused": newton_update,
        "newton_update_staged": newton_update_staged,
        "newton_update_jit": newton_update_jit,
        "nr_iteration_jit": nr_iteration,
        # one-dispatch whole-optimization program; unavailable above the
        # spill threshold (the staged pipeline is host-driven by design)
        "full_opt_jit": (None if use_staged
                         else jax.jit(full_opt_loop, static_argnums=(13,))),
    }


def _nr_core_for(pqc, nao, occ, act, params_idx, mesh=None,
                 tangent_axis="tp", state_axis=None, newton_method=None,
                 precision="f64"):
    """Spec-keyed cache of compiled cores, stored on the (shared) pqc."""
    from .. import config

    # the pallas toggle changes what the traced programs contain, so it
    # must be part of the cache key — otherwise set_pallas after a core
    # was built silently keeps serving the old path
    key = (nao, tuple(occ), tuple(act), tuple(int(i) for i in params_idx),
           mesh, tangent_axis, state_axis, newton_method, precision,
           config.pallas_enabled())
    cache = getattr(pqc, "_nr_core_cache", None)
    if cache is None:
        cache = pqc._nr_core_cache = {}
    if key not in cache:
        cache[key] = _build_nr_core(pqc, nao, occ, act, params_idx,
                                    mesh=mesh, tangent_axis=tangent_axis,
                                    state_axis=state_axis,
                                    newton_method=newton_method,
                                    precision=precision)
    return cache[key]


class OO_pqc(OO_energy):
    """Orbital-optimized PQC energy (reference oo_pqc.py:30)."""

    def __init__(self, pqc, mol, ncas, nelecas, oao_mo_coeff=None,
                 freeze_active=False, interface=None, newton_method=None,
                 precision="f64"):
        """``newton_method``: None (default — iterative solver for large
        Hessians on TPU, exact eigh otherwise), 'eigh' (force the exact
        eigendecomposition solve at every size; use when the lowest-
        Hessian-eigenvalue observable must be exact on clustered spectra)
        or 'iterative'.  See utils/newton_raphson.damped_newton_step_pure
        for the accuracy contract.

        ``precision``: 'f64' (default — everything in emulated f64 on
        TPU) or 'mixed' — the Hessian blocks run on the MXU in f32 while
        energy and gradient stay f64, cutting the dominant per-iteration
        cost (~8 f32 passes per f64 matmul avoided) at no cost to the
        converged energy (the stationary point is fixed by the f64
        gradient; validated to ~1e-10 Ha in tests/test_mixed_precision.py
        and promised at config.py:8).

        In the GRADIENT-ONLY pipeline (``energy_and_gradient`` /
        ``gradient_optimization``, the beyond-Hessian path), 'mixed'
        instead runs the H-apply/RDM streams on an f32 state — at
        (14e,14o)+/(16e,16o) those streams are the entire cost, so the
        traffic halves — with the VJP backward and the RDM hand-off kept
        f64.  There energy and gradient carry f32-level (~1e-6 relative)
        error, absorbed by the 1e-2-scale Adam steps; keep 'f64' if the
        logged gradient-loop energies must be exact beyond ~1e-6 Ha."""
        super().__init__(mol, ncas, nelecas, oao_mo_coeff=oao_mo_coeff,
                         freeze_active=freeze_active)
        self.pqc = pqc
        self.newton_method = newton_method
        self.precision = precision
        self._build_pure_fns()

    # -- pure functional core --------------------------------------------

    def _build_pure_fns(self):
        core = _nr_core_for(self.pqc, self.nao, self._occ, self._act,
                            self.params_idx,
                            newton_method=getattr(self, "newton_method",
                                                  None),
                            precision=getattr(self, "precision", "f64"))
        self._core = core
        # molecule arrays AND gate tables travel as runtime arguments:
        # closure capture would embed them as program constants (multi-GB
        # at 20 qubits, over the compile service's request limit)
        tables = self.pqc._tables()
        mol_args = (self.int1e_ao, self.int2e_ao, self.oao_coeff,
                    jnp.asarray(self.nuc), tables)
        self._mol_args = mol_args

        def energy_pure(theta, kappa, oao_mo_coeff):
            return core["energy"](theta, kappa, oao_mo_coeff, *mol_args)

        def orbital_gradient_pure(theta, oao_mo_coeff):
            return core["orbital_gradient"](theta, oao_mo_coeff,
                                            *mol_args[:3], tables)

        self._energy_pure = energy_pure
        self._orbital_gradient_pure = orbital_gradient_pure
        self._energy_jit = (
            lambda theta, kappa, oao: core["energy_jit"](
                theta, kappa, oao, *mol_args))
        self._grad_hess_jit = (
            lambda theta, oao: core["grad_hess_jit"](theta, oao, *mol_args))
        self._nr_iteration_jit = (
            lambda theta, oao, alpha, beta, mu, rho, lambda_min:
            core["nr_iteration_jit"](theta, oao, *mol_args, alpha, beta,
                                     mu, rho, lambda_min))
        self._full_opt_jit = (
            None if core["full_opt_jit"] is None else
            (lambda theta, oao, alpha, beta, mu, rho, lambda_min,
             conv_tol, max_iterations:
             core["full_opt_jit"](theta, oao, *mol_args, alpha, beta,
                                  mu, rho, lambda_min, conv_tol,
                                  max_iterations)))

    # -- reference-API derivative blocks ---------------------------------
    # All five blocks are views into ONE jitted grad+Hessian program (the
    # same program full_optimization runs), so repeated block queries
    # compile once and dispatch once each.

    def energy_from_parameters(self, theta, kappa=None):
        """Hybrid cost E(theta, kappa) (reference oo_pqc.py:64-84)."""
        theta = jnp.asarray(theta)
        if kappa is None:
            kappa = jnp.zeros(self.n_kappa, dtype=theta.dtype)
        return self._energy_jit(theta, jnp.asarray(kappa),
                                self.oao_mo_coeff)

    def _grad_hess(self, theta):
        return self._grad_hess_jit(jnp.asarray(theta), self.oao_mo_coeff)

    @property
    def _nt(self):
        return int(self.pqc.theta_shape)

    def circuit_gradient(self, theta):
        """dE/dtheta by AD through the simulator
        (reference oo_pqc.py:86-95)."""
        return self._grad_hess(theta)[1][:self._nt]

    def orbital_gradient(self, theta):
        """Analytic Fock gradient at the RDMs of theta
        (reference oo_pqc.py:97-101)."""
        return self._grad_hess(theta)[1][self._nt:]

    def circuit_circuit_hessian(self, theta):
        """d2E/dtheta2 (reference oo_pqc.py:103-111)."""
        return self._grad_hess(theta)[2][:self._nt, :self._nt]

    def orbital_circuit_hessian(self, theta):
        """Mixed block: d(analytic orbital gradient)/dtheta
        (reference oo_pqc.py:113-125).  Shape (n_kappa, n_theta)."""
        return self._grad_hess(theta)[2][self._nt:, :self._nt]

    def orbital_orbital_hessian(self, theta):
        """Analytic orbital Hessian at the RDMs of theta
        (reference oo_pqc.py:127-130)."""
        return self._grad_hess(theta)[2][self._nt:, self._nt:]

    def full_gradient(self, theta):
        """[circuit, orbital] gradient (reference oo_pqc.py:132-134)."""
        return self._grad_hess(theta)[1]

    def full_hessian(self, theta):
        """2x2 block Hessian (reference oo_pqc.py:136-148)."""
        return self._grad_hess(theta)[2]

    def full_circuit_hessian_to_matrix(self, full_circuit_hessian):
        size = int(np.prod(self.pqc.theta_shape))
        return full_circuit_hessian.reshape(size, size)

    # -- the optimizer loop ----------------------------------------------

    def energy_and_gradient(self, theta):
        """(E, full [circuit, orbital] gradient, (gamma, Gamma)) WITHOUT
        any Hessian work: forward state + one streamed Hamiltonian apply
        + one VJP + streamed RDMs.  The only derivative path that fits
        (14e,14o) (D = 11.78M) on a single chip — no (n2, D) or (nt, D)
        buffer is ever materialized (see energy_gradient_staged)."""
        e0, grad, rdms = self._core["energy_gradient_staged"](
            jnp.asarray(theta), self.oao_mo_coeff, *self._mol_args)
        return e0, grad, rdms

    def gradient_optimization(self, theta_init, max_iterations=200,
                              learning_rate=0.05, conv_tol=None,
                              orbital_every=10, orbital_kwargs=None,
                              verbose=0, flush=True, monitor=None,
                              optimizer=None, eval_fn=None):
        """Two-step first-order OO-VQE for beyond-Hessian scales: Adam on
        the circuit parameters (analytic gradient, no Hessian), with a
        damped-Newton ORBITAL relaxation at the current RDMs every
        ``orbital_every`` steps (the orbital Hessian is nao-space and
        cheap at any D — the classic two-step CASSCF split, here with the
        circuit in the CI role).  Returns (energy_l, theta).

        This is the optimizer for (14e,14o)-class problems where
        full_optimization's quadratic-form Hessian cannot fit; at small D
        prefer full_optimization (second-order, far fewer iterations).

        ``eval_fn`` overrides the per-iteration evaluation:
        theta -> (energy, circuit_gradient, rdms_thunk) where rdms_thunk
        is a zero-arg callable returning (gamma, Gamma) at the SAME
        theta, invoked only on orbital-relaxation iterations — the hook
        through which parallel.row_sharded_gradient_optimization runs
        this exact loop with every large-D stage on a device mesh.

        ``conv_tol`` defaults to 1e-8 (f64) / 1e-5 (precision='mixed'):
        the mixed hosted/streamed pass carries ~1e-6-relative energy
        noise, so a 1e-8 two-consecutive-delta test would essentially
        never fire and every mixed run would silently go to
        max_iterations.  Pass conv_tol explicitly to override."""
        import optax

        if conv_tol is None:
            conv_tol = 1e-5 if self.precision == "mixed" else 1e-8

        theta = jnp.asarray(theta_init)
        # any optax GradientTransformation may be substituted (the
        # update consumes only the circuit gradient)
        opt = optax.adam(learning_rate) if optimizer is None else optimizer
        opt_state = opt.init(theta)
        orbital_kwargs = dict(orbital_kwargs or {})
        orbital_kwargs.setdefault("max_iterations", 20)
        orbital_kwargs.setdefault("verbose", 0)
        nt = self._nt
        if eval_fn is None:
            def eval_fn(th):
                e, grad, rdms = self.energy_and_gradient(th)
                return e, grad[:nt], (lambda: rdms)
        energy_l = []
        for n in range(max_iterations):
            e, grad_c, rdms_thunk = eval_fn(theta)
            energy_l.append(float(e))
            if monitor is not None:
                monitor.log(n, energy_l[-1])
            if verbose is not None and verbose:
                print(f"iter = {n:03}, energy = {energy_l[-1]:.12f}",
                      flush=flush)
            relax = (orbital_every and (n + 1) % orbital_every == 0
                     and self.n_kappa)
            if relax:
                # RDMs at the PRE-update theta (the gradient's point)
                g1, G2 = rdms_thunk()
            updates, opt_state = opt.update(grad_c, opt_state, theta)
            theta = optax.apply_updates(theta, updates)
            if relax:
                orb_l = self.orbital_optimization(g1, G2,
                                                  **orbital_kwargs)
                if orb_l and verbose is not None and verbose:
                    print(f"  orbital relaxation -> {orb_l[-1]:.12f}",
                          flush=flush)
            if n > 2 and abs(energy_l[-1] - energy_l[-2]) < conv_tol \
                    and abs(energy_l[-2] - energy_l[-3]) < conv_tol:
                break
        return energy_l, theta

    def full_optimization(self, theta_init, max_iterations=50,
                          conv_tol=1e-10, verbose=0, flush=True,
                          alpha=1e-4, beta=0.5, mu=1e-6, rho=1.1,
                          lambda_min=1e-6, monitor=None, device_loop=False,
                          **kwargs):
        """Newton-Raphson on (theta, kappa) jointly
        (reference oo_pqc.py:155-207).

        Returns (energy_l, theta_l, kappa_l, oao_mo_coeff_l, hess_eig_l).
        One jitted device call per iteration — or, with
        ``device_loop=True``, the ENTIRE optimization as one device
        program (lax.while_loop over NR iterations, convergence test on
        device): one dispatch and one trajectory fetch total, removing
        all per-iteration host round trips.  Identical trajectories up
        to XLA fusion roundoff; per-iteration ``monitor``/``verbose``
        output is emitted after the run in that mode.  Unavailable (and
        rejected) for the staged large-D pipeline, which is host-driven
        by design."""
        theta = jnp.asarray(theta_init)
        if device_loop:
            return self._full_optimization_device(
                theta, max_iterations, conv_tol, verbose, flush, alpha,
                beta, mu, rho, lambda_min, monitor)
        energy_init = float(self.energy_from_parameters(theta))
        if verbose is not None and verbose:
            print(f"iter = 000, energy = {energy_init:.12f}", flush=flush)

        theta_l, kappa_l, oao_mo_coeff_l = [], [], []
        energy_l, hess_eig_l = [], []

        for n in range(max_iterations):
            theta, kappa, new_oao, energy, lowest = self._nr_iteration_jit(
                theta, self.oao_mo_coeff, alpha, beta, mu, rho, lambda_min)
            self.oao_mo_coeff = new_oao
            theta_l.append(theta)
            kappa_l.append(kappa)
            oao_mo_coeff_l.append(new_oao)
            energy_l.append(float(energy))
            hess_eig_l.append(float(lowest))
            if monitor is not None:
                monitor.log(n + 1, energy_l[-1],
                            lowest_hess_eig=hess_eig_l[-1])
            if verbose is not None and verbose:
                print(f"iter = {n + 1:03}, energy = {energy_l[-1]:.12f}",
                      flush=flush)
            if n > 1 and abs(energy_l[-1] - energy_l[-2]) < conv_tol:
                if verbose is not None and verbose:
                    print("optimization finished.")
                    print("E_fin =", energy_l[-1])
                break
        return energy_l, theta_l, kappa_l, oao_mo_coeff_l, hess_eig_l

    def _full_optimization_device(self, theta, max_iterations, conv_tol,
                                  verbose, flush, alpha, beta, mu, rho,
                                  lambda_min, monitor):
        """One-dispatch whole-optimization path (see full_optimization)."""
        if self._full_opt_jit is None:
            raise ValueError(
                "device_loop=True is unavailable for the staged large-D "
                "pipeline (D above the spill threshold is host-driven); "
                "use the default host loop")
        n_done, bufs = jax.device_get(self._full_opt_jit(
            theta, self.oao_mo_coeff, alpha, beta, mu, rho, lambda_min,
            conv_tol, int(max_iterations)))
        n = int(n_done)
        e_buf, l_buf, t_buf, k_buf, o_buf = bufs
        energy_l = [float(e) for e in e_buf[:n]]
        hess_eig_l = [float(x) for x in l_buf[:n]]
        theta_l = [jnp.asarray(t_buf[i]) for i in range(n)]
        kappa_l = [jnp.asarray(k_buf[i]) for i in range(n)]
        oao_mo_coeff_l = [jnp.asarray(o_buf[i]) for i in range(n)]
        if n:
            self.oao_mo_coeff = oao_mo_coeff_l[-1]
        for i in range(n):
            if monitor is not None:
                monitor.log(i + 1, energy_l[i],
                            lowest_hess_eig=hess_eig_l[i])
            if verbose is not None and verbose:
                print(f"iter = {i + 1:03}, energy = {energy_l[i]:.12f}",
                      flush=flush)
        if verbose is not None and verbose and n and (
                n < max_iterations or
                (n > 2 and abs(energy_l[-1] - energy_l[-2]) < conv_tol)):
            print("optimization finished.")
            print("E_fin =", energy_l[-1])
        return energy_l, theta_l, kappa_l, oao_mo_coeff_l, hess_eig_l
