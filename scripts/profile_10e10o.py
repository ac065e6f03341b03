"""Per-part wall-clock profile of the (10e,10o) sector NR iteration.

Times the building blocks of the fused grad+Hessian program as separate
device programs (state+Jacobian scan, batched Hamiltonian-apply, the
jacfwd-of-grad term2, the Phi/transition-RDM grams, the orbital pack) so
optimization effort goes where the 3.7 s (mixed) / 7.8 s (f64) actually
is.  Usage:

    python scripts/profile_10e10o.py [f64|mixed] [ncas] [nelecas]

Individual parts re-dispatch work the fused program shares (psi, J stay
device-resident either way), so the parts sum to >= the fused time; the
split is still honest about what dominates.
"""

import os
import sys
import time

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    precision = sys.argv[1] if len(sys.argv) > 1 else "mixed"
    ncas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    nelecas = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    os.makedirs(_CACHE, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from auto_oo_tpu import Moldata, get_formal_geo
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc
    from auto_oo_tpu.ops import hamiltonian as _ham
    from auto_oo_tpu.ops import rdms as _rdms
    from auto_oo_tpu.ops import transforms as _tr
    from auto_oo_tpu.models.oo_pqc import _lowp, _lowp_tables

    jax.jit(lambda x: x + 1.0)(jnp.zeros(8)).block_until_ready()

    t0 = time.time()
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    pqc = Parameterized_circuit(ncas, nelecas, ansatz="np_fabric",
                                n_layers=2, sector=True)
    oo = OO_pqc(pqc, mol, ncas, nelecas, freeze_active=True,
                precision=precision)
    theta = pqc.init_zeros()
    log(f"setup: {time.time() - t0:.1f}s (n_theta={pqc.theta_shape}, "
        f"n_kappa={oo.n_kappa}, D={pqc.state_dim}, {precision})")

    tables = pqc._tables()
    maps = pqc._maps_from(tables)
    utd = pqc.up_then_down
    mixed = precision == "mixed"
    lp = _lowp if mixed else (lambda x: x)

    import contextlib

    def prec_ctx():
        return (jax.default_matmul_precision("float32") if mixed
                else contextlib.nullcontext())

    mo = oo.oao_coeff @ oo.oao_mo_coeff
    h1 = _tr.int1e_transform(jnp.asarray(oo.int1e_ao), mo)
    g2 = _tr.int2e_transform(jnp.asarray(oo.int2e_ao), mo)
    c0, c1, c2 = _tr.molecular_hamiltonian_coefficients(
        jnp.asarray(oo.nuc), h1, g2, oo._occ, oo._act)
    c1eff = _ham.c1_effective(c1, c2)

    def state_fn(th):
        return pqc._state_impl(th, tables)

    def stateJ(th):
        return state_fn(th), jax.jacfwd(state_fn)(th).T

    def hj(c1eff_, c2_, J_):
        with prec_ctx():
            return _ham.ham_apply(lp(c1eff_), lp(c2_), lp(J_), ncas, utd,
                                  maps)

    def term2_fn(th, w):
        if mixed:
            tabs_l = _lowp_tables(tables)
            w_l = lp(w)
            with prec_ctx():
                return jax.jacfwd(jax.grad(
                    lambda t: jnp.real(pqc._state_impl(t, tabs_l)
                                       @ jnp.conj(w_l))))(
                    th.astype(jnp.float32))
        return jax.jacfwd(jax.grad(
            lambda t: jnp.real(state_fn(t) @ jnp.conj(w))))(th)

    def phi_fn(psi):
        return _rdms.apply_epq_all(psi, ncas, utd, maps)

    def cc_gram(J_, HJ_):
        with prec_ctx():
            return 2.0 * jnp.real(_rdms.gram_last(jnp.conj(lp(J_)), HJ_))

    def trans_rdms(J_, phi_, psi_):
        with prec_ctx():
            phi_l, psi_l = lp(phi_), lp(psi_)
            Jl = lp(J_)
            phiJ = jax.vmap(
                lambda v: _rdms.apply_epq_all(v, ncas, utd, maps))(Jl)
            dgram = jnp.real(
                _rdms.gram_last(jnp.conj(phiJ), phi_l)
                + jnp.transpose(
                    _rdms.gram_last(jnp.conj(phi_l), phiJ), (1, 0, 2)))
            dgamma = jnp.real(
                (phiJ @ jnp.conj(psi_l))
                + jnp.einsum("ad,id->ia", phi_l, jnp.conj(Jl)))
        return dgram, dgamma

    def timed(name, jitfn, args, n=4):
        t0 = time.time()
        out = jitfn(*args)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        times = []
        for _ in range(n):
            t0 = time.time()
            out = jitfn(*args)
            jax.block_until_ready(out)
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        log(f"{name:34s} {med:8.4f}s  (compile+1st {compile_s:.1f}s)")
        return out, med

    total = 0.0
    (psi, J), t = timed("stateJ (jacfwd scan)", jax.jit(stateJ), (theta,))
    total += t
    HJ, t = timed("ham_apply on J batch", jax.jit(hj), (c1eff, c2, J))
    total += t
    Hpsi = _ham.ham_apply(c1eff, c2, psi, ncas, utd, maps)
    w = 2.0 * Hpsi
    t2, t = timed("term2 (jacfwd-of-grad scan)", jax.jit(term2_fn),
                  (theta, w))
    total += t
    phi, t = timed("phi = E_pq psi (all pairs)", jax.jit(phi_fn), (psi,))
    total += t
    _, t = timed("hess_cc gram", jax.jit(cc_gram), (J, HJ))
    total += t
    _, t = timed("transition RDMs (phiJ grams)", jax.jit(trans_rdms),
                 (J, phi, psi))
    total += t
    log(f"{'sum of parts':34s} {total:8.4f}s")

    # whole programs for reference
    out = oo._grad_hess_jit(theta, oo.oao_mo_coeff)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.time()
        out = oo._grad_hess_jit(theta, oo.oao_mo_coeff)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    log(f"{'fused grad_hess program':34s} {sorted(times)[1]:8.4f}s")
    e0, grad, hess = out
    upd = oo._core["newton_update_jit"]
    o2 = upd(theta, oo.oao_mo_coeff, *oo._mol_args, e0, grad, hess,
             1e-4, 0.5, 1e-6, 1.1, 1e-6)
    jax.block_until_ready(o2)
    times = []
    for _ in range(3):
        t0 = time.time()
        o2 = upd(theta, oo.oao_mo_coeff, *oo._mol_args, e0, grad, hess,
                 1e-4, 0.5, 1e-6, 1.1, 1e-6)
        jax.block_until_ready(o2)
        times.append(time.time() - t0)
    log(f"{'newton_update program':34s} {sorted(times)[1]:8.4f}s")


if __name__ == "__main__":
    main()
