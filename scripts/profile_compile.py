"""Profile XLA compile time of each NR-iteration sub-program at (6e,6o).

Run on the real TPU (default platform) WITHOUT the persistent compilation
cache, so each number is a true cold compile.  Identifies which part of
the fused NR program is responsible for the 850 s cold compile seen in
round 1 (BENCH_r01.json extra.compile_s_6e6o).
"""

import sys
import time

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed_compile(name, fn, *args):
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    t0 = time.time()
    lowered = jitted.lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    log(f"{name:28s} lower {t1 - t0:8.2f}s   compile {t2 - t1:8.2f}s")
    return compiled


def main():
    from auto_oo_tpu import Moldata, get_formal_geo
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc
    from auto_oo_tpu.utils.newton_raphson import damped_newton_step_pure

    ncas, nelecas, n_layers = 6, 6, 2
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    pqc = Parameterized_circuit(ncas, nelecas, ansatz="np_fabric",
                                n_layers=n_layers)
    oo = OO_pqc(pqc, mol, ncas, nelecas, freeze_active=True)
    theta = pqc.init_zeros()
    oao = oo.oao_mo_coeff
    kappa0 = jnp.zeros(oo.n_kappa)
    log(f"n_theta={pqc.theta_shape} n_kappa={oo.n_kappa} "
        f"platform={jax.devices()[0].platform}")

    e = oo._energy_pure
    og = oo._orbital_gradient_pure

    timed_compile("rdms", pqc._rdms_impl, theta)
    timed_compile("energy", e, theta, kappa0, oao)
    timed_compile("grad_theta", jax.grad(e, argnums=0), theta, kappa0, oao)
    timed_compile("grad_kappa", jax.grad(e, argnums=1), theta, kappa0, oao)
    timed_compile("orb_grad", og, theta, oao)
    timed_compile("hess_cc", jax.jacfwd(jax.grad(e, argnums=0), argnums=0),
                  theta, kappa0, oao)
    timed_compile("hess_oc", jax.jacfwd(og, argnums=0), theta, oao)

    def hess_oo_part(theta, oao):
        from auto_oo_tpu.ops import transforms as _tr
        from auto_oo_tpu.ops import fock as _fock
        one_rdm, two_rdm = pqc._rdms_impl(theta)
        mo = oo.oao_coeff @ oao
        h1 = _tr.int1e_transform(oo.int1e_ao, mo)
        g2 = _tr.int2e_transform(oo.int2e_ao, mo)
        hess4 = oo.analytic_hessian_from_integrals(h1, g2, one_rdm, two_rdm)
        return _fock.full_hessian_to_matrix(hess4, oo.params_idx, oo.nao)

    timed_compile("hess_oo", hess_oo_part, theta, oao)
    timed_compile("grad_hess (all blocks)", oo._grad_hess_jit, theta, oao)

    nt = pqc.theta_shape
    ng = nt + oo.n_kappa

    def line_search_only(theta, oao, grad, hess):
        def objective(flat):
            return e(flat[:nt], flat[nt:], oao)
        flat0 = jnp.concatenate([theta, jnp.zeros(oo.n_kappa)])
        new_flat, lowest, t, e_t = damped_newton_step_pure(
            objective, flat0, grad, hess)
        return new_flat, lowest

    timed_compile("newton+linesearch", line_search_only, theta, oao,
                  jnp.zeros(ng), jnp.eye(ng))

    timed_compile("FULL nr_iteration", oo._nr_iteration_jit,
                  theta, oao, 1e-4, 0.5, 1e-6, 1.1, 1e-6)


if __name__ == "__main__":
    main()
