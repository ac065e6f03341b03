"""(16e,16o) on ONE chip: full-valence H16 chain, D = C(16,8)^2 = 165.6M.

One f64 statevector is 1.325 GB; a single (n2, D) Phi would be 339 GB.
Everything here rides the string-grid stack built for (14e,14o) — direct
grid gate construction, pair/row-streamed kernels, adjoint (reversible)
VJP — plus the grid-native S^2 (ops/grid.sminus_grid_maps; the flat
cross-sector tables would be ~10 GB host at this scale).

Stages (argv 2, comma-separated, default "state,rdms,s2,energy"):
  state   — circuit state build + norm
  rdms    — chunked restricted RDMs + trace / sum-rule invariants
  s2      — spin purity via the string-factorized S^- maps
  energy  — variational E(0) vs RHF through the OO_pqc energy program
  grad    — energy + full circuit gradient (adjoint VJP)
  gradmixed — same through precision="mixed": the hosted pass runs on
          an f32 state (half of the 339 GB gather/scatter budget), RDM
          accumulators stay f64, the VJP backward stays f64
  adam    — 2 Adam steps of gradient-only OO-VQE
  adammixed — the same Adam steps through precision="mixed" (the f32
          hosted pass of gradmixed driving the whole loop)
  nr / nrmixed — full SECOND-ORDER damped-Newton iterations (E +
          gradient + full theta-Hessian + augmented solve + Armijo)
          through the hosted quadratic-form engine
          (models/oo_pqc.grad_hess_hosted: pair-jvp tangent columns,
          per-tangent hosted H-apply passes, pair-adjoint cc rows)

Run: python scripts/demo_16e16o.py [n_layers] [stages]
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    stages = (sys.argv[2] if len(sys.argv) > 2
              else "state,rdms,s2,energy").split(",")
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from auto_oo_tpu import Moldata
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc

    ncas = nelecas = 16
    geom = "; ".join(f"H 0 0 {0.9 * i:.2f}" for i in range(16))

    t0 = time.time()
    mol = Moldata(geom, "sto-3g")
    mol.run_rhf()
    print(f"H16 chain RHF: {mol.hf.e_tot:.8f} Ha "
          f"({time.time() - t0:.1f}s, nao={mol.nao})", flush=True)

    t0 = time.time()
    pqc = Parameterized_circuit(ncas, nelecas, ansatz="np_fabric",
                                n_layers=n_layers, sector=True)
    print(f"circuit setup: {time.time() - t0:.1f}s "
          f"(D={pqc.state_dim:,}, n_theta={pqc.theta_shape}, "
          f"gates={len(pqc.grid_program.gates)})", flush=True)
    assert pqc._program is None, "flat tables must never be built here"

    theta = 0.02 * jnp.arange(pqc.theta_shape, dtype=jnp.float64)
    nrm = None

    if "state" in stages:
        t0 = time.time()
        psi = pqc.state(theta)
        jax.device_get(psi[:1])
        print(f"state build (compile+1st): {time.time() - t0:.1f}s",
              flush=True)
        t0 = time.time()
        psi = pqc.state(theta)
        jax.device_get(psi[:1])
        # multiply+reduce, never a raw D-dot: the f64 dot emulation
        # expands both operands ~8x in f32 (~10.6 GB here) — OOM
        nrm = float(jnp.sum(jnp.square(psi)))
        print(f"state build warm: {time.time() - t0:.2f}s  |psi|^2 = "
              f"{nrm:.12f}", flush=True)
        assert abs(nrm - 1.0) < 1e-10
        del psi

    if "rdms" in stages:
        t0 = time.time()
        g1, G2 = pqc.get_rdms(theta)
        jax.device_get(g1[0, :1])
        print(f"RDMs (compile+1st): {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        g1, G2 = pqc.get_rdms(theta)
        jax.device_get(g1[0, :1])
        t_rdm = time.time() - t0
        tr = float(jnp.trace(g1))
        part = jnp.einsum("pqrr->pq", G2)
        sum_err = float(jnp.max(jnp.abs(part - (nelecas - 1) * g1)))
        print(f"RDMs warm: {t_rdm:.2f}s  tr gamma = {tr:.10f}  "
              f"sum-rule err = {sum_err:.1e}", flush=True)
        assert abs(tr - nelecas) < 1e-8 and sum_err < 1e-8

    if "s2" in stages:
        t0 = time.time()
        s2 = float(pqc.s2_expectation(theta))
        print(f"<S^2> = {s2:.2e} ({time.time() - t0:.1f}s incl. "
              f"grid S^- map build)", flush=True)
        assert abs(s2) < 1e-8

    oo = None
    if {"energy", "grad", "adam"} & set(stages):
        oo = OO_pqc(pqc, mol, ncas, nelecas, freeze_active=True)

    if "energy" in stages:
        t0 = time.time()
        e = float(oo.energy_from_parameters(theta))
        print(f"E(theta) = {e:.8f} Ha (compile+1st "
              f"{time.time() - t0:.1f}s)", flush=True)
        t0 = time.time()
        e0 = float(oo.energy_from_parameters(pqc.init_zeros()))
        print(f"E(0) = {e0:.8f} Ha (warm {time.time() - t0:.2f}s) — "
              f"HF determinant in the active space", flush=True)
        assert abs(e0 - mol.hf.e_tot) < 1e-6, (e0, mol.hf.e_tot)

    if "grad" in stages:
        t0 = time.time()
        e_g, grad, _ = oo.energy_and_gradient(theta)
        jax.device_get(grad[:1])
        print(f"energy+gradient (compile+1st): {time.time() - t0:.1f}s  "
              f"|grad| = {float(jnp.linalg.norm(grad)):.3e}", flush=True)
        t0 = time.time()
        e_g, grad, _ = oo.energy_and_gradient(theta)
        jax.device_get(grad[:1])
        print(f"energy+gradient warm: {time.time() - t0:.2f}s", flush=True)

    if "gradmixed" in stages:
        oomx = OO_pqc(pqc, mol, ncas, nelecas, freeze_active=True,
                      precision="mixed")
        t0 = time.time()
        e_m, grad_m, _ = oomx.energy_and_gradient(theta)
        jax.device_get(grad_m[:1])
        print(f"energy+gradient MIXED (compile+1st): "
              f"{time.time() - t0:.1f}s  "
              f"|grad| = {float(jnp.linalg.norm(grad_m)):.6e}  "
              f"E = {float(e_m):.8f}", flush=True)
        t0 = time.time()
        e_m, grad_m, _ = oomx.energy_and_gradient(theta)
        jax.device_get(grad_m[:1])
        print(f"energy+gradient MIXED warm: {time.time() - t0:.2f}s",
              flush=True)

    if "adam" in stages:
        t0 = time.time()
        energy_l, _ = oo.gradient_optimization(
            pqc.init_zeros(), max_iterations=2, learning_rate=0.05,
            orbital_every=0, verbose=1)
        print(f"2 Adam steps: {time.time() - t0:.1f}s  "
              f"dE = {energy_l[-1] - energy_l[0]:+.2e} Ha", flush=True)
        assert energy_l[-1] <= energy_l[0] + 1e-10

    if "adammixed" in stages:
        oomx2 = OO_pqc(pqc, mol, ncas, nelecas, freeze_active=True,
                       precision="mixed")
        t0 = time.time()
        energy_l, _ = oomx2.gradient_optimization(
            pqc.init_zeros(), max_iterations=3, learning_rate=0.05,
            orbital_every=0, verbose=1)
        n = len(energy_l)
        print(f"{n} MIXED Adam steps: {time.time() - t0:.1f}s "
              f"({(time.time() - t0) / n:.1f}s/step)  "
              f"dE = {energy_l[-1] - energy_l[0]:+.2e} Ha", flush=True)
        # mixed energies carry ~1e-6-level noise; descent must dominate
        assert energy_l[-1] <= energy_l[0] + 1e-5
        # E(0) through the mixed pass == RHF to f32 accuracy (the HF
        # determinant is the theta=0 fabric state)
        assert abs(energy_l[0] - mol.hf.e_tot) < 1e-4, (
            energy_l[0], mol.hf.e_tot)
    for prec in [p for s, p in (("nr", "f64"), ("nrmixed", "mixed"))
                 if s in stages]:
        oonr = OO_pqc(pqc, mol, ncas, nelecas, freeze_active=True,
                      precision=prec)
        th, oao = theta, oonr.oao_mo_coeff
        es = []
        t0 = time.time()
        th, kp, oao, e, low = oonr._nr_iteration_jit(
            th, oao, 1e-4, 0.5, 1e-6, 1.1, 1e-6)
        es.append(float(e))
        print(f"NR iter 1 ({prec}, incl. compiles): "
              f"{time.time() - t0:.1f}s  E = {es[-1]:.10f}  "
              f"lam0 = {float(low):.3e}", flush=True)
        for i in range(2):
            t0 = time.time()
            th, kp, oao, e, low = oonr._nr_iteration_jit(
                th, oao, 1e-4, 0.5, 1e-6, 1.1, 1e-6)
            es.append(float(e))
            print(f"NR iter {i + 2} warm: {time.time() - t0:.1f}s  "
                  f"E = {es[-1]:.10f}", flush=True)
        # descent must dominate (mixed energies carry ~1e-6-rel noise)
        assert es[-1] <= es[0] + 1e-5, es
    print("DEMO OK", flush=True)


if __name__ == "__main__":
    main()
