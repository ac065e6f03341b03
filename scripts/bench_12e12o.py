"""On-demand (12e,12o) sector benchmark — D = C(12,6)^2 = 853,776.

This scale runs through the STAGED large-D Newton pipeline
(models/oo_pqc.py grad_hess_staged + newton_update_staged: separate
modest-peak XLA programs, because one fused program forces XLA into
compressed-remat spilling that inflates an iteration ~20x until the
device runtime gives up).  One-time compiles of the ~12 stage programs
cost ~15-20 min through the remote compile service; warm iterations are
minutes.  Not part of bench.py's driver run for that reason — results
are recorded in BASELINE.md.

Run: python scripts/bench_12e12o.py [n_iters] [precision]
(precision: 'f64' (default) or 'mixed' — f32 Hessian stages on the MXU)
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    precision = sys.argv[2] if len(sys.argv) > 2 else "f64"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from auto_oo_tpu import Moldata, get_formal_geo
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc

    t0 = time.time()
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    pqc = Parameterized_circuit(12, 12, ansatz="np_fabric", n_layers=1,
                                sector=True)
    oo = OO_pqc(pqc, mol, 12, 12, freeze_active=True,
                precision=precision)
    theta = pqc.init_zeros()
    print(f"setup: {time.time() - t0:.1f}s (n_theta={pqc.theta_shape}, "
          f"n_kappa={oo.n_kappa}, D={pqc.state_dim}, "
          f"precision={precision})", flush=True)
    times = []
    for it in range(n_iters):
        t0 = time.time()
        out = oo._nr_iteration_jit(theta, oo.oao_mo_coeff, 1e-4, 0.5,
                                   1e-6, 1.1, 1e-6)
        out[3].block_until_ready()
        times.append(time.time() - t0)
        print(f"iter {it}: {times[-1]:.1f}s  E={float(out[3]):.10f}",
              flush=True)
        theta, oo.oao_mo_coeff = out[0], out[2]
    if len(times) > 1:
        print(f"warm s/NR-iter: {times[-1]:.1f}")


if __name__ == "__main__":
    main()
