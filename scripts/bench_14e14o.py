"""On-demand (14e,14o) SECOND-ORDER benchmark — D = C(14,7)^2 = 11.78M.

The full quadratic-form Newton iteration at this scale runs through the
staged pipeline with STREAMED per-tangent rows (models/oo_pqc.py
_row_streamed): a full (n2, D) Phi is 18.5 GB f64 and cannot
materialize, so each tangent's Hamiltonian-apply row streams its own
Phi pair-blocked (ops/grid.ham_apply_rows) and its transition-RDM row
streams both Phis over grid A-rows (ops/grid.transition_rdms_rows) —
exactness pinned against the fused-phi pipeline at small D by
tests/test_oo_pqc.py::test_streamed_rows_equal_fused.

H14 chain full-valence, ansatz np_fabric L=1 (n_theta = 14 after the
GateFabric half-filled fix), freeze_active (full-valence: n_kappa = 0,
the Hessian is the theta block).  The reference architecture cannot
represent this scale at all (2^28 amplitudes through Python sparse
loops); this is the first full Newton-Raphson step of an OO-VQE at
(14e,14o) on one chip.

Run: python scripts/bench_14e14o.py [n_iters] [precision]
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
    from auto_oo_tpu import Moldata
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc

    geom = "; ".join(f"H 0 0 {0.9 * i:.2f}" for i in range(14))
    t0 = time.time()
    mol = Moldata(geom, "sto-3g")
    pqc = Parameterized_circuit(14, 14, ansatz="np_fabric", n_layers=1,
                                sector=True)
    oo = OO_pqc(pqc, mol, 14, 14, freeze_active=True,
                precision=precision)
    theta = pqc.init_zeros()
    print(f"setup: {time.time() - t0:.1f}s (n_theta={pqc.theta_shape}, "
          f"n_kappa={oo.n_kappa}, D={pqc.state_dim:,}, "
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
