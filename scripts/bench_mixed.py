"""On-chip f64 vs mixed-precision NR-iteration comparison.

Measures warm per-iteration wall-clock of both precision modes on the
same problem tiers and verifies the energy trajectories agree.  Run on
the real TPU: `python scripts/bench_mixed.py`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", ".jax_cache")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run(ncas, nelecas, n_layers, precision, n_iters=5, sector=False,
        basis="sto-3g"):
    from auto_oo_tpu import Moldata, get_formal_geo
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc

    mol = Moldata(get_formal_geo(140, 80), basis)
    pqc = Parameterized_circuit(ncas, nelecas, ansatz="np_fabric",
                                n_layers=n_layers, sector=sector)
    oo = OO_pqc(pqc, mol, ncas, nelecas, freeze_active=True,
                precision=precision)
    theta = pqc.init_zeros()
    t0 = time.time()
    out = oo._nr_iteration_jit(theta, oo.oao_mo_coeff, 1e-4, 0.5, 1e-6,
                               1.1, 1e-6)
    out[3].block_until_ready()
    compile_s = time.time() - t0
    th, oao = out[0], out[2]
    times, energies = [], [float(out[3])]
    for i in range(n_iters):
        t0 = time.time()
        th, kp, oao, energy, low = oo._nr_iteration_jit(
            th, oao, 1e-4, 0.5, 1e-6, 1.1, 1e-6)
        energy.block_until_ready()
        times.append(time.time() - t0)
        energies.append(float(energy))
    med = float(np.median(times))
    log(f"  {precision}: compile {compile_s:.1f}s, median iter {med:.4f}s"
        f"  E_last={energies[-1]:.10f}")
    return med, energies, compile_s


def main():
    os.makedirs(_CACHE, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    jax.jit(lambda x: x + 1.0)(jnp.zeros(8)).block_until_ready()

    tiers = [
        ("6e6o", 6, 6, 2, False, "sto-3g", 5),
        ("8e8o_sector", 8, 8, 2, True, "sto-3g", 5),
        ("10e10o_sector", 10, 10, 2, True, "sto-3g", 3),
    ]
    for label, ncas, ne, L, sector, basis, n in tiers:
        log(f"tier {label}:")
        m64, e64, _ = run(ncas, ne, L, "f64", n_iters=n, sector=sector,
                          basis=basis)
        mmx, emx, _ = run(ncas, ne, L, "mixed", n_iters=n, sector=sector,
                          basis=basis)
        dev = max(abs(a - b) for a, b in zip(e64, emx))
        log(f"  -> speedup {m64 / mmx:.2f}x, max traj energy dev {dev:.2e}")
        print(f"{label}: f64 {m64:.4f}s mixed {mmx:.4f}s "
              f"speedup {m64 / mmx:.2f}x dev {dev:.2e}", flush=True)


if __name__ == "__main__":
    main()
