"""Benchmark: wall-clock per Newton-Raphson iteration (E + gradient + full
Hessian + damped step) for formaldimine OO-PQC — the BASELINE.json metric.

Runs on whatever jax platform the environment provides (the real TPU chip
under the driver).  Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "s", "vs_baseline": ...}

The reference publishes no numbers (BASELINE.md); the driver-set target is
< 1 s per NR iteration (formaldimine (3e,3o), TPU v5e) — `vs_baseline` is
reported as target_seconds / measured_seconds against that 1 s target for
the headline (6e,6o) configuration, so > 1.0 beats the target.
"""

import json
import sys
import time

import numpy as np


def time_nr_iters(ncas, nelecas, n_layers, n_iters=6):
    import jax.numpy as jnp

    from auto_oo_tpu import Moldata, get_formal_geo
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc

    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    pqc = Parameterized_circuit(ncas, nelecas, ansatz="np_fabric",
                                n_layers=n_layers)
    oo = OO_pqc(pqc, mol, ncas, nelecas, freeze_active=True)
    theta = pqc.init_zeros()

    # compile (excluded from the metric, reported separately)
    t0 = time.time()
    out = oo._nr_iteration_jit(theta, oo.oao_mo_coeff, 1e-4, 0.5, 1e-6,
                               1.1, 1e-6)
    out[3].block_until_ready()
    compile_s = time.time() - t0

    times = []
    th, oao = out[0], out[2]
    for _ in range(n_iters):
        t0 = time.time()
        th, kp, oao, energy, low = oo._nr_iteration_jit(
            th, oao, 1e-4, 0.5, 1e-6, 1.1, 1e-6)
        energy.block_until_ready()
        times.append(time.time() - t0)
    return float(np.median(times)), compile_s, float(energy)


def main():
    value, compile_s, energy = time_nr_iters(6, 6, 2)
    v33, c33, e33 = time_nr_iters(3, 4, 1)  # (4e,3o): the reference demo active space
    target_s = 1.0
    print(json.dumps({
        "metric": "nr_iter_wall_s_formaldimine_6e6o_sto3g",
        "value": round(value, 6),
        "unit": "s",
        "vs_baseline": round(target_s / value, 3),
        "extra": {
            "compile_s_6e6o": round(compile_s, 2),
            "energy_6e6o": energy,
            "nr_iter_wall_s_4e3o": round(v33, 6),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
