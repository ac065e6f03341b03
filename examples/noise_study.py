"""Shot-noise robustness study of the damped-Newton OO-VQE optimizer.

The reference's Noisy_OO_pqc was BUILT for this study (its docstring
intent, reference noisy_oo_pqc.py:21) but crashed when used and had no
tests; here the study is a runnable script: for each noise variance
(modelling finite measurement shots: var ~ 1/N_shots), several seeds of
`full_noisy_optimization` are run and the robustness curve is printed —
fraction of seeds reaching the CASSCF basin, median/worst final error,
median iterations to enter the basin.

Run:  python examples/noise_study.py        (~5 min on CPU)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from auto_oo_tpu import Moldata, get_formal_geo
from auto_oo_tpu.models import Parameterized_circuit, Noisy_OO_pqc

VARIANCES = [1e-8, 1e-6, 1e-5, 1e-4, 1e-3]
SEEDS = range(5)
MAX_ITER = 30


def main():
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    mol.run_casscf(2, 2)
    e_ref = mol.casscf.e_tot
    print(f"CASSCF reference energy: {e_ref:.10f}", file=sys.stderr)
    pqc = Parameterized_circuit(2, 2, ansatz="np_fabric", n_layers=1)

    for var in VARIANCES:
        basin_tol = max(50 * np.sqrt(var), 1e-6)
        errs, iters_to_basin = [], []
        for seed in SEEDS:
            noisy = Noisy_OO_pqc(pqc, mol, 2, 2, freeze_active=True,
                                 seed=seed)
            energy_l, *_ = noisy.full_noisy_optimization(
                pqc.init_zeros(), variance=var,
                max_iterations=MAX_ITER, conv_tol=0.0)
            err = np.abs(np.array(energy_l) - e_ref)
            errs.append(err.min())
            inside = np.nonzero(err < basin_tol)[0]
            iters_to_basin.append(int(inside[0]) + 1 if inside.size
                                  else None)
        reached = [i for i in iters_to_basin if i is not None]
        print(json.dumps({
            "variance": var,
            "basin_tol_ha": basin_tol,
            "fraction_in_basin": len(reached) / len(errs),
            "median_best_error_ha": float(np.median(errs)),
            "worst_best_error_ha": float(np.max(errs)),
            "median_iters_to_basin": (float(np.median(reached))
                                      if reached else None),
        }))


if __name__ == "__main__":
    main()
