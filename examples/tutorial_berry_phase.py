"""Berry phase around the formaldimine conical intersection (script form
of the reference's Tutorial_Berry_phase.ipynb, using the library-level
BerryPhaseLoop API instead of notebook glue).

Run: python examples/tutorial_berry_phase.py [--platform cpu] [--points 10]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None)
parser.add_argument("--points", type=int, default=10)
args = parser.parse_args()

import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)

import numpy as np

import auto_oo_tpu as aoo
from auto_oo_tpu.models import Parameterized_circuit, BerryPhaseLoop


def get_alpha_phi(t, origin, radius, phase):
    return (origin[0] + radius[0] * np.cos(2 * np.pi * t + phase),
            origin[1] + radius[1] * np.sin(2 * np.pi * t + phase))


# loop around the conical intersection (red loop of the tutorial)
origin, radius, phase = (130.0, 89.9), (10.0, 10.0), np.pi / 20
ts = np.linspace(0, 1, args.points)
geometries = [aoo.get_formal_geo(*get_alpha_phi(t, origin, radius, phase))
              for t in ts]

ncas, nelecas = 2, 2
pqc = Parameterized_circuit(ncas, nelecas, ansatz="np_fabric", n_layers=1)

loop = BerryPhaseLoop(geometries, "sto-3g", ncas, nelecas, pqc,
                      freeze_active=True, run_casscf=True)
loop.run(conv_tol=1e-10, verbose=1)

print("\nenergies along the loop (single-NR-step tracking vs CASSCF):")
for i, (e, e_ref) in enumerate(zip(loop.energy_l, loop.casscf_energy_l)):
    print(f"  t={ts[i]:.3f}  E={e:.8f}  CASSCF={e_ref:.8f}")

ov = loop.overlaps()
print("\nsuccessive overlaps <psi_{i+1}|G|psi_i>:")
for i, o in enumerate(ov):
    print(f"  {i}->{(i + 1) % len(ov)}: {o.real:+.6f}")
print(f"\nfinal overlap: {ov[-1].real:+.6f}  (≈ -1 at a conical "
      "intersection)")
print(f"Berry phase: {loop.berry_phase():+.6f}  (±pi expected)")
print("lowest Hessian eigenvalues:", np.round(loop.hess_eig_l, 6))
