"""OO-VQE end-to-end tutorial (script form of the reference's
Tutorial_auto_oo.ipynb workflow).

1. Build formaldimine and an active space.
2. Define a GateFabric PQC and the hybrid OO-PQC cost.
3. Run full Newton-Raphson optimization of (theta, kappa).
4. Compare against the in-repo CASSCF oracle.
5. Bonus: CASCI-style circuit-only optimization against the fixed-MO
   Hamiltonian (the reference did this with a PennyLane Hamiltonian
   expectation + torch Adam; here: the sparse CAS Hamiltonian + optax).

Run: python examples/tutorial_oo_vqe.py [--platform cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None,
                    help="jax platform override, e.g. cpu")
args = parser.parse_args()

import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)

import jax.numpy as jnp
import numpy as np

import auto_oo_tpu as aoo
from auto_oo_tpu.models import (Parameterized_circuit, OO_pqc,
                                fermionic_cas_hamiltonian)

# 1. molecule + active space -------------------------------------------------
geometry = aoo.get_formal_geo(140, 80)
mol = aoo.Moldata(geometry, "sto-3g")
ncas, nelecas = 3, 4
print(f"formaldimine sto-3g: nao={mol.nao}, active ({nelecas}e,{ncas}o)")

# 2. PQC + OO-PQC cost -------------------------------------------------------
pqc = Parameterized_circuit(ncas, nelecas, ansatz="np_fabric", n_layers=2)
oo_pqc = OO_pqc(pqc, mol, ncas, nelecas, freeze_active=True)
theta = pqc.init_zeros()
print(f"n_theta = {pqc.theta_shape}, n_kappa = {oo_pqc.n_kappa}")
print(f"E(theta=0) = {float(oo_pqc.energy_from_parameters(theta)):.10f}")

# 3. full Newton-Raphson optimization ---------------------------------------
energy_l, theta_l, kappa_l, oao_l, hess_eig_l = oo_pqc.full_optimization(
    theta, conv_tol=1e-10, verbose=1)

# 4. compare to CASSCF -------------------------------------------------------
mol.run_casscf(ncas, nelecas)
print(f"\nOO-VQE energy  = {energy_l[-1]:.10f}")
print(f"CASSCF energy  = {mol.casscf.e_tot:.10f}")
print(f"difference     = {energy_l[-1] - mol.casscf.e_tot:.2e} Ha")
print(f"lowest Hessian eigenvalue at minimum: {hess_eig_l[-1]:.3e}")

# 5. circuit-only (CASCI-style) optimization --------------------------------
# Hamiltonian at the (un-relaxed) RHF orbitals, so the comparison point
# is the plain CASCI oracle.  The GateFabric circuit conserves N and S_z
# but not S^2, so its variational floor is the lowest Sz=0 state of ANY
# spin — compare against the spin-unprojected CASCI root.
import optax

mol.run_rhf()
c0, c1, c2 = (np.asarray(x) for x in oo_pqc.get_active_integrals(
    jnp.asarray(mol.hf.mo_coeff)))
H = fermionic_cas_hamiltonian(c0, c1, c2).toarray()
H = jnp.asarray(H)


def casci_energy(th):
    psi = pqc._state_impl(th)
    return psi @ (H @ psi)


opt = optax.adam(5e-2)
th = pqc.init_zeros()
state = opt.init(th)
val_grad = jax.jit(jax.value_and_grad(casci_energy))
for i in range(300):
    e, g = val_grad(th)
    updates, state = opt.update(g, state)
    th = optax.apply_updates(th, updates)
mol.run_casci(ncas, nelecas, fix_singlet=0)
print(f"\ncircuit-only (Adam) energy  = {float(e):.10f}")
print(f"CASCI (any spin) reference  = {mol.casci.e_tot:.10f}")
