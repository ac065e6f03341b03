"""Tutorial: scaling OO-VQE over a TPU device mesh.

The reference framework was strictly single-device; this is the new
capability layer.  Three parallel axes are demonstrated:

1. Hessian-column ("tp") sharding of the damped-Newton step — the
   dominant per-iteration cost at larger parameter counts;
2. statevector + ERI-transform sharding — the memory-scaling axes
   (4^ncas and nao^4);
3. geometry batching ("dp") — PES scans / Berry-phase loops evaluate the
   same functional over many molecules at once;
4. the ROW-SHARDED string-grid sector engine — the (Na, Nb) determinant
   grid partitioned over alpha-string rows (distributed FCI-style), the
   axis that scales past single-chip HBM ((16e,16o): one (n2, D) Phi is
   339 GB f64).

Runs anywhere: on a real TPU slice the mesh spans the chips (call
`initialize_distributed()` first on multi-host pods); on CPU set
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
to get a virtual 8-device mesh (exactly what tests/conftest.py does).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

# default to the virtual CPU mesh unless the caller explicitly targets
# TPU hardware (ON_TPU=1); querying the backend here would initialize it
# before the platform/flag overrides could take effect
_ON_TPU = os.environ.get("ON_TPU", "") == "1"
if not _ON_TPU:
    if "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8")

import numpy as np
import jax

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from auto_oo_tpu import Moldata, get_formal_geo
from auto_oo_tpu.models import Parameterized_circuit, OO_pqc
from auto_oo_tpu.parallel import (initialize_distributed, make_mesh,
                                  sharded_nr_step_fn, sharded_energy_fn,
                                  GeometryBatch)


def main():
    initialize_distributed()  # no-op single-process; required on pods
    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}")
    mesh = make_mesh(shape=(1, n_dev), names=("dp", "tp"))

    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    pqc = Parameterized_circuit(2, 2, ansatz="np_fabric", n_layers=1)
    oo = OO_pqc(pqc, mol, 2, 2, freeze_active=True)

    # --- 1. sharded Newton-Raphson optimization --------------------------
    step = sharded_nr_step_fn(oo, mesh, axis="tp")
    theta = pqc.init_zeros()
    oao = oo.oao_mo_coeff
    print("sharded NR optimization:")
    e_prev = np.inf
    for it in range(15):
        theta, kappa, oao, energy, lowest = step(theta, oao)
        e = float(energy)
        print(f"  iter {it:2d}  E = {e:.10f}")
        if abs(e - e_prev) < 1e-10:
            break
        e_prev = e

    # --- 2. fully sharded forward pass ------------------------------------
    e_fn = sharded_energy_fn(oo, mesh, sv_axis="tp", eri_axis="tp")
    e_sh = float(e_fn(theta, jnp.zeros(oo.n_kappa), oao))
    print(f"sharded statevector+ERI energy: {e_sh:.10f}")

    # --- 3. geometry batch over the dp axis --------------------------------
    geos = [get_formal_geo(a, p) for a, p in
            [(140, 80), (135, 85), (130, 90), (125, 95)]]
    mols = [Moldata(g, "sto-3g") for g in geos]
    mesh2 = make_mesh(shape=(4, n_dev // 4), names=("dp", "tp")) \
        if n_dev >= 4 else make_mesh(shape=(1, n_dev), names=("dp", "tp"))
    batch = GeometryBatch(mols, 2, 2, pqc, mesh=mesh2, axis="dp")
    n = len(mols)
    thetas = jnp.tile(theta, (n, 1))
    kappas = jnp.zeros((n, batch.oo0.n_kappa))
    oaos = jnp.stack([m.oao_mo_coeff for m in batch.oo_list])
    energies = batch.energies(thetas, kappas, oaos)
    print("geometry batch energies:",
          np.round(np.asarray(energies), 8))

    # --- 4. row-sharded string-grid sector engine ---------------------------
    from auto_oo_tpu.parallel import row_sharded_gradient_optimization

    pqc_s = Parameterized_circuit(4, 4, ansatz="np_fabric", n_layers=4,
                                  sector=True)
    oo_s = OO_pqc(pqc_s, mol, 4, 4)
    e_l, theta_s = row_sharded_gradient_optimization(
        oo_s, mesh, max_iterations=25, learning_rate=0.05,
        orbital_every=10, verbose=0)
    print(f"row-sharded first-order OO-VQE: {len(e_l)} iters, "
          f"E = {e_l[-1]:.10f} (every large-D stage on the mesh)")

    # --- 5. 2D (tangent x row) sharded SECOND-ORDER engine ------------------
    # composes both scaling axes on one mesh: device (i, j) holds
    # tangent rows i of the Jacobian restricted to alpha-string rows j —
    # the Hessian regime beyond what either axis reaches alone
    from auto_oo_tpu.parallel import grid2d_nr_fns

    mesh3 = (make_mesh(shape=(2, n_dev // 2), names=("tp", "row"))
             if n_dev >= 4 else make_mesh(shape=(1, n_dev),
                                          names=("tp", "row")))
    oo_2d = OO_pqc(pqc_s, mol, 4, 4, freeze_active=True)
    eng = grid2d_nr_fns(oo_2d, mesh3, t_axis="tp", r_axis="row")
    th = pqc_s.init_zeros()
    oao2 = oo_2d.oao_mo_coeff
    for it in range(4):
        th, _, oao2, e, lowest = eng["nr_step"](th, oao2)
        print(f"  grid2d NR iter {it}  E = {float(e):.10f}  "
              f"lowest eig = {float(lowest):.3e}")


if __name__ == "__main__":
    main()
