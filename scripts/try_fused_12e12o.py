"""Experiment: does the FUSED grad+Hessian program beat the staged
pipeline at (12e,12o) now that the string-grid kernels removed the
gather-bound buffers?  (Round 3 measured the fused program spilling via
compressed remat at this scale with the flat kernels.)

Run: python scripts/try_fused_12e12o.py [precision]
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    precision = sys.argv[1] if len(sys.argv) > 1 else "mixed"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from auto_oo_tpu import Moldata, get_formal_geo
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc

    t0 = time.time()
    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    pqc = Parameterized_circuit(12, 12, ansatz="np_fabric", n_layers=1,
                                sector=True)
    oo = OO_pqc(pqc, mol, 12, 12, freeze_active=True, precision=precision)
    theta = pqc.init_zeros()
    print(f"setup {time.time()-t0:.1f}s", flush=True)

    core = oo._core
    t0 = time.time()
    out = core["grad_hess_fused_jit"](theta, oo.oao_mo_coeff,
                                      *oo._mol_args)
    jax.block_until_ready(out)
    print(f"fused grad_hess compile+1st: {time.time()-t0:.1f}s",
          flush=True)
    for i in range(3):
        t0 = time.time()
        out = core["grad_hess_fused_jit"](theta, oo.oao_mo_coeff,
                                          *oo._mol_args)
        jax.block_until_ready(out)
        print(f"fused grad_hess iter {i}: {time.time()-t0:.2f}s",
              flush=True)
    # staged comparison (already cached from the bench runs)
    for i in range(3):
        t0 = time.time()
        o2 = core["grad_hess_staged"](theta, oo.oao_mo_coeff,
                                      *oo._mol_args)
        jax.block_until_ready(o2)
        print(f"staged grad_hess iter {i}: {time.time()-t0:.2f}s",
              flush=True)
    import numpy as np
    de = abs(float(out[0]) - float(o2[0]))
    dg = float(np.max(np.abs(np.asarray(out[1]) - np.asarray(o2[1]))))
    dh = float(np.max(np.abs(np.asarray(out[2]) - np.asarray(o2[2]))))
    print(f"fused vs staged: dE={de:.2e} dgrad={dg:.2e} dhess={dh:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
