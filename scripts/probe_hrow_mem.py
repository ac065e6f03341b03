"""AOT memory probe for the (14e,14o) f64 Hamiltonian-apply program.

Compiles (never runs) the hrow stage at the demo's shapes and prints the
compiler's HBM accounting — the cheap way to validate pair-block sizing
changes without paying the full demo.

Run: python scripts/probe_hrow_mem.py [ncas]
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main():
    ncas = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_ROOT, ".jax_cache"))
    import jax.numpy as jnp
    from auto_oo_tpu.models import Parameterized_circuit
    from auto_oo_tpu.ops.hamiltonian import ham_apply

    t0 = time.time()
    pqc = Parameterized_circuit(ncas, ncas, ansatz="np_fabric",
                                n_layers=1, sector=True)
    gm = pqc.sector_maps
    print(f"setup {time.time() - t0:.1f}s D={pqc.state_dim:,}", flush=True)

    n2 = ncas * ncas
    c1eff = jnp.zeros((ncas, ncas), jnp.float64)
    c2 = jnp.zeros((n2, n2), jnp.float64)
    x = jnp.zeros((pqc.state_dim,), jnp.float64)

    def hrow(c1, C2, v):
        return ham_apply(c1, C2, v, ncas, maps=gm)

    t0 = time.time()
    lowered = jax.jit(hrow).lower(c1eff, c2, x)
    compiled = lowered.compile()
    print(f"compile {time.time() - t0:.1f}s", flush=True)
    ma = compiled.memory_analysis()
    if ma is not None:
        gb = 1 << 30
        print(f"temp={ma.temp_size_in_bytes / gb:.2f}G "
              f"arg={ma.argument_size_in_bytes / gb:.2f}G "
              f"out={ma.output_size_in_bytes / gb:.2f}G")
    print("PROBE OK", flush=True)


if __name__ == "__main__":
    main()
