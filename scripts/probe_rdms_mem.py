"""AOT memory probe for the sector RDM program at (ncas e, ncas o).

Compiles (never runs) the exact program the demo's `pqc.get_rdms` would
dispatch — circuit state build + grid rdms_rows — and prints the
compiler's HBM accounting, the cheap way to localize a device OOM /
worker crash at (16e,16o) scale (D = 165.6M) without paying execution.

Run: python scripts/probe_rdms_mem.py [ncas] [stage]
  stage: rdms (default, state+rdms fused as get_rdms dispatches it),
         rdmsonly (rdms_from_state on an input vector), state
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main():
    ncas = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    stage = sys.argv[2] if len(sys.argv) > 2 else "rdms"
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_ROOT, ".jax_cache"))
    import jax.numpy as jnp
    from auto_oo_tpu.models import Parameterized_circuit

    t0 = time.time()
    pqc = Parameterized_circuit(ncas, ncas, ansatz="np_fabric",
                                n_layers=1, sector=True)
    print(f"setup {time.time() - t0:.1f}s D={pqc.state_dim:,}", flush=True)

    theta = jnp.zeros((pqc.theta_shape,), jnp.float64)

    t0 = time.time()
    if stage == "rdms":
        fn = pqc._rdms_jit
        lowered = fn.lower(theta, pqc._tables())
    elif stage == "rdmsonly":
        from auto_oo_tpu.ops.rdms import rdms_from_state
        gm = pqc.sector_maps
        x = jnp.zeros((pqc.state_dim,), jnp.float64)
        lowered = jax.jit(
            lambda v: rdms_from_state(v, ncas, maps=gm)).lower(x)
    else:
        lowered = jax.jit(pqc._state_impl).lower(theta, pqc._tables())
    compiled = lowered.compile()
    print(f"compile {time.time() - t0:.1f}s", flush=True)
    ma = compiled.memory_analysis()
    if ma is not None:
        gb = 1 << 30
        print(f"temp={ma.temp_size_in_bytes / gb:.2f}G "
              f"arg={ma.argument_size_in_bytes / gb:.2f}G "
              f"out={ma.output_size_in_bytes / gb:.2f}G", flush=True)
    print("PROBE OK", flush=True)


if __name__ == "__main__":
    main()
