"""Verify gate sign/order conventions against reference golden states.

The conventions hard-coded in auto_oo_tpu/simulator/ansatze.py were
determined by brute-force search over the plausible alternatives; this
script re-checks every golden statevector captured from the reference test
suite (/root/reference/test/test_pqc.py).  Run after any change to
simulator/gates.py or simulator/ansatze.py.

Findings (pinned):
* FermionicDouble/SingleExcitation rotate by theta/2 with JW-exact signs.
* UCCSD theta layout = [singles..., doubles...]; doubles applied first.
* GateFabric block = DoubleExcitation(theta) then OrbitalRotation(phi);
  OrbitalRotation is the fermionic variant (JW string parity on the
  crossed wire), positive angle signs everywhere.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import auto_oo_tpu  # noqa: F401  (x64 config)
from auto_oo_tpu.simulator.circuit import Parameterized_circuit

from tests.goldens import STATE_GOLDENS as GOLDENS



def main():
    all_ok = True
    for ncas, ne, add_s, ansatz, L, theta, ref_map in GOLDENS:
        pqc = Parameterized_circuit(ncas, ne, ansatz=ansatz,
                                    n_layers=L or 3,
                                    add_singles=bool(add_s))
        psi = np.asarray(pqc.state(jnp.asarray(theta)))
        ref = np.zeros(psi.shape)
        for k, v in ref_map.items():
            ref[k] = v
        ok = np.allclose(psi, ref, atol=2e-5)
        all_ok &= ok
        tag = f"{ansatz}(ncas={ncas},ne={ne},singles={add_s},L={L})"
        print(f"{'OK ' if ok else 'FAIL'} {tag}  max|diff|="
              f"{np.max(np.abs(psi - ref)):.2e}")
    print("ALL OK" if all_ok else "FAILURES PRESENT")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
