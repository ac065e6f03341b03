"""Global numerical configuration for auto_oo_tpu.

The reference package required callers to set x64 themselves
(/root/reference/src/auto_oo/oo_pqc.py:238-242, test headers); here the
library owns its precision policy: float64 is enabled at import because the
OO-VQE workloads need 1e-8 Ha convergence.  On TPU, float64 is emulated by
XLA; the hot kernels in this package are written to be precision-polymorphic
so that a float32 path can be selected where it is safe (see
``auto_oo_tpu.ops``).
"""

import jax

jax.config.update("jax_enable_x64", True)

#: Default floating point dtype for energies / integrals / parameters.
DEFAULT_DTYPE = "float64"

#: CODATA-2010 Bohr radius in Angstrom (matches PySCF's param.BOHR so that
#: geometries specified in Angstrom reproduce reference energies to 1e-10 Ha).
BOHR = 0.52917721092
