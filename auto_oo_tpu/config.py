"""Global numerical configuration for auto_oo_tpu.

The reference package required callers to set x64 themselves
(/root/reference/src/auto_oo/oo_pqc.py:238-242, test headers); here the
library owns its precision policy: float64 is enabled at import because the
OO-VQE workloads need 1e-8 Ha convergence.  On TPU, float64 is emulated by
XLA; the hot kernels are precision-polymorphic, and the float32 path is
selected where it is safe via ``OO_pqc(..., precision='mixed')`` — Hessian
blocks on the MXU in f32, energy/gradient in f64 (models/oo_pqc.py;
validated in tests/test_mixed_precision.py).
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

#: Default floating point dtype for energies / integrals / parameters.
DEFAULT_DTYPE = "float64"

# Pallas DMA-gather kernels for the f32 string-grid path
# (ops/pallas_grid.py).  Off by default until measured faster on the
# target chip (scripts/microbench_pallas.py); enable per-process with
# AUTO_OO_TPU_PALLAS=1 or set_pallas(True).  The kernels are f32-only,
# so f64 operands always take the XLA grid path regardless.
_PALLAS = os.environ.get("AUTO_OO_TPU_PALLAS", "").strip().lower() in (
    "1", "true", "yes", "on")


def set_pallas(enabled):
    """Toggle the pallas grid kernels (f32 sector path) at runtime.
    Takes effect at the next trace; already-jitted programs keep the
    path they compiled with."""
    global _PALLAS
    _PALLAS = bool(enabled)


def pallas_enabled():
    return _PALLAS


# Matmul-form string-grid kernels (ops/grid.py): the per-pair E_pq row
# gathers recast as dense batched matmuls against scattered one-spin
# operator tensors, putting the gather-bound Phi/sum_pq work on the MXU.
# MEASURED NEGATIVE on chip at (12e,12o) f32 (scripts/microbench_gridmm.py):
# at the f32 accuracy the mixed-precision Hessian needs (3-pass bf16
# MXU), mm runs 0.69-0.82x the row gathers; the single-pass bf16 form
# ties (0.98-1.27x) but carries 1e-2-level error.  OFF by default;
# 'auto' uses them for f32 operands when the dense tensors fit the
# per-spin byte budget (ncas <= 12 sectors); 'on' forces them.
_GRID_MM = os.environ.get("AUTO_OO_TPU_GRID_MM", "off").strip().lower()
if _GRID_MM in ("1", "true", "yes"):
    _GRID_MM = "on"
if _GRID_MM in ("0", "false", "no"):
    _GRID_MM = "off"


def set_grid_mm(mode):
    """Select the matmul-form grid kernels: 'auto' | 'on' | 'off' (or a
    bool).  Takes effect at the next trace."""
    global _GRID_MM
    if isinstance(mode, bool):
        mode = "auto" if mode else "off"
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"grid_mm mode {mode!r} not in auto|on|off")
    _GRID_MM = mode


def grid_mm_mode():
    return _GRID_MM

#: CODATA-2010 Bohr radius in Angstrom (matches PySCF's param.BOHR so that
#: geometries specified in Angstrom reproduce reference energies to 1e-10 Ha).
BOHR = 0.52917721092
