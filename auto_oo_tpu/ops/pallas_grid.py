"""Pallas TPU kernels for the string-grid gather primitives.

The grid E_pq kernels (ops/grid.py) are HBM-gather bound: XLA lowers
``x[..., src, :]`` row gathers at a fraction of HBM bandwidth, and
profiling at (10e,10o)-(12e,12o) shows the Phi build and the
sum_pq E_pq reduction dominating the mixed-precision NR iteration once
the MXU grams are fused.  These kernels issue the row gathers as
explicit HBM->VMEM DMAs (one DMA per gathered row, R rows in flight per
program) and fuse the rank-1 sign scaling into the VMEM block before
write-back, so the gather traffic runs at DMA speed and the scaled Phi
block never makes an extra HBM round trip.

Two primitives cover both grid ops (each used once per spin component,
with the transposed operand for the beta half exactly as in ops/grid.py):

  gather_rows_scaled(x, src, s, t) : out[k,i,j] = x[src[k,i], j]*s[k,i]*t[k,j]
  gather_reduce(Y, src, s, t)      : out[i,j] = sum_k Y[k, src[k,i], j]*s[k,i]*t[k,j]

f32 only (pallas has no f64 on TPU; the mixed-precision mode is the
production performance path).  CPU correctness runs through
``interpret=True`` (tests/test_pallas_grid.py); on-chip use is gated by
config.pallas_enabled() until measured faster (scripts/microbench_pallas.py).

No reference counterpart: the reference's hot loop was ncas^4 scipy
sparse matvecs in Python (reference pqc.py:192-218); this is the
TPU-native endpoint of that workload's redesign.
"""

import functools

import jax
from jax import lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per program: R gathered rows ride in flight per grid step.  8 rows
# of 924-3432 f32 lanes = 30-110 KB VMEM per block -- small against the
# 16 MB budget, large enough that per-DMA overhead amortizes.
_R = 8

# lane padding: VMEM row slices (DMA destinations / output rows) must be
# aligned to the 128-lane tiling, so the Nb axis is padded to a multiple
# of 128 on the fly (pad lanes are sliced off on return).
_L = 128

# index maps must return i32 under jax_enable_x64 (Python 0 traces as
# i64, which Mosaic cannot legalize in the index-map func.return)
_Z = lambda: jnp.int32(0)

# the double-buffered kernels hold FULL (1/n2, Na) src/s rows in SMEM —
# a scalar-memory footprint the interpret-mode tests cannot validate
# against the chip's budget.  AUTO_OO_TPU_PALLAS_DB=0 drops the dispatch
# back to the serial (1, R)-block kernels without code edits if Mosaic
# rejects the DB specs on hardware.
import os as _os

_DB_DEFAULT = _os.environ.get("AUTO_OO_TPU_PALLAS_DB", "1") != "0"


def _gather_rows_kernel(src_ref, s_ref, t_ref, x_ref, o_ref, sem,
                        *, ns):
    """One (batch b, pair k, row block r) program: DMA R source rows of
    x[b] into the output block, then scale rows by s[k, i] and lanes by
    t[k, :].

    Mosaic tiling: the pair tables arrive as (1, 1, 1, R) SMEM blocks of
    the padded (n2, nblocks, 1, R) layout and t as a (1, 1, nb) VMEM
    block — every blocked operand's last two dims equal its block's, the
    only shape Mosaic accepts for sub-(8,128) tiles.  The batch axis is a
    leading grid dimension addressing the full (B, Ns, Nb) x in ANY
    memory space (vmap of a pallas_call cannot batch an ANY operand)."""
    b = pl.program_id(0)
    R = o_ref.shape[2]
    z = jnp.int32(0)
    # x arrives flattened (B*Ns, Nb): slicing the MAJORMOST axis of a
    # tiled memref is row-granular; a middle axis would need 8-sublane
    # alignment.  ns is the static per-batch row count.
    base = b * jnp.int32(ns)
    for r in range(R):
        # src is always in [0, Ns): invalid entries carry src 0 / s 0
        i = src_ref[0, 0, 0, r]
        rr = jnp.int32(r)  # mixed static/dynamic indices must stay i32
        pltpu.make_async_copy(x_ref.at[base + i], o_ref.at[z, z, rr],
                              sem.at[rr]).start()
    for r in range(R):
        rr = jnp.int32(r)
        pltpu.make_async_copy(x_ref.at[base], o_ref.at[z, z, rr],
                              sem.at[rr]).wait()
        o_ref[0, 0, r, :] = (o_ref[0, 0, r, :]
                             * (s_ref[0, 0, 0, r] * t_ref[0, 0, :]))


def _gather_rows_db_kernel(src_ref, s_ref, t_ref, x_ref, o_ref, buf,
                           sem, *, ns):
    """Double-buffered gather_rows: row DMAs for the next block start
    before the current block's rows are scaled into the output, hiding
    DMA latency.  src/s arrive as the FULL (1, 1, Na_padded) pair row in
    SMEM so the next block's indices are addressable; DMAs land in
    scratch and are scaled on the copy into the output block."""
    b = pl.program_id(0)
    r = pl.program_id(2)
    nr = pl.num_programs(2)
    R = buf.shape[1]
    base = b * jnp.int32(ns)  # x flattened (B*Ns, Nb), majormost slicing

    def start(rb, slot):
        slot = jnp.int32(slot)
        for j in range(R):
            i = src_ref[0, 0, jnp.int32(rb * R + j)]
            jj = jnp.int32(j)  # keep mixed dynamic/static indices i32
            pltpu.make_async_copy(x_ref.at[base + i], buf.at[slot, jj],
                                  sem.at[slot, jj]).start()

    @pl.when(r == 0)
    def _():
        start(0, 0)

    @pl.when(r + 1 < nr)
    def _():
        # lax.rem, not %: jnp.remainder's floor-mod lowering recurses in
        # Mosaic's convert-element-type rule; rem == mod for ids >= 0.
        start(r + 1, lax.rem(r + 1, jnp.int32(2)))

    cur = lax.rem(r, jnp.int32(2))
    for j in range(R):
        jj = jnp.int32(j)
        pltpu.make_async_copy(x_ref.at[base], buf.at[cur, jj],
                              sem.at[cur, jj]).wait()
        o_ref[0, 0, j, :] = buf[cur, jj, :] * (s_ref[0, 0, r * R + j]
                                               * t_ref[0, 0, :])


def _pad_cols(a, m, fill=0):
    """Pad the last axis of ``a`` up to a multiple of ``m`` with ``fill``."""
    extra = (-a.shape[-1]) % m
    if extra == 0:
        return a
    pad = [(0, 0)] * (a.ndim - 1) + [(0, extra)]
    return jnp.pad(a, pad, constant_values=fill)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "double_buffer"))
def gather_rows_scaled(x, src, s, t, interpret=False,
                       double_buffer=None):
    """out[..., k, i, j] = x[..., src[k, i], j] * s[k, i] * t[k, j].

    x (..., Ns, Nb) f32; src (n2, Na) int32; s (n2, Na) f32; t (n2, Nb)
    f32 -> out (..., n2, Na, Nb) f32.  Invalid src entries must carry
    s == 0 (the grid-map convention: src 0 / sgn 0), which zeroes the
    garbage row.  Na is padded on the fly to a multiple of the row block
    (pad rows get s == 0 and are sliced off) and Nb to a multiple of 128
    (Mosaic requires VMEM row slices lane-aligned).  Leading dims of x
    become a leading grid axis (NOT vmap: Mosaic cannot batch the ANY-
    space operand).

    ``double_buffer`` prefetches the next row block's DMAs while the
    current block is scaled out (the default; the serial variant exists
    for A/B measurement, scripts/microbench_pallas.py).
    """
    if double_buffer is None:
        double_buffer = _DB_DEFAULT
    src = src.astype(jnp.int32)  # i64 SMEM scalars break memref_slice
    n2, na = src.shape
    lead = x.shape[:-2]
    xb = _pad_cols(x.reshape((-1,) + x.shape[-2:]), _L)
    B, _, nb_p = xb.shape
    nb = x.shape[-1]
    nblk = pl.cdiv(na, _R)
    na_p = nblk * _R
    src_p = _pad_cols(src, _R)
    s_p = _pad_cols(s, _R)
    t3 = _pad_cols(t, _L).reshape(n2, 1, nb_p)
    ns = xb.shape[1]
    xf = xb.reshape(B * ns, nb_p)
    grid = (B, n2, nblk)
    if double_buffer:
        out = pl.pallas_call(
            functools.partial(_gather_rows_db_kernel, ns=ns),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, na_p), lambda b, k, r: (k, _Z(), _Z()),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, na_p), lambda b, k, r: (k, _Z(), _Z()),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, nb_p), lambda b, k, r: (k, _Z(), _Z()),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec((1, 1, _R, nb_p),
                                   lambda b, k, r: (b, k, r, _Z()),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n2, na_p, nb_p), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, _R, nb_p), x.dtype),
                pltpu.SemaphoreType.DMA((2, _R)),
            ],
            interpret=interpret,
        )(src_p.reshape(n2, 1, na_p), s_p.reshape(n2, 1, na_p), t3, xf)
    else:
        out = pl.pallas_call(
            functools.partial(_gather_rows_kernel, ns=ns),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, 1, _R),
                             lambda b, k, r: (k, r, _Z(), _Z()),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, _R),
                             lambda b, k, r: (k, r, _Z(), _Z()),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, nb_p), lambda b, k, r: (k, _Z(), _Z()),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec((1, 1, _R, nb_p),
                                   lambda b, k, r: (b, k, r, _Z()),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n2, na_p, nb_p), x.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_R,))],
            interpret=interpret,
        )(src_p.reshape(n2, nblk, 1, _R), s_p.reshape(n2, nblk, 1, _R),
          t3, xf)
    return out[:, :, :na, :nb].reshape(lead + (n2, na, nb))


def _gather_reduce_kernel(src_ref, s_ref, t_ref, y_ref, o_ref, buf,
                          sem, *, ns):
    """Grid (B, row blocks, n2) with k fastest: the output block stays
    resident across the k sweep; each step DMAs R rows of the k-th Y slab
    and accumulates the scaled block.  Tables arrive as (1, 1, 1, R) SMEM
    blocks of the padded (n2, nblocks, 1, R) layout (Mosaic tiling)."""
    b = pl.program_id(0)
    k = pl.program_id(2)
    n2 = pl.num_programs(2)
    R = buf.shape[0]

    @pl.when(k == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    # Y flattened (B*n2*Ns, Nb): majormost-axis slicing only
    base = (b * jnp.int32(n2) + k) * jnp.int32(ns)
    for r in range(R):
        i = src_ref[0, 0, 0, r]
        rr = jnp.int32(r)
        pltpu.make_async_copy(y_ref.at[base + i], buf.at[rr],
                              sem.at[rr]).start()
    for r in range(R):
        rr = jnp.int32(r)
        pltpu.make_async_copy(y_ref.at[base], buf.at[rr],
                              sem.at[rr]).wait()
        o_ref[0, r, :] = o_ref[0, r, :] + buf[r, :] * (s_ref[0, 0, 0, r]
                                                       * t_ref[0, 0, :])


def _gather_reduce_db_kernel(src_ref, s_ref, t_ref, y_ref, o_ref, buf,
                             sem, *, ns):
    """Double-buffered gather_reduce: the k+1 slab's row DMAs start
    before the k slab is consumed, hiding DMA latency behind the
    accumulate (v1 serializes start -> wait -> accumulate per step, so
    per-row latency dominates the ~0.1 us transfer of each row).  The
    src/s tables arrive pair-transposed as FULL (1, n2, R) column blocks
    in SMEM (last two block dims == array dims, per Mosaic tiling) so the
    next step's indices are addressable."""
    b = pl.program_id(0)
    k = pl.program_id(2)
    n2 = pl.num_programs(2)
    R = buf.shape[1]

    def start(kk, slot):
        slot = jnp.int32(slot)
        kk = jnp.int32(kk)
        # Y flattened (B*n2*Ns, Nb): majormost-axis slicing only
        base = (b * jnp.int32(n2) + kk) * jnp.int32(ns)
        for r in range(R):
            i = src_ref[0, kk, r]
            rr = jnp.int32(r)
            pltpu.make_async_copy(y_ref.at[base + i], buf.at[slot, rr],
                                  sem.at[slot, rr]).start()

    @pl.when(k == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
        start(0, 0)

    @pl.when(k + 1 < n2)
    def _():
        start(k + 1, lax.rem(k + 1, jnp.int32(2)))

    cur = lax.rem(k, jnp.int32(2))
    z = jnp.int32(0)
    for r in range(R):
        rr = jnp.int32(r)
        pltpu.make_async_copy(y_ref.at[z], buf.at[cur, rr],
                              sem.at[cur, rr]).wait()
        o_ref[0, r, :] = (o_ref[0, r, :]
                          + buf[cur, rr, :] * (s_ref[0, k, r]
                                               * t_ref[0, 0, :]))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "double_buffer"))
def gather_reduce(Y, src, s, t, interpret=False, double_buffer=None):
    """out[..., i, j] = sum_k Y[..., k, src[k, i], j] * s[k, i] * t[k, j].

    Y (..., n2, Ns, Nb) f32; src/s (n2, Na); t (n2, Nb) -> out
    (..., Na, Nb) f32.  One spin half of the Hamiltonian-apply reduction:
    this kernel reads Y once and the (n2, Na, Nb) gathered-and-scaled
    intermediate of the XLA path never materializes.  (The CALLER still
    pays one transposed copy of Y for the other spin half — see
    epq_sum_pallas.)  Leading dims become a leading grid axis.

    ``double_buffer`` prefetches the next slab's rows while the current
    slab accumulates (the default; the serial variant exists for A/B
    measurement, scripts/microbench_pallas.py).
    """
    if double_buffer is None:
        double_buffer = _DB_DEFAULT
    src = src.astype(jnp.int32)  # i64 SMEM scalars break memref_slice
    n2, na = src.shape
    lead = Y.shape[:-3]
    Yb = _pad_cols(Y.reshape((-1,) + Y.shape[-3:]), _L)
    B, _, ns, nb_p = (Yb.shape[0], Yb.shape[1], Yb.shape[2], Yb.shape[3])
    Yf = Yb.reshape(B * Yb.shape[1] * ns, nb_p)
    nb = Y.shape[-1]
    nblk = pl.cdiv(na, _R)
    na_p = nblk * _R
    src_p = _pad_cols(src, _R)
    s_p = _pad_cols(s, _R)
    t3 = _pad_cols(t, _L).reshape(n2, 1, nb_p)
    grid = (B, nblk, n2)
    if double_buffer:
        # pair-transposed (nblocks, n2, R) table layout: one program's
        # SMEM block carries the column block for EVERY pair slab k, so
        # the k+1 prefetch can address its indices.
        srcT = src_p.reshape(n2, nblk, _R).transpose(1, 0, 2)
        sT = s_p.reshape(n2, nblk, _R).transpose(1, 0, 2)
        out = pl.pallas_call(
            functools.partial(_gather_reduce_db_kernel, ns=ns),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, n2, _R), lambda b, r, k: (r, _Z(), _Z()),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, n2, _R), lambda b, r, k: (r, _Z(), _Z()),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, nb_p), lambda b, r, k: (k, _Z(), _Z()),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec((1, _R, nb_p),
                                   lambda b, r, k: (b, r, _Z()),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, na_p, nb_p), Y.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, _R, nb_p), Y.dtype),
                pltpu.SemaphoreType.DMA((2, _R)),
            ],
            interpret=interpret,
        )(srcT, sT, t3, Yf)
    else:
        out = pl.pallas_call(
            functools.partial(_gather_reduce_kernel, ns=ns),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, 1, _R),
                             lambda b, r, k: (k, r, _Z(), _Z()),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, _R),
                             lambda b, r, k: (k, r, _Z(), _Z()),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, nb_p), lambda b, r, k: (k, _Z(), _Z()),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec((1, _R, nb_p),
                                   lambda b, r, k: (b, r, _Z()),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, na_p, nb_p), Y.dtype),
            scratch_shapes=[
                pltpu.VMEM((_R, nb_p), Y.dtype),
                pltpu.SemaphoreType.DMA((_R,)),
            ],
            interpret=interpret,
        )(src_p.reshape(n2, nblk, 1, _R), s_p.reshape(n2, nblk, 1, _R),
          t3, Yf)
    return out[:, :na, :nb].reshape(lead + (na, nb))


def _f32(a):
    return a.astype(jnp.float32)


def _phi_impl(x, gm, interpret):
    xg = x.reshape(x.shape[:-1] + (gm.Na, gm.Nb))
    pa = gather_rows_scaled(xg, gm.srcA, _f32(gm.sgnA), _f32(gm.tB),
                            interpret=interpret)
    pb = gather_rows_scaled(jnp.swapaxes(xg, -1, -2), gm.srcB,
                            _f32(gm.sgnB), _f32(gm.tA),
                            interpret=interpret)
    phi = pa + jnp.swapaxes(pb, -1, -2)
    return phi.reshape(x.shape[:-1] + (gm.n2, gm.dim))


def _epq_impl(Y, gm, interpret):
    Yg = Y.reshape(Y.shape[:-1] + (gm.Na, gm.Nb))
    outA = gather_reduce(Yg, gm.srcA, _f32(gm.sgnA), _f32(gm.tB),
                         interpret=interpret)
    Yt = jnp.swapaxes(Yg, -1, -2)
    outBt = gather_reduce(Yt, gm.srcB, _f32(gm.sgnB), _f32(gm.tA),
                          interpret=interpret)
    return ((outA + jnp.swapaxes(outBt, -1, -2))
            .reshape(Y.shape[:-2] + (gm.dim,)))


def _pair_transpose(n2):
    """Static (p,q) -> (q,p) pair-index involution: E_pq^T = E_qp, so the
    adjoints of the two grid ops are each other with pair-permuted maps."""
    import numpy as np

    ncas = int(round(n2 ** 0.5))
    k = np.arange(n2)
    return jnp.asarray((k % ncas) * ncas + k // ncas, jnp.int32)


def _xla_vjp(xla_fn, base_shape, out_base_ndim, dtype=jnp.float32):
    """Backward of a LINEAR op derived from its XLA implementation
    (correct for any pair subset; the base point is irrelevant).  Batch-
    aware: the cotangent's leading dims beyond ``out_base_ndim`` are the
    batch, and the zero base point gets the same leading dims."""
    def bwd(_, ct):
        batch = ct.shape[:ct.ndim - out_base_ndim]
        zero = jnp.zeros(batch + base_shape, dtype)
        return (jax.vjp(xla_fn, zero)[1](ct)[0],)

    return bwd


def _linear_pair(gm, interpret, full_pairs=True):
    """(phi, epq_sum) closures with custom VJPs, so the gradient-only
    optimizer path (jax.grad through rdms_from_state) works on the
    pallas kernels.  Both ops are linear in their tensor operand; for
    the FULL square pair set, VJP(phi)(ct) = sum_k E_k^T ct_k =
    epq_sum(ct[perm]) and VJP(epq_sum)(g) = phi(g)[perm] with perm the
    pair-transpose involution (E_pq^T = E_qp) — the backward then also
    runs the pallas kernels.  For pair_slice'd maps (full_pairs=False)
    the involution does not hold and the backward is derived from the
    XLA grid kernels instead.  All closures are batch-native (leading
    dims ride the kernels' batch grid axis)."""
    from . import grid as _grid

    @jax.custom_vjp
    def phi(x):
        return _phi_impl(x, gm, interpret)

    @jax.custom_vjp
    def esum(Y):
        return _epq_impl(Y, gm, interpret)

    if full_pairs:
        perm = _pair_transpose(gm.n2)
        phi.defvjp(lambda x: (phi(x), None),
                   lambda _, ct: (esum(ct[..., perm, :]),))
        esum.defvjp(lambda Y: (esum(Y), None),
                    lambda _, g: (phi(g)[..., perm, :],))
    else:
        phi.defvjp(
            lambda x: (phi(x), None),
            _xla_vjp(lambda v: _grid._phi_all_xla(v, gm), (gm.dim,), 2))
        esum.defvjp(
            lambda Y: (esum(Y), None),
            _xla_vjp(lambda v: _grid._epq_sum_xla(v, gm),
                     (gm.n2, gm.dim), 1))
    return phi, esum


def phi_rows_pallas(x, gm, r0, r1, interpret=False):
    """ops.grid.phi_rows on the pallas gather kernel: the (n2, rows, Nb)
    block of E_pq x for grid A-rows [r0, r1).  The alpha part gathers
    full rows of x with row-sliced tables; the beta part gathers rows of
    the transposed row block (the lane gather of the XLA version becomes
    a row gather after one small (rows, Nb) transpose).  Linear; VJP
    derived from the XLA implementation (scatter-add adjoint).  Batch-
    native in x's leading dims."""
    from . import grid as _grid

    @jax.custom_vjp
    def f(v):
        vg = v.reshape(v.shape[:-1] + (gm.Na, gm.Nb))
        pa = gather_rows_scaled(vg, gm.srcA[:, r0:r1],
                                _f32(gm.sgnA[:, r0:r1]), _f32(gm.tB),
                                interpret=interpret)
        zT = jnp.swapaxes(vg[..., r0:r1, :], -1, -2)
        pb = gather_rows_scaled(zT, gm.srcB, _f32(gm.sgnB),
                                _f32(gm.tA[:, r0:r1]), interpret=interpret)
        return pa + jnp.swapaxes(pb, -1, -2)

    f.defvjp(lambda v: (f(v), None),
             _xla_vjp(lambda v: _grid._phi_rows_xla(v, gm, r0, r1),
                      (gm.dim,), 3))
    return f(x)


def phi_all_pallas(x, gm, interpret=False, full_pairs=True):
    """ops.grid.phi_all on the pallas gather kernel: both spin components
    as row gathers (beta via the transposed grid), signs fused.  x is a
    GRID-ordered flat f32 vector (or batch); returns (..., n2, Ds)."""
    fn, _ = _linear_pair(gm, interpret, full_pairs)
    return fn(x)


def epq_sum_pallas(Y, gm, interpret=False, full_pairs=True):
    """ops.grid.epq_sum on the pallas gather-reduce kernel: Y (..., n2, Ds)
    grid-ordered -> (..., Ds).  The (n2, Na, Nb) gathered-and-scaled
    intermediate of the XLA path never materializes; the beta half does
    still read through one explicit transposed copy of Y (as the XLA
    path does) — Mosaic has no lane-gather, so the remaining traffic is
    gather(Y) + transpose(Y) + gather(Yt) instead of the XLA path's two
    slow gathers + the same transpose."""
    _, fn = _linear_pair(gm, interpret, full_pairs)
    return fn(Y)
