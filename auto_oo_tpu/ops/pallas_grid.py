"""Pallas TPU kernels for the string-grid gather primitives.

The grid E_pq kernels (ops/grid.py) are HBM-gather bound: XLA lowers
``x[..., src, :]`` row gathers well below HBM bandwidth at the
(10e,10o)-(12e,12o) sector scales.  These kernels keep the gathered
operand RESIDENT IN VMEM (streamed in one sequential DMA pass) and do
the random row access with dynamic-sublane reads/writes inside the
kernel — the only row-granular access mechanism Mosaic accepts:

  * single-row dynamic slices of a tiled HBM memref are ILLEGAL
    ("Slice shape along dimension 0 must be aligned to tiling (8)"),
    which killed the round-4 per-row-DMA design at production shapes;
  * 1-D flattened dynamic DMA offsets also fail to compile;
  * 8-row-aligned block DMAs are legal but move 8x traffic.
  (measured: scripts/experiment_gather_mechanisms.py on TPU v5e)

Two primitives cover both grid ops (each used once per spin component,
with the transposed operand for the beta half exactly as in ops/grid.py):

  gather_rows_scaled(x, src, s, t) : out[k,i,:] = x[src[k,i], :]*s[k,i]*t[k,:]
      x lives in VMEM (lane-blocked when one slab exceeds the budget);
      the output streams out in (R=8)-row blocks.
  gather_reduce(Y, src, s, t)      : out[i,:] = sum_k Y[k, src[k,i], :]*s[k,i]*t[k,:]
      the OUTPUT lives in VMEM as the accumulator across the whole pair
      sweep; each Y slab streams through VMEM exactly once, so the
      (n2, Na, Nb) gathered intermediate of the XLA path never exists
      and total HBM traffic is read(Y) + write(out) — optimal.

f32 only (pallas has no f64 on TPU; the mixed-precision mode is the
production performance path).  CPU correctness runs through
``interpret=True`` (tests/test_pallas_grid.py); on-chip use is gated by
config.pallas_enabled() until measured faster (scripts/microbench_pallas.py).
The measured verdict on v5e (BASELINE.md round 4): XLA's own row
gathers match or beat the legal pallas mechanisms on gather_rows
(9.7 ms vs 11.6 ms per (144, 928, 1024) op at ncas=12), so the pallas
path stays OFF by default; gather_reduce's traffic advantage is the one
open question the A/B tier in bench.py measures.

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

# rows per streamed output block of gather_rows.
_R = 8

# lane tiling granularity: VMEM blocks must be 128-lane aligned.
_L = 128

# budget for the VMEM-resident operand slab (plus its double-buffered
# streaming copy and the resident output block, both counted by the
# block choosers below).  16 MB VMEM total on v5e; leave headroom for
# Mosaic's own temporaries.
_VMEM_BUDGET = 10 * (1 << 20)

# index maps must return i32 under jax_enable_x64 (Python 0 traces as
# i64, which Mosaic cannot legalize in the index-map func.return)
_Z = lambda: jnp.int32(0)


def _pad_axis(a, axis, m, fill=0):
    """Pad ``axis`` of ``a`` up to a multiple of ``m`` with ``fill``."""
    extra = (-a.shape[axis]) % m
    if extra == 0:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, extra)
    return jnp.pad(a, pad, constant_values=fill)


def _lane_block(nb_p, resident_rows):
    """Largest 128-multiple lane block whose resident slab(s) fit the
    VMEM budget.  ``resident_rows`` counts every row that must be live
    per lane block (the slab itself, its pipeline double buffer, the
    resident output block...)."""
    blk = nb_p
    while blk > _L and resident_rows * blk * 4 > _VMEM_BUDGET:
        blk = max(_L, ((blk // 2) + _L - 1) // _L * _L)
    if resident_rows * blk * 4 > _VMEM_BUDGET:
        raise ValueError(
            f"pallas grid kernel: {resident_rows} resident rows exceed "
            f"the VMEM budget even at the minimum 128-lane block; use "
            f"the XLA grid path (config.set_pallas(False)) at this size")
    return blk


def _gather_rows_kernel(src_ref, s_ref, t_ref, x_ref, o_ref):
    """One (batch b, lane block l, pair k, row block r) program: the x
    slab is VMEM-resident (revisited across the whole inner (k, r)
    sweep, so it is DMA'd once per (b, l)); R rows are read at dynamic
    sublane indices, scaled by s[k, i] * t[k, :], and stream out."""
    r = pl.program_id(3)
    t = t_ref[0, 0, :]
    for j in range(_R):
        jj = r * _R + j
        i = src_ref[0, 0, jj]
        o_ref[0, 0, j, :] = x_ref[i, :] * (s_ref[0, 0, jj] * t)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "double_buffer"))
def gather_rows_scaled(x, src, s, t, interpret=False,
                       double_buffer=None):
    """out[..., k, i, j] = x[..., src[k, i], j] * s[k, i] * t[k, j].

    x (..., Ns, Nb) f32; src (n2, Na) int32; s (n2, Na) f32; t (n2, Nb)
    f32 -> out (..., n2, Na, Nb) f32.  Invalid src entries must carry
    s == 0 (the grid-map convention: src 0 / sgn 0), which zeroes the
    garbage row.  Na is padded on the fly to a multiple of the row block
    (pad rows get s == 0 and are sliced off), Ns to a multiple of the
    8-row sublane tile, and Nb to a multiple of 128.  The lane axis is
    blocked when one (Ns, Nb) slab would overflow VMEM (the slab must be
    resident — Mosaic has no legal row-granular HBM access).  Leading
    dims of x become a leading grid axis.

    ``double_buffer`` is accepted for API compatibility and ignored:
    the VMEM-resident mechanism has no manual DMA to buffer (the old
    per-row-DMA kernels did not compile at production shapes).
    """
    del double_buffer
    src = src.astype(jnp.int32)  # i64 SMEM scalars break memref_slice
    n2, na = src.shape
    lead = x.shape[:-2]
    xb = _pad_axis(_pad_axis(x.reshape((-1,) + x.shape[-2:]), -1, _L),
                   -2, 8)
    B, ns_p, nb_p = xb.shape
    nb = x.shape[-1]
    nblk = pl.cdiv(na, _R)
    na_p = nblk * _R
    src_p = _pad_axis(src, -1, _R)
    s_p = _pad_axis(s, -1, _R)
    t3 = _pad_axis(t, -1, _L).reshape(n2, 1, nb_p)
    xf = xb.reshape(B * ns_p, nb_p)
    nb_blk = _lane_block(nb_p, 2 * ns_p + _R)
    nl = pl.cdiv(nb_p, nb_blk)
    out = pl.pallas_call(
        _gather_rows_kernel,
        grid=(B, nl, n2, nblk),
        in_specs=[
            pl.BlockSpec((1, 1, na_p),
                         lambda b, l, k, r: (k, _Z(), _Z()),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, na_p),
                         lambda b, l, k, r: (k, _Z(), _Z()),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nb_blk),
                         lambda b, l, k, r: (k, _Z(), l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns_p, nb_blk), lambda b, l, k, r: (b, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, _R, nb_blk),
                               lambda b, l, k, r: (b, k, r, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n2, na_p, nb_p), x.dtype),
        interpret=interpret,
    )(src_p.reshape(n2, 1, na_p), s_p.reshape(n2, 1, na_p), t3, xf)
    return out[:, :, :na, :nb].reshape(lead + (n2, na, nb))


def _gather_reduce_kernel(src_ref, s_ref, t_ref, y_ref, o_ref, *, na):
    """One (batch b, lane block l, pair k) program: the OUTPUT block is
    the VMEM-resident accumulator (revisited across the whole k sweep,
    written back once); the k-th Y slab streams through VMEM, and a
    fori_loop over output rows does the dynamic-sublane
    read-modify-write  out[i, :] += Y[src[k, i], :] * s[k, i] * t[k, :].
    Total HBM traffic over the sweep: read(Y) + write(out)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    t = t_ref[0, 0, :]

    def body(i, carry):
        m = src_ref[0, 0, i]
        o_ref[i, :] = o_ref[i, :] + y_ref[m, :] * (s_ref[0, 0, i] * t)
        return carry

    lax.fori_loop(0, na, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "double_buffer"))
def gather_reduce(Y, src, s, t, interpret=False, double_buffer=None):
    """out[..., i, j] = sum_k Y[..., k, src[k, i], j] * s[k, i] * t[k, j].

    Y (..., n2, Ns, Nb) f32; src/s (n2, Na); t (n2, Nb) -> out
    (..., Na, Nb) f32.  One spin half of the Hamiltonian-apply
    reduction.  The output block stays resident in VMEM as the
    accumulator across the pair sweep while each Y slab is DMA'd in
    exactly once, so — unlike the XLA path — the (n2, Na, Nb)
    gathered-and-scaled intermediate never materializes and the HBM
    traffic is the information-theoretic floor read(Y) + write(out).
    (The CALLER still pays one transposed copy of Y for the other spin
    half — see epq_sum_pallas.)  Leading dims become a leading grid
    axis; the lane axis is blocked to fit the resident output + streamed
    slab in VMEM.

    ``double_buffer`` is accepted for API compatibility and ignored.
    """
    del double_buffer
    src = src.astype(jnp.int32)  # i64 SMEM scalars break memref_slice
    n2, na = src.shape
    lead = Y.shape[:-3]
    Yb = _pad_axis(_pad_axis(Y.reshape((-1,) + Y.shape[-3:]), -1, _L),
                   -2, 8)
    B, _, ns_p, nb_p = Yb.shape
    Yf = Yb.reshape(B * n2 * ns_p, nb_p)
    nb = Y.shape[-1]
    na_p = pl.cdiv(na, 8) * 8
    src_p = _pad_axis(src, -1, 8)
    s_p = _pad_axis(s, -1, 8)
    t3 = _pad_axis(t, -1, _L).reshape(n2, 1, nb_p)
    # resident rows per lane block: the (na_p, blk) output accumulator
    # plus two (ns_p, blk) Y-slab pipeline buffers
    nb_blk = _lane_block(nb_p, na_p + 2 * ns_p)
    nl = pl.cdiv(nb_p, nb_blk)
    out = pl.pallas_call(
        functools.partial(_gather_reduce_kernel, na=na),
        grid=(B, nl, n2),
        in_specs=[
            pl.BlockSpec((1, 1, na_p), lambda b, l, k: (k, _Z(), _Z()),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, na_p), lambda b, l, k: (k, _Z(), _Z()),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nb_blk), lambda b, l, k: (k, _Z(), l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns_p, nb_blk),
                         lambda b, l, k, _n2=n2: (b * _n2 + k, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((na_p, nb_blk), lambda b, l, k: (b, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * na_p, nb_p), Y.dtype),
        interpret=interpret,
    )(src_p.reshape(n2, 1, na_p), s_p.reshape(n2, 1, na_p), t3, Yf)
    return (out.reshape(B, na_p, nb_p)[:, :na, :nb]
            .reshape(lead + (na, nb)))


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
