"""Host-segmented drivers for the string-grid kernels at (16e,16o)+ scale.

Two measured facts force multi-dispatch execution of the big streamed
kernels (BASELINE.md round-4 ninth phase):

1. the tunneled TPU worker kills any single program that executes for
   ~80 s or longer (a 26 s program runs fine; the same scan extended to
   ~85 s reproducibly crashes the worker) — so a (16e,16o) full-Phi
   pass (~339 GB of gather traffic, ~100 s) cannot run as ONE XLA
   program even though its compiled peak memory (6.7 GB) fits;
2. `ops/hamiltonian.ham_apply`'s pair-blocked streaming degenerates at
   D = 165.6M: one f64 Y row is 1.3 GB, so the 5-live-buffer budget
   forces pair_block = 1 — i.e. n2 = 256 full-Phi passes, hours of
   gather traffic.

The drivers here run the SAME math as `ops/grid.rdms_rows` /
`ham_apply_rows`, but as a host Python loop over fixed-shape jitted
SEGMENT programs: every intermediate (the RDM accumulators, the
H-apply output accumulator) stays device-resident between dispatches,
each dispatch scans a bounded number of grid A-row chunks, and one
compiled program serves every full-size segment (plus one for the
remainder shape).  The Hamiltonian apply additionally switches from
pair-blocked gather-reduce to the inverse-map SCATTER form of the
row-sharded engine (parallel/grid_sharded._ham_local — this is its
n_dev = 1 case): Y is computed slab-by-slab in SOURCE rows and
scattered through the transpose maps (E_pq row maps are partial
injections, ops/grid.inverse_alpha_maps), so the total traffic is ONE
full-Phi pass regardless of D.

All grid tables ride as runtime ARGUMENTS of the segment programs —
closure capture would embed them as program constants (the s2g
permutation alone is 662 MB at (16e,16o), simulator/circuit.py:238).

Exactness vs the single-program kernels is pinned in tests/test_grid.py
(closed and open shell, segment remainders included).  No reference
counterpart: the reference architecture (pqc.py:192-218, Python sparse
loops over 4^ncas vectors) cannot represent these scales at all.
"""

import contextlib
import os

import numpy as np
import jax
import jax.numpy as jnp

from . import grid as _grid
from . import rdms as _rdms


# ---- policy ---------------------------------------------------------------

# one full-Phi gather pass above this many bytes must not run as a
# single program (the ~80 s worker kill window at measured gather
# rates); (14e,14o) is 18.5 GB (runs fused, 4.3 s), (16e,16o) is 339 GB
_HOSTED_MIN_BYTES_ENV = "AUTO_OO_TPU_HOSTED_MIN_BYTES"
# grid A-row chunks per segment program: ~0.3 s/chunk for the RDM gram,
# ~0.6 s/chunk for the scatter H-apply at (16e,16o), so 32 keeps every
# dispatch in the 10-20 s band — far under the kill window
_SEG_CHUNKS_ENV = "AUTO_OO_TPU_SEG_CHUNKS"


def hosted_min_bytes():
    return int(float(os.environ.get(_HOSTED_MIN_BYTES_ENV, 64e9)))


def seg_chunks_default():
    return max(1, int(os.environ.get(_SEG_CHUNKS_ENV, 32)))


def needs_hosting(gm, itemsize=8):
    """True when one full-Phi pass over ``gm`` exceeds the
    single-program traffic budget and the streamed kernels must run
    through the hosted drivers below."""
    return gm.n2 * gm.Na * gm.Nb * itemsize >= hosted_min_bytes()


def warm_tables_for(gm, dtype):
    """Pre-build every hosted table this module derives from ``gm`` for
    states of ``dtype`` (scan tables + chunked inverse maps at the
    default single-state row_chunk).  Call while the device heap is
    near-empty: building them mid-flow — a 13 MB device->host fetch or
    a table upload dispatched right after hundreds of segment
    dispatches — was measured to hit transient RESOURCE_EXHAUSTED at
    (16e,16o) heap pressure.  All results are memoized, so the
    mid-flow calls become cache hits."""
    itemsize = jnp.dtype(dtype).itemsize
    rc = _grid._row_chunk(1, gm.n2, gm.Nb, itemsize)
    _, _, _, nchunk, pad = _grid._row_scan_tables(gm, rc)
    _chunked_inverse_tables(gm, rc, nchunk, pad)


_JIT_CACHE = {}


def _seg_jit(name, fn):
    if name not in _JIT_CACHE:
        _JIT_CACHE[name] = jax.jit(fn)
    return _JIT_CACHE[name]


def _prec_ctx(dt):
    """Trace-time matmul-precision scope for f32-family segment traces.

    TPU f32 dots default to ONE bf16 pass (~1e-2 relative error — far too
    coarse for RDM grams); 'float32' stamps the bf16x3 passes that
    deliver true f32 accuracy.  f64 traces stay OUTSIDE the scope (the
    f64 emulation path is precision-flag sensitive on some backends) —
    same policy as models/oo_pqc._build_nr_core's prec_ctx."""
    if jnp.dtype(dt) in (jnp.dtype(jnp.float32), jnp.dtype(jnp.complex64)):
        return jax.default_matmul_precision("float32")
    return contextlib.nullcontext()


# ---- shared chunk primitives ----------------------------------------------


def _phi_chunk_t(xg, rows_k, srcA_k, sgnA_k, tA_k, srcB, sgnB, tB):
    """One row chunk of Phi with every table an explicit argument
    (the hosted segment programs must not close over gm arrays); same
    math as ops/grid._phi_chunk's XLA branch.  The pallas kernels are
    deliberately not dispatched here: hosting targets the f64
    (16e,16o)+ paths, the kernels are f32-only and measured ties."""
    dt = xg.dtype
    pa = (jnp.take(xg, srcA_k, axis=-2)
          * sgnA_k.astype(dt)[:, :, None] * tB.astype(dt)[:, None, :])
    pb = jnp.take(rows_k, srcB, axis=-1)          # (rows, n2, Nb)
    pb = jnp.moveaxis(pb, -2, -3)                 # (n2, rows, Nb)
    pb = (pb * tA_k.astype(dt)[:, :, None]
          * sgnB.astype(dt)[:, None, :])
    return pa + pb


_CHUNKED_INV_CACHE = {}


def _chunked_inverse_tables(gm, row_chunk, nchunk, pad):
    """Inverse alpha maps padded and chunked exactly like
    ops/grid._row_scan_tables (pad rows carry dst 0 / sign 0 — they
    scatter exactly nothing into row 0).  Memoized per (maps identity,
    row_chunk) like the scan tables — rebuilt-per-call uploads raced
    pending frees at (16e,16o) heap pressure."""
    key = (id(gm.srcA), int(row_chunk))
    hit = _CHUNKED_INV_CACHE.get(key)
    if hit is not None:
        return hit
    dst, dsg = _grid.inverse_alpha_maps(gm)
    n2 = gm.n2

    def chunked(a):
        a = np.pad(np.asarray(a), ((0, 0), (0, pad)))
        return jnp.asarray(
            np.swapaxes(a.reshape(n2, nchunk, row_chunk), 0, 1))

    out = (chunked(dst), chunked(dsg))
    _CHUNKED_INV_CACHE[key] = out
    return out


def _assemble_rdms(gamma, corr, ncas):
    gamma = gamma.reshape(ncas, ncas)
    corr = corr.reshape(ncas, ncas, ncas, ncas)
    epq_ers = jnp.transpose(corr, (1, 0, 2, 3))
    delta = jnp.eye(ncas, dtype=gamma.dtype)
    Gamma = epq_ers - jnp.einsum("qr,ps->pqrs", delta, gamma)
    return gamma, Gamma


# ---- hosted RDMs ----------------------------------------------------------


def _rdms_segment(psig, srcA_s, sgnA_s, tA_s, rows_s, srcB, sgnB, tB,
                  gamma, corr):
    """One segment of the rdms_rows scan: same body as
    ops/grid.rdms_rows, accumulators carried ACROSS dispatches.  The
    accumulators are f64 regardless of the state dtype (an f32 state —
    the mixed-precision hosted gradient pass — keeps its chunk grams
    f32 on the MXU but accumulates them losslessly)."""

    def body(carry, xs):
        g, c = carry
        srcA_k, sgnA_k, tA_k, rows_k = xs
        phi_c = _phi_chunk_t(psig, rows_k, srcA_k, sgnA_k, tA_k,
                             srcB, sgnB, tB).reshape(srcA_k.shape[0], -1)
        bra_c = jnp.conj(rows_k).reshape(-1)
        g = g + jnp.real(_rdms.gram_last(phi_c, bra_c))
        c = c + jnp.real(_rdms.gram_last(jnp.conj(phi_c), phi_c))
        return (g, c), None

    with _prec_ctx(psig.dtype):
        (gamma, corr), _ = jax.lax.scan(
            body, (gamma, corr), (srcA_s, sgnA_s, tA_s, rows_s))
    return gamma, corr


def rdms_hosted(psi, gm, ncas, row_chunk=None, seg_chunks=None,
                grid_order=True):
    """(gamma, Gamma) of a sector state, bit-identical math to
    ops/grid.rdms_rows (reference pqc.py:192-218), executed as
    ceil(nchunk/seg_chunks) bounded segment dispatches.

    ``psi`` is a device array in GRID order (pass grid_order=False for
    canonical sorted-determinant order).  Host-driven: must be called
    OUTSIDE jit."""
    dt = psi.dtype
    itemsize = jnp.dtype(dt).itemsize
    if not grid_order:
        psi = _seg_jit("to_grid", _grid.to_grid)(psi, gm)
    n2, Nb = gm.n2, gm.Nb
    if row_chunk is None:
        row_chunk = _grid._row_chunk(1, n2, Nb, itemsize)
    seg = seg_chunks or seg_chunks_default()
    psig = _grid._as_grid2d(psi, gm)
    srcA_c, sgnA_c, tA_c, nchunk, pad = _grid._row_scan_tables(
        gm, row_chunk)
    rows_c = _grid._pad_rows(psig, pad).reshape((nchunk, row_chunk, Nb))
    # f64 accumulators even for an f32 state (mixed hosted pass): the
    # per-chunk grams stay f32, their cross-dispatch sum is exact
    gamma = jnp.zeros((n2,), jnp.float64)
    corr = jnp.zeros((n2, n2), jnp.float64)
    run = _seg_jit("rdms_seg", _rdms_segment)
    for lo in range(0, nchunk, seg):
        hi = min(nchunk, lo + seg)
        gamma, corr = run(psig, srcA_c[lo:hi], sgnA_c[lo:hi],
                          tA_c[lo:hi], rows_c[lo:hi],
                          gm.srcB, gm.sgnB, gm.tB, gamma, corr)
    # tiny eager assembly (a handful of ncas^4-element ops)
    return _assemble_rdms(gamma, corr, ncas)


# ---- hosted Hamiltonian apply ----------------------------------------------


def _ham_segment(xg, C2, c1f, srcA_s, sgnA_s, tA_s, dstA_s, dsgnA_s,
                 rowidx_s, rows_s, srcB, sgnB, tB, acc):
    """One segment of the scatter-form H-apply: per row chunk, build the
    chunk's Phi, form Y = C2 Phi + c1 x (SOURCE rows), reduce the
    row-local beta half directly and scatter the alpha half through the
    inverse maps into the full-height accumulator (exactly
    parallel/grid_sharded._ham_local with the psum_scatter removed)."""
    dt = xg.dtype
    n2 = C2.shape[0]
    Nb_ = xg.shape[-1]
    rows2 = jnp.arange(n2)[:, None]

    def body(acc, xs):
        srcA_k, sgnA_k, tA_k, dstA_k, dsgnA_k, rowidx_k, rows_k = xs
        phi_c = _phi_chunk_t(xg, rows_k, srcA_k, sgnA_k, tA_k,
                             srcB, sgnB, tB)                # (n2, R, Nb)
        R = phi_c.shape[-2]
        yc = _rdms.small_matmul_free_last(
            C2, phi_c.reshape(n2, R * Nb_)).reshape(n2, R, Nb_)
        yc = yc + c1f[:, None, None] * rows_k[None, :, :]
        # beta half: row-local gather-reduce (grid_sharded._beta_reduce)
        Yt = jnp.swapaxes(yc, -1, -2)                       # (n2, Nb, R)
        Gb = Yt[rows2, srcB, :]
        outBt = jnp.sum(Gb * sgnB.astype(dt)[:, :, None]
                        * tA_k.astype(dt)[:, None, :], axis=0)
        # alpha half: scatter through the inverse maps
        contrib = (yc * dsgnA_k.astype(dt)[:, :, None]
                   * tB.astype(dt)[:, None, :])
        acc = acc.at[dstA_k].add(contrib)
        acc = acc.at[rowidx_k].add(outBt.T)
        return acc, None

    with _prec_ctx(xg.dtype):
        acc, _ = jax.lax.scan(
            body, acc,
            (srcA_s, sgnA_s, tA_s, dstA_s, dsgnA_s, rowidx_s, rows_s))
    return acc


def _ham_rdms_segment(xg, C2, c1f, srcA_s, sgnA_s, tA_s, dstA_s,
                      dsgnA_s, rowidx_s, rows_s, srcB, sgnB, tB, acc,
                      gamma, corr):
    """Fused segment: ONE Phi build per chunk feeds both the
    scatter-form H-apply accumulation and the RDM grams — halves the
    hosted gather traffic of an energy+gradient evaluation, where both
    H|psi> and (gamma, Gamma) of the SAME state are needed."""
    dt = xg.dtype
    n2 = C2.shape[0]
    Nb_ = xg.shape[-1]
    rows2 = jnp.arange(n2)[:, None]

    def body(carry, xs):
        acc, g, c = carry
        srcA_k, sgnA_k, tA_k, dstA_k, dsgnA_k, rowidx_k, rows_k = xs
        phi_c = _phi_chunk_t(xg, rows_k, srcA_k, sgnA_k, tA_k,
                             srcB, sgnB, tB)                # (n2, R, Nb)
        R = phi_c.shape[-2]
        phi_f = phi_c.reshape(n2, R * Nb_)
        # RDM grams (ops/grid.rdms_rows body)
        bra_c = jnp.conj(rows_k).reshape(-1)
        g = g + jnp.real(_rdms.gram_last(phi_f, bra_c))
        c = c + jnp.real(_rdms.gram_last(jnp.conj(phi_f), phi_f))
        # H-apply (scatter form, _ham_segment body)
        yc = _rdms.small_matmul_free_last(C2, phi_f).reshape(n2, R, Nb_)
        yc = yc + c1f[:, None, None] * rows_k[None, :, :]
        Yt = jnp.swapaxes(yc, -1, -2)
        Gb = Yt[rows2, srcB, :]
        outBt = jnp.sum(Gb * sgnB.astype(dt)[:, :, None]
                        * tA_k.astype(dt)[:, None, :], axis=0)
        contrib = (yc * dsgnA_k.astype(dt)[:, :, None]
                   * tB.astype(dt)[:, None, :])
        acc = acc.at[dstA_k].add(contrib)
        acc = acc.at[rowidx_k].add(outBt.T)
        return (acc, g, c), None

    with _prec_ctx(xg.dtype):
        (acc, gamma, corr), _ = jax.lax.scan(
            body, (acc, gamma, corr),
            (srcA_s, sgnA_s, tA_s, dstA_s, dsgnA_s, rowidx_s, rows_s))
    return acc, gamma, corr


def ham_and_rdms_hosted(c1eff, c2, x, gm, ncas, row_chunk=None,
                        seg_chunks=None, grid_order=True):
    """(H|x>, gamma, Gamma) of one sector state with a SINGLE hosted
    full-Phi pass (the gradient pipeline needs all three; running
    ham_apply_hosted + rdms_hosted separately pays the pass twice).
    Values equal the separate drivers exactly (same chunk math)."""
    dt = x.dtype
    itemsize = jnp.dtype(dt).itemsize
    if not grid_order:
        x = _seg_jit("to_grid", _grid.to_grid)(x, gm)
    n2, Na, Nb = gm.n2, gm.Na, gm.Nb
    if row_chunk is None:
        row_chunk = _grid._row_chunk(1, n2, Nb, itemsize)
    seg = seg_chunks or seg_chunks_default()
    xg = _grid._as_grid2d(x, gm)
    srcA_c, sgnA_c, tA_c, nchunk, pad = _grid._row_scan_tables(
        gm, row_chunk)
    Na_pad = nchunk * row_chunk
    rows_c = _grid._pad_rows(xg, pad).reshape((nchunk, row_chunk, Nb))
    dstA_c, dsgnA_c = _chunked_inverse_tables(gm, row_chunk, nchunk, pad)
    rowidx_c = jnp.arange(Na_pad, dtype=jnp.int32).reshape(
        nchunk, row_chunk)
    C2g = c2.reshape(n2, n2).astype(dt)
    c1f = c1eff.reshape(n2).astype(dt)
    # H|x> stays in the state dtype (D-sized; f32 halves its scatter
    # traffic in the mixed pass) — the RDM accumulators are f64 always
    acc = jnp.zeros((Na_pad, Nb), dt)
    gamma = jnp.zeros((n2,), jnp.float64)
    corr = jnp.zeros((n2, n2), jnp.float64)
    run = _seg_jit("hamrdms_seg", _ham_rdms_segment)
    for lo in range(0, nchunk, seg):
        hi = min(nchunk, lo + seg)
        acc, gamma, corr = run(
            xg, C2g, c1f, srcA_c[lo:hi], sgnA_c[lo:hi], tA_c[lo:hi],
            dstA_c[lo:hi], dsgnA_c[lo:hi], rowidx_c[lo:hi],
            rows_c[lo:hi], gm.srcB, gm.sgnB, gm.tB, acc, gamma, corr)
    out = acc[:Na].reshape(-1)
    if not grid_order:
        out = _seg_jit("from_grid", _grid.from_grid)(out, gm)
    g1, G2 = _assemble_rdms(gamma, corr, ncas)
    return out, g1, G2


def _ham_trdms_segment(psig, tg, C2, c1f, srcA_s, sgnA_s, tA_s, dstA_s,
                       dsgnA_s, rowidx_s, rows_p_s, rows_t_s, srcB,
                       sgnB, tB, acc, dgamma, dcorr):
    """Fused per-tangent segment: ONE pass over grid A-row chunks builds
    the Phi chunks of BOTH the state ``psig`` and the tangent ``tg``,
    feeding (a) the scatter-form H-apply of the TANGENT and (b) the
    transition-RDM grams (ops/grid.transition_rdms_rows body) — the two
    large-D ingredients of one per-tangent Hessian row
    (models/oo_pqc._row_streamed), at (16e,16o)+ hosted granularity."""
    dt = tg.dtype
    n2 = C2.shape[0]
    Nb_ = tg.shape[-1]
    rows2 = jnp.arange(n2)[:, None]

    def body(carry, xs):
        acc, dg, dc = carry
        (srcA_k, sgnA_k, tA_k, dstA_k, dsgnA_k, rowidx_k, rp_k,
         rt_k) = xs
        phi_p = _phi_chunk_t(psig, rp_k, srcA_k, sgnA_k, tA_k,
                             srcB, sgnB, tB)                # (n2, R, Nb)
        phi_t = _phi_chunk_t(tg, rt_k, srcA_k, sgnA_k, tA_k,
                             srcB, sgnB, tB)
        R = phi_t.shape[-2]
        pf = phi_p.reshape(n2, R * Nb_)
        tf = phi_t.reshape(n2, R * Nb_)
        # transition grams (transition_rdms_rows body)
        bra_p = jnp.conj(rp_k).reshape(-1)
        bra_t = jnp.conj(rt_k).reshape(-1)
        dg = dg + jnp.real(_rdms.gram_last(tf, bra_p)
                           + _rdms.gram_last(pf, bra_t))
        dc = dc + jnp.real(_rdms.gram_last(jnp.conj(tf), pf)
                           + _rdms.gram_last(jnp.conj(pf), tf))
        # H-apply on the tangent (scatter form, _ham_segment body)
        yc = _rdms.small_matmul_free_last(C2, tf).reshape(n2, R, Nb_)
        yc = yc + c1f[:, None, None] * rt_k[None, :, :]
        Yt = jnp.swapaxes(yc, -1, -2)
        Gb = Yt[rows2, srcB, :]
        outBt = jnp.sum(Gb * sgnB.astype(dt)[:, :, None]
                        * tA_k.astype(dt)[:, None, :], axis=0)
        contrib = (yc * dsgnA_k.astype(dt)[:, :, None]
                   * tB.astype(dt)[:, None, :])
        acc = acc.at[dstA_k].add(contrib)
        acc = acc.at[rowidx_k].add(outBt.T)
        return (acc, dg, dc), None

    with _prec_ctx(tg.dtype):
        (acc, dgamma, dcorr), _ = jax.lax.scan(
            body, (acc, dgamma, dcorr),
            (srcA_s, sgnA_s, tA_s, dstA_s, dsgnA_s, rowidx_s,
             rows_p_s, rows_t_s))
    return acc, dgamma, dcorr


def ham_and_trdms_hosted(c1eff, c2, psi, tpsi, gm, ncas, row_chunk=None,
                         seg_chunks=None, grid_order=True):
    """(H|tpsi>, dgamma, dcorr) for a state/tangent pair with a single
    hosted pass over grid A-row chunks (two Phi builds per chunk — one
    per state — plus the scatter H-apply of the tangent): the per-tangent
    kernel of the hosted quadratic-form Hessian.  dgamma (n2,) and dcorr
    (n2, n2) follow ops/grid.transition_rdms_rows exactly; f64
    accumulators regardless of the state dtype (the mixed pass streams
    f32 states).  Host-driven: call OUTSIDE jit."""
    dt = tpsi.dtype
    itemsize = jnp.dtype(dt).itemsize
    if not grid_order:
        psi = _seg_jit("to_grid", _grid.to_grid)(psi, gm)
        tpsi = _seg_jit("to_grid", _grid.to_grid)(tpsi, gm)
    n2, Na, Nb = gm.n2, gm.Na, gm.Nb
    if row_chunk is None:
        # two Phi chunks live at once -> halve the single-Phi budget
        row_chunk = _grid._row_chunk(2, n2, Nb, itemsize)
    seg = seg_chunks or seg_chunks_default()
    psig = _grid._as_grid2d(psi, gm).astype(dt)
    tg = _grid._as_grid2d(tpsi, gm)
    srcA_c, sgnA_c, tA_c, nchunk, pad = _grid._row_scan_tables(
        gm, row_chunk)
    Na_pad = nchunk * row_chunk
    rows_p = _grid._pad_rows(psig, pad).reshape((nchunk, row_chunk, Nb))
    rows_t = _grid._pad_rows(tg, pad).reshape((nchunk, row_chunk, Nb))
    dstA_c, dsgnA_c = _chunked_inverse_tables(gm, row_chunk, nchunk, pad)
    rowidx_c = jnp.arange(Na_pad, dtype=jnp.int32).reshape(
        nchunk, row_chunk)
    C2g = c2.reshape(n2, n2).astype(dt)
    c1f = c1eff.reshape(n2).astype(dt)
    acc = jnp.zeros((Na_pad, Nb), dt)
    dgamma = jnp.zeros((n2,), jnp.float64)
    dcorr = jnp.zeros((n2, n2), jnp.float64)
    run = _seg_jit("hamtrdms_seg", _ham_trdms_segment)
    for lo in range(0, nchunk, seg):
        hi = min(nchunk, lo + seg)
        acc, dgamma, dcorr = run(
            psig, tg, C2g, c1f, srcA_c[lo:hi], sgnA_c[lo:hi],
            tA_c[lo:hi], dstA_c[lo:hi], dsgnA_c[lo:hi],
            rowidx_c[lo:hi], rows_p[lo:hi], rows_t[lo:hi],
            gm.srcB, gm.sgnB, gm.tB, acc, dgamma, dcorr)
    out = acc[:Na].reshape(-1)
    if not grid_order:
        out = _seg_jit("from_grid", _grid.from_grid)(out, gm)
    return out, dgamma, dcorr


def _cross_segment(states, C2, permT, srcA_s, sgnA_s, tA_s, starts_s,
                   srcB, sgnB, tB, M1, gsmall, cross0):
    """One segment of the multi-state cross sweep: per chunk, the Phi
    chunks of ALL B states feed every Hessian-relevant gram at once —

      M1[a, b]       += sum_p <phi_pT(s_a), (C2 phi(s_b))_p>
      gsmall[a, b, p] += <s_a, phi_p(s_b)>
      cross0[b, p, q] += <phi_p(s_0), phi_q(s_b)>

    so that <s_a|H|s_b> = M1[a,b] + sum_p c1f_p gsmall[a,b,p] (H-apply
    NEVER runs for the tangent states — the 4x-cheaper phi+gram pass
    replaces the scatter-form pass per tangent), the cc Hessian block,
    the circuit gradient, psi's RDMs (b = 0 rows of gsmall/cross0) and
    the oc transition RDMs all read off the same accumulators.
    E_p^T = E_pT (the pair transpose) turns every bra-side operator
    application into a phi the sweep already built.

    ``states`` is a TUPLE of B separate (Na_pad, Nb) padded grids — NOT
    one fused (Na_pad, B*Nb) buffer: per-state narrow row gathers are
    the shape the TPU gather lowering handles with zero temps, while
    every wide/fused variant measured 6.7-9.3 GB of gather/slice temps
    at (16e,16o) (B*Nb-wide rows split internally; column-band slices
    materialize)."""
    B = len(states)
    Nb = tB.shape[1]

    def body(carry, xs):
        M1_, gs_, c0_ = carry
        srcA_k, sgnA_k, tA_k, r0 = xs
        n2 = srcA_k.shape[0]
        R = srcA_k.shape[-1]
        z = jnp.zeros((), dtype=r0.dtype)
        rows_l, phi_l = [], []
        for b in range(B):
            rows_b = jax.lax.dynamic_slice(states[b], (r0, z), (R, Nb))
            rows_l.append(rows_b)
            phi_l.append(_phi_chunk_t(states[b], rows_b, srcA_k, sgnA_k,
                                      tA_k, srcB, sgnB, tB))
        phi = jnp.stack(phi_l, axis=2)               # (n2, R, B, Nb)
        rows_k = jnp.stack(rows_l, axis=1)           # (R, B, Nb)
        W = jnp.einsum("pq,qrbn->prbn", C2, phi)
        phiT = phi[permT]
        M1_ = M1_ + jnp.einsum("pran,prbn->ab", jnp.conj(phiT), W)
        gs_ = gs_ + jnp.einsum("ran,prbn->abp", jnp.conj(rows_k), phi)
        c0_ = c0_ + jnp.einsum("prn,qrbn->bpq",
                               jnp.conj(phi[:, :, 0, :]), phi)
        return (M1_, gs_, c0_), None

    with _prec_ctx(states[0].dtype):
        (M1, gsmall, cross0), _ = jax.lax.scan(
            body, (M1, gsmall, cross0),
            (srcA_s, sgnA_s, tA_s, starts_s))
    return M1, gsmall, cross0


def cross_stack_spec(gm, B, dtype, row_chunk=None):
    """(row_chunk, Na_pad) for the cross sweep: states enter as B
    separate (Na_pad, Nb) zero-padded grids (pad rows contribute
    exactly nothing — the scan tables carry sign 0 there)."""
    itemsize = jnp.dtype(dtype).itemsize
    # ~4 live (n2, R, B, Nb) chunk blocks
    if row_chunk is None:
        row_chunk = _grid._row_chunk(4 * B, gm.n2, gm.Nb, itemsize)
    nchunk = -(-gm.Na // row_chunk)
    return row_chunk, nchunk * row_chunk


def cross_hosted(states, c2, gm, ncas, row_chunk=None, seg_chunks=None):
    """Hosted multi-state cross sweep over B GRID-ordered states
    (state 0 = psi, states 1.. = tangent columns); ``states`` is a
    sequence of flat (D,) device arrays (or a (B, D) array).

    Returns f64 accumulators:
      M1     (B, B)        sum_p <phi_pT(s_a), (C2 phi(s_b))_p>
      gsmall (B, B, n2)    <s_a, phi_p(s_b)>
      cross0 (B, n2, n2)   <phi_p(s_0), phi_q(s_b)>

    With c1f = c1eff.reshape(n2): <s_a|H|s_b> = M1[a,b] +
    c1f @ gsmall[a,b] — the quadratic-form Hessian's term1, the circuit
    gradient (2<J_i|H psi>), e0, psi's RDMs (gamma = gsmall[0,0],
    corr = cross0[0]) and the oc transition RDMs
    (dcorr_i = cross0[i] + cross0[i].T) in ONE pass whose per-state
    cost is a phi build + MXU grams (measured 4x cheaper than the
    scatter-form H-apply pass it replaces, BASELINE.md round 5).
    Host-driven: call OUTSIDE jit."""
    states = [jnp.asarray(x) for x in states]
    dt = states[0].dtype
    B = len(states)
    n2, Nb = gm.n2, gm.Nb
    row_chunk, Na_pad = cross_stack_spec(gm, B, dt, row_chunk)
    pad = Na_pad - gm.Na

    # per-state padded grids (pad rows zero); one small dispatch each
    def to_padded(x):
        xg = x.reshape(gm.Na, Nb)
        if pad:
            xg = jnp.pad(xg, ((0, pad), (0, 0)))
        return xg
    states = tuple(to_padded(x) for x in states)
    srcA_c, sgnA_c, tA_c, nchunk, _ = _grid._row_scan_tables(
        gm, row_chunk)
    starts_c = jnp.arange(nchunk, dtype=jnp.int32) * row_chunk
    # XLA pipelines/hoists the per-chunk gathers across the scan, so
    # the scan length is capped to keep the hoisted chunk blocks
    # ~1.5 GB; small sectors keep the long scans
    chunk_bytes = n2 * row_chunk * B * Nb * jnp.dtype(dt).itemsize
    seg = seg_chunks or max(1, min(seg_chunks_default(),
                                   int(1.5e9 // max(1, chunk_bytes))))
    permT = jnp.asarray(
        np.arange(n2).reshape(ncas, ncas).T.reshape(-1), jnp.int32)
    C2g = c2.reshape(n2, n2).astype(dt)
    M1 = jnp.zeros((B, B), jnp.float64)
    gsmall = jnp.zeros((B, B, n2), jnp.float64)
    cross0 = jnp.zeros((B, n2, n2), jnp.float64)
    run = _seg_jit("cross_seg", _cross_segment)
    for lo in range(0, nchunk, seg):
        hi = min(nchunk, lo + seg)
        M1, gsmall, cross0 = run(
            states, C2g, permT, srcA_c[lo:hi], sgnA_c[lo:hi],
            tA_c[lo:hi], starts_c[lo:hi], gm.srcB, gm.sgnB, gm.tB,
            M1, gsmall, cross0)
    return M1, gsmall, cross0


def ham_apply_hosted(c1eff, c2, x, gm, row_chunk=None, seg_chunks=None,
                     grid_order=True):
    """H|x> (without the c0 constant) for a string-grid sector state,
    equal to ops/hamiltonian.ham_apply, executed as bounded segment
    dispatches with ONE full-Phi pass of total gather traffic (the
    pair-blocked in-jit form pays n2 passes once a single Y row
    outgrows its budget — D >= ~40M f64).  Host-driven: call OUTSIDE
    jit.  ``x``: (D,) grid-ordered (grid_order=False for canonical)."""
    dt = x.dtype
    itemsize = jnp.dtype(dt).itemsize
    if not grid_order:
        x = _seg_jit("to_grid", _grid.to_grid)(x, gm)
    n2, Na, Nb = gm.n2, gm.Na, gm.Nb
    if row_chunk is None:
        row_chunk = _grid._row_chunk(1, n2, Nb, itemsize)
    seg = seg_chunks or seg_chunks_default()
    xg = _grid._as_grid2d(x, gm)
    srcA_c, sgnA_c, tA_c, nchunk, pad = _grid._row_scan_tables(
        gm, row_chunk)
    Na_pad = nchunk * row_chunk
    rows_c = _grid._pad_rows(xg, pad).reshape((nchunk, row_chunk, Nb))
    dstA_c, dsgnA_c = _chunked_inverse_tables(gm, row_chunk, nchunk, pad)
    rowidx_c = jnp.arange(Na_pad, dtype=jnp.int32).reshape(
        nchunk, row_chunk)
    C2g = c2.reshape(n2, n2).astype(dt)
    c1f = c1eff.reshape(n2).astype(dt)
    acc = jnp.zeros((Na_pad, Nb), dt)
    run = _seg_jit("ham_seg", _ham_segment)
    for lo in range(0, nchunk, seg):
        hi = min(nchunk, lo + seg)
        acc = run(xg, C2g, c1f, srcA_c[lo:hi], sgnA_c[lo:hi],
                  tA_c[lo:hi], dstA_c[lo:hi], dsgnA_c[lo:hi],
                  rowidx_c[lo:hi], rows_c[lo:hi],
                  gm.srcB, gm.sgnB, gm.tB, acc)
    out = acc[:Na].reshape(-1)      # eager row slice, one small dispatch
    if not grid_order:
        out = _seg_jit("from_grid", _grid.from_grid)(out, gm)
    return out
