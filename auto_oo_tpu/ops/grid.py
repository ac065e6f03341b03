"""String-factorized sector E_pq kernels (Knowles-Handy style) for TPU.

The (n_alpha, n_beta) sector basis is a product of alpha and beta
occupation-string lists: every determinant is A_i | B_j.  Laid out as an
(Na, Nb) STRING GRID, the spin components of E_pq act one-sidedly:

  (E_pq^alpha x)[i, j] = sgnA[pq, i] * tB[pq, j] * x[srcA[pq, i], j]
  (E_pq^beta  x)[i, j] = tA[pq, i] * sgnB[pq, j] * x[i, srcB[pq, j]]

i.e. a ROW gather (alpha) and a row gather of the transpose (beta),
with rank-1 sign corrections: the Jordan-Wigner parity of a same-spin
excitation factorizes exactly into a same-spin part (sgn) and an
other-spin part (t = (-1)^{# other-spin electrons between the two
modes}), because the parity counts alpha and beta occupations
independently.

This replaces the flat per-determinant gather maps of
simulator/sector.sector_epq_maps on the hot paths.  Measured on chip at
(10e,10o)-sector shapes (scripts/microbench_gather.py): the Phi build
is 2.3-4x faster and the sum_pq E_pq Y reduction of the
Hamiltonian-apply kernel 18-22x faster than the flat element gathers,
at 500x less map memory ((n2, Na) tables instead of (2, n2, D)).

Layout contract: every kernel here treats statevectors as GRID-ordered
flat vectors — index g = i * Nb + j for determinant A_i | B_j — NOT the
canonical ascending determinant order of fermion.sector_basis.
``to_grid`` / ``from_grid`` convert (one cheap permutation per vector);
grams and dot products are order-invariant as long as both operands use
the same order, so the quadratic-form Newton core converts psi and J
once per iteration and stays in grid order throughout
(models/oo_pqc.py).

No reference counterpart: the reference simulated the full 2^(2 ncas)
space through PennyLane (reference pqc.py:131-162); the string grid is
the TPU-native redesign of its sector-restricted workload.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import fermion


class GridMaps(NamedTuple):
    """String-factorized E_pq maps over the (Na, Nb) sector grid.

    srcA/sgnA: (n2, Na) alpha-string source ranks / signs (0 = invalid)
    tB:        (n2, Nb) beta parity correction for the ALPHA component
    srcB/sgnB: (n2, Nb) beta-string source ranks / signs
    tA:        (n2, Na) alpha parity correction for the BETA component
    g2s:       (Ds,) grid rank -> canonical (sorted) rank permutation:
               x_grid = x_sorted[g2s]
    s2g:       (Ds,) inverse: x_sorted = x_grid[s2g]
    """

    srcA: jnp.ndarray
    sgnA: jnp.ndarray
    tB: jnp.ndarray
    srcB: jnp.ndarray
    sgnB: jnp.ndarray
    tA: jnp.ndarray
    g2s: jnp.ndarray
    s2g: jnp.ndarray

    @property
    def n2(self):
        return self.srcA.shape[0]

    @property
    def Na(self):
        return self.srcA.shape[1]

    @property
    def Nb(self):
        return self.srcB.shape[1]

    @property
    def dim(self):
        return self.g2s.shape[0]


def spin_strings(ncas, n_occ, spin, up_then_down=False):
    """Ascending occupation strings of one spin: integers with bits only
    at that spin's mode positions (big-endian full-space convention of
    ops/fermion.py)."""
    from itertools import combinations

    nm = 2 * ncas
    out = np.fromiter(
        (sum(1 << (nm - 1 - fermion.mode_of(p, spin, ncas, up_then_down))
             for p in occ)
         for occ in combinations(range(ncas), n_occ)),
        dtype=np.int64)
    if not out.size:
        out = np.zeros(1, dtype=np.int64)
    return np.sort(out)


def _one_spin_maps(ncas, strings, spin, up_then_down):
    """(src, sgn) over one spin's string list for all ncas^2 (p, q):
    same conventions as simulator/sector.sector_epq_maps, restricted to
    the strings of the acting spin."""
    nm = 2 * ncas
    n2 = ncas * ncas
    N = strings.size
    src = np.zeros((n2, N), dtype=np.int32)
    sgn = np.zeros((n2, N), dtype=np.int8)
    idx = np.arange(N, dtype=np.int64)
    for p in range(ncas):
        for q in range(ncas):
            k = p * ncas + q
            P = fermion.mode_of(p, spin, ncas, up_then_down)
            Q = fermion.mode_of(q, spin, ncas, up_then_down)
            if P == Q:
                src[k] = idx
                sgn[k] = fermion.occ_bit(strings, P, nm)
                continue
            bitP = 1 << (nm - 1 - P)
            bitQ = 1 << (nm - 1 - Q)
            valid = ((strings & bitP) != 0) & ((strings & bitQ) == 0)
            source = np.where(valid, strings ^ bitP ^ bitQ, strings[0])
            sq = fermion._parity_below(source, Q, nm)
            sp = fermion._parity_below(source ^ (valid * bitQ), P, nm)
            pos = np.searchsorted(strings, source)
            assert np.all(strings[pos[valid]] == source[valid])
            src[k] = np.where(valid, pos, 0)
            sgn[k] = np.where(valid, sq * sp, 0)
    return src, sgn


def _cross_parity(ncas, strings, spin, up_then_down):
    """t[pq, j] = (-1)^{# `spin`-electrons of string j strictly between
    the two modes of pair pq of the OTHER spin} — the rank-1 other-spin
    factor of the Jordan-Wigner parity."""
    nm = 2 * ncas
    n2 = ncas * ncas
    other = 1 - spin
    t = np.ones((n2, strings.size), dtype=np.int8)
    for p in range(ncas):
        for q in range(ncas):
            if p == q:
                continue
            k = p * ncas + q
            P = fermion.mode_of(p, other, ncas, up_then_down)
            Q = fermion.mode_of(q, other, ncas, up_then_down)
            t[k] = (fermion._parity_below(strings, Q, nm)
                    * fermion._parity_below(strings, P, nm))
    return t


def grid_perms(ncas, nelecas, up_then_down=False):
    """Host-side (numpy) string lists and grid<->canonical permutations:
    (A, B, g2s, s2g) with x_grid = x_sorted[g2s], x_sorted = x_grid[s2g].
    Kept in numpy so constructors never round-trip device arrays (a
    single device->host fetch costs ~1 s/MB over the tunneled link)."""
    if isinstance(nelecas, (tuple, list)):
        na, nb = int(nelecas[0]), int(nelecas[1])
    else:
        nb = int(nelecas) // 2
        na = int(nelecas) - nb
    A = spin_strings(ncas, na, 0, up_then_down)
    B = spin_strings(ncas, nb, 1, up_then_down)
    grid_dets = (A[:, None] | B[None, :]).ravel()
    # order[r] = grid rank of the r-th smallest determinant, so
    # x_sorted[r] = x_grid[order[r]] (s2g = order) and g2s is its
    # inverse: g2s[g] = sorted rank of grid det g
    order = np.argsort(grid_dets, kind="stable")
    g2s = np.empty(order.size, dtype=np.int32)
    g2s[order] = np.arange(order.size, dtype=np.int32)
    s2g = order.astype(np.int32)
    return A, B, g2s, s2g


def build_grid_maps(ncas, nelecas, up_then_down=False):
    """GridMaps for the (n_alpha, n_beta) sector of ncas spatial
    orbitals.  O(ncas^2 (Na + Nb) + Ds log Ds) host work — hundreds of
    times cheaper than the flat (2, n2, Ds) tables at large sectors."""
    A, B, g2s, s2g = grid_perms(ncas, nelecas, up_then_down)
    srcA, sgnA = _one_spin_maps(ncas, A, 0, up_then_down)
    srcB, sgnB = _one_spin_maps(ncas, B, 1, up_then_down)
    tB = _cross_parity(ncas, B, 1, up_then_down)
    tA = _cross_parity(ncas, A, 0, up_then_down)
    return GridMaps(
        srcA=jnp.asarray(srcA), sgnA=jnp.asarray(sgnA),
        tB=jnp.asarray(tB), srcB=jnp.asarray(srcB),
        sgnB=jnp.asarray(sgnB), tA=jnp.asarray(tA),
        g2s=jnp.asarray(g2s), s2g=jnp.asarray(s2g))


def to_grid(x, gm):
    """Canonical (ascending-determinant) order -> grid order, last axis."""
    return x[..., gm.g2s]


def from_grid(x, gm):
    """Grid order -> canonical order, last axis."""
    return x[..., gm.s2g]


def _as_grid2d(x, gm):
    return x.reshape(x.shape[:-1] + (gm.Na, gm.Nb))


_INV_ALPHA_CACHE = {}


def inverse_alpha_maps(gm):
    """Host inverse of the alpha E_pq row maps: dst[k, m] = the output
    row that reads source row m for pair k (with its sign), 0/0 where no
    output row does.  Exists because each pair's row map is a partial
    injection (an excitation bijects occupation subsets).  Consumed by
    the scatter-form Hamiltonian applies (parallel/grid_sharded and the
    host-segmented ops/grid_hosted).

    Memoized per maps identity: the device->host fetch of srcA/sgnA
    costs ~1 s/MB over the tunneled link (13 MB at (16e,16o)) and was
    re-paid on every hosted H-apply call."""
    key = id(gm.srcA)
    hit = _INV_ALPHA_CACHE.get(key)
    if hit is not None:
        return hit
    srcA = np.asarray(gm.srcA)
    sgnA = np.asarray(gm.sgnA)
    dst = np.zeros_like(srcA)
    dsg = np.zeros_like(sgnA)
    ks, iis = np.nonzero(sgnA != 0)
    dst[ks, srcA[ks, iis]] = iis
    dsg[ks, srcA[ks, iis]] = sgnA[ks, iis]
    _INV_ALPHA_CACHE[key] = (dst, dsg)
    return dst, dsg


def _pallas_dispatch(dtype):
    """True when the pallas DMA-gather kernels should take this op:
    opted in via config and an f32 operand (the kernels are f32-only).
    On CPU they run interpreted — correct but slow, useful only for
    pinning the dispatch path in tests."""
    from .. import config

    return config.pallas_enabled() and jnp.dtype(dtype) == jnp.float32


def _pallas_interpret():
    import jax as _jax

    return _jax.default_backend() == "cpu"


def phi_all(x, gm, spin=None, full_pairs=True):
    """Phi[..., pq, :] = E_pq x for all ncas^2 pairs; x and the result
    are GRID-ordered flat vectors ((..., Ds) -> (..., n2, Ds)).

    ``spin`` restricts to one spin component (for unrestricted 1-RDMs);
    None sums both.  ``full_pairs=False`` marks pair_slice'd maps (the
    streamed kernels): the pallas path then derives its VJP from the XLA
    kernels instead of the pair-transpose identity, which only holds for
    the full square pair set."""
    if spin is None and _pallas_dispatch(x.dtype):
        from .pallas_grid import phi_all_pallas

        return phi_all_pallas(x, gm, interpret=_pallas_interpret(),
                              full_pairs=full_pairs)
    if _mm_dispatch(x.dtype, gm):
        return _phi_all_mm(x, gm, spin)
    return _phi_all_xla(x, gm, spin)


def _phi_all_xla(x, gm, spin=None):
    """XLA gather implementation of phi_all (also the adjoint oracle for
    the pallas path on sliced maps)."""
    xg = _as_grid2d(x, gm)
    dt = x.dtype
    parts = []
    if spin in (None, 0):
        pa = (xg[..., gm.srcA, :]
              * gm.sgnA.astype(dt)[:, :, None]
              * gm.tB.astype(dt)[:, None, :])
        parts.append(pa)
    if spin in (None, 1):
        xt = jnp.swapaxes(xg, -1, -2)
        pb = (xt[..., gm.srcB, :]
              * gm.sgnB.astype(dt)[:, :, None]
              * gm.tA.astype(dt)[:, None, :])
        parts.append(jnp.swapaxes(pb, -1, -2))
    phi = parts[0] if len(parts) == 1 else parts[0] + parts[1]
    return phi.reshape(x.shape[:-1] + (gm.n2, gm.dim))


# ---- matmul-form kernels -------------------------------------------------
# The per-pair gathers above run at the random-row-access floor of the
# memory system (~90-125 ns/row on chip regardless of mechanism —
# BASELINE.md round-4 fifth phase); the beta components additionally pay
# two (n2, Na, Nb) transposes that dominate the measured phi_all.  But
# each one-spin E_pq component is a LINEAR map on its own string axis,
# so it has a dense matrix: Ea[k, i', i] = sgnA[k, i'] [i == srcA[k, i']]
# of shape (n2, Na, Na) — 492 MB f32 at ncas = 12 — and the whole Phi
# build / sum_pq reduction become batched matmuls on the MXU with the
# Jordan-Wigner cross-parity (tB/tA) as rank-1 elementwise scales:
#
#   Phi_a       = einsum('kab,...bj->...kaj', Ea, X) * tB[:, None, :]
#   Phi_b       = einsum('...ij,kuj->...kiu', X, Eb) * tA[:, :, None]
#   sum E_pq Y  = einsum('kab,...kbj->...aj', Ea, Y * tB)
#               + einsum('...kij,kuj->...iu', Y * tA, Eb)
#
# 2 n2 Na^2 Nb + 2 n2 Na Nb^2 FLOPs per op (~0.46 TFLOP at ncas = 12)
# in exchange for ZERO gathers — exact because every output element of
# the Phi matmuls is a 1-sparse dot (one nonzero product plus zeros).
# Gated to f32 operands (the f64 dot emulation's ~8x operand expansion
# would blow the dense tensors up to ~4 GB) and to sectors whose dense
# tensors fit _MM_BYTES per spin; the (14e,14o)+ row-streamed kernels
# keep the gathers (there the matmul FLOPs grow an extra factor Na).
#
# MEASURED ON CHIP (v5e, scripts/microbench_gridmm.py, (12e,12o) f32):
# at the 3-pass-bf16 "float32" matmul precision the production mixed
# path requires, mm LOSES to the row gathers — phi 37.0 vs 25.6 ms
# (0.69x), epq_sum 40.8 vs 33.5 ms (0.82x), batched ham_apply ties;
# the single-pass bf16 form ties/wins slightly (1.0-1.3x) but its
# 1e-2-level error is unusable for Newton Hessian blocks.  The row
# gathers already run near the random-row-access floor, and the MXU
# recast pays the same HBM traffic on the 492 MB dense operands plus
# the extra passes.  Shipped OFF by default (config.set_grid_mm) as a
# documented negative result, mirroring the pallas kernels' story.

_MM_BYTES = 700 << 20


def _mm_dispatch(dtype, gm):
    from .. import config

    mode = config.grid_mm_mode()
    if mode == "off" or jnp.dtype(dtype) != jnp.float32:
        return False
    if mode == "on":
        return True
    per_spin = gm.n2 * max(gm.Na * gm.Na, gm.Nb * gm.Nb) * 4
    return per_spin <= _MM_BYTES


def _ea_dense(src, sgn, N, dt):
    """Dense one-spin operator tensor (n2, N_out, N_in) scattered from
    the (n2, N_out) string maps; each (k, row) writes exactly one cell,
    so invalid entries (sgn 0) contribute zero rows."""
    n2, No = src.shape
    k = jnp.arange(n2)[:, None]
    r = jnp.arange(No)[None, :]
    return jnp.zeros((n2, No, N), dtype=dt).at[k, r, src].set(
        sgn.astype(dt))


def _phi_all_mm(x, gm, spin=None):
    """Matmul-form phi_all (bitwise-equal nonzero structure to the
    gather form; see the block comment above)."""
    xg = _as_grid2d(x, gm)
    dt = x.dtype
    parts = []
    if spin in (None, 0):
        Ea = _ea_dense(gm.srcA, gm.sgnA, gm.Na, dt)
        pa = jnp.einsum("kab,...bj->...kaj", Ea, xg)
        parts.append(pa * gm.tB.astype(dt)[:, None, :])
    if spin in (None, 1):
        Eb = _ea_dense(gm.srcB, gm.sgnB, gm.Nb, dt)
        pb = jnp.einsum("...ij,kuj->...kiu", xg, Eb)
        parts.append(pb * gm.tA.astype(dt)[:, :, None])
    phi = parts[0] if len(parts) == 1 else parts[0] + parts[1]
    return phi.reshape(x.shape[:-1] + (phi.shape[-3], gm.dim))


def _epq_sum_mm(Y, gm):
    """Matmul-form epq_sum: fold the rank-1 parities into Y, then one
    (k, string)-contracted matmul per spin."""
    Yg = Y.reshape(Y.shape[:-1] + (gm.Na, gm.Nb))
    dt = Y.dtype
    Ea = _ea_dense(gm.srcA, gm.sgnA, gm.Na, dt)
    Eb = _ea_dense(gm.srcB, gm.sgnB, gm.Nb, dt)
    outA = jnp.einsum("kab,...kbj->...aj",
                      Ea, Yg * gm.tB.astype(dt)[:, None, :])
    outB = jnp.einsum("...kij,kuj->...iu",
                      Yg * gm.tA.astype(dt)[:, :, None], Eb)
    return (outA + outB).reshape(Y.shape[:-2] + (gm.dim,))


def pair_slice(gm, lo, hi):
    """GridMaps restricted to pair rows [lo, hi) — the kernels read n2
    from the table shapes, so the sliced maps drive the same code on a
    subset of pairs (static slice bounds; free at trace time)."""
    return GridMaps(srcA=gm.srcA[lo:hi], sgnA=gm.sgnA[lo:hi],
                    tB=gm.tB[lo:hi], srcB=gm.srcB[lo:hi],
                    sgnB=gm.sgnB[lo:hi], tA=gm.tA[lo:hi],
                    g2s=gm.g2s, s2g=gm.s2g)


# a full Phi = E_pq x for all ncas^2 pairs is (n2, D) — 9.2 GB in f32 at
# (14e,14o) (D = 11.78M, n2 = 196), which cannot coexist with the Y
# buffer of the Hamiltonian apply in 15.75 GB HBM.  Above this byte
# budget per materialized pair block, the grid kernels stream the pair
# axis in chunks (python-unrolled static slices; O(n2/chunk) extra
# passes over x).  1 GB keeps two live blocks + the D-sliced gram
# temporaries comfortably inside 15.75 GB HBM at (14e,14o) f64.
_PAIR_CHUNK_BYTES = 1 << 30


def _pair_chunk(B, D, n2, itemsize):
    per_pair = B * D * itemsize
    if n2 * per_pair <= _PAIR_CHUNK_BYTES:
        return n2
    return max(1, int(_PAIR_CHUNK_BYTES // per_pair))


def ham_apply_chunked(c1eff_flat, C2, x, gm, chunk):
    """sum_pq E_pq [sum_rs C2 E_rs + c1eff] x with the pair axis
    streamed: Phi and Y exist only as (B, chunk, D) blocks.  The inner
    Phi blocks are recomputed once per outer chunk (n2/chunk extra
    passes) — the price of never holding a (n2, D) tensor."""
    n2 = gm.n2
    out = jnp.zeros_like(x)
    for lo in range(0, n2, chunk):
        hi = min(n2, lo + chunk)
        Y = c1eff_flat[lo:hi][None, :, None] * x[:, None, :]
        for lo2 in range(0, n2, chunk):
            hi2 = min(n2, lo2 + chunk)
            phi_c = phi_all(x, pair_slice(gm, lo2, hi2),
                            full_pairs=False)
            Y = Y + _rdms_mod().small_matmul_free_last(
                C2[lo:hi, lo2:hi2], phi_c)
        out = out + epq_sum(Y, pair_slice(gm, lo, hi),
                            full_pairs=False)
    return out


def _rdms_mod():
    from . import rdms
    return rdms


def rdms_chunked(psi, gm, ncas, chunk):
    """(gamma, Gamma) of a GRID-ordered state with the pair axis of the
    Phi gram streamed in chunks: peak extra memory is two (chunk, D)
    blocks; Phi blocks are rebuilt O((n2/chunk)^2) times."""
    n2 = gm.n2
    gram = _rdms_mod().gram_last
    bra = jnp.conj(psi)
    gamma_rows = []
    rdt = jnp.zeros((), dtype=psi.dtype).real.dtype
    corr = jnp.zeros((n2, n2), dtype=rdt)
    for lo in range(0, n2, chunk):
        hi = min(n2, lo + chunk)
        phi_a = phi_all(psi, pair_slice(gm, lo, hi), full_pairs=False)
        gamma_rows.append(jnp.real(phi_a @ bra))
        for lo2 in range(0, n2, chunk):
            hi2 = min(n2, lo2 + chunk)
            phi_b = (phi_a if lo2 == lo
                     else phi_all(psi, pair_slice(gm, lo2, hi2),
                                  full_pairs=False))
            blk = jnp.real(gram(jnp.conj(phi_a), phi_b))
            corr = jax.lax.dynamic_update_slice(corr, blk, (lo, lo2))
    gamma = jnp.concatenate(gamma_rows).reshape(ncas, ncas)
    corr = corr.reshape(ncas, ncas, ncas, ncas)
    epq_ers = jnp.transpose(corr, (1, 0, 2, 3))
    delta = jnp.eye(ncas, dtype=gamma.dtype)
    Gamma = epq_ers - jnp.einsum("qr,ps->pqrs", delta, gamma)
    return gamma, Gamma


def phi_rows(x, gm, r0, r1):
    """Phi restricted to grid A-rows [r0, r1): the (..., n2, rows, Nb)
    block of E_pq x for every pair, computed straight from the FULL
    grid-ordered x — each Phi element is produced exactly once.

    Works because both spin components are row-local in their output:
    the alpha part of output row i reads x at row srcA[pq, i] (full x is
    resident — it is only D amplitudes), and the beta part reads columns
    of the SAME row i.  This is what makes D-axis streaming one-pass,
    unlike the pair-axis streaming of ham_apply_chunked which rebuilds
    Phi blocks O(n2/chunk) times."""
    if _pallas_dispatch(x.dtype):
        from .pallas_grid import phi_rows_pallas

        return phi_rows_pallas(x, gm, r0, r1,
                               interpret=_pallas_interpret())
    return _phi_rows_xla(x, gm, r0, r1)


def _phi_rows_xla(x, gm, r0, r1):
    """XLA gather implementation of phi_rows (adjoint oracle for the
    pallas path)."""
    xg = _as_grid2d(x, gm)
    dt = x.dtype
    pa = (xg[..., gm.srcA[:, r0:r1], :]
          * gm.sgnA[:, r0:r1].astype(dt)[:, :, None]
          * gm.tB.astype(dt)[:, None, :])
    xc = xg[..., r0:r1, :]
    # xc[..., i, srcB[pq, j]] -> gather last axis, then put the pair
    # axis in front of the row axis
    pb = jnp.take(xc, gm.srcB, axis=-1)           # (..., rows, n2, Nb)
    pb = jnp.moveaxis(pb, -2, -3)                 # (..., n2, rows, Nb)
    pb = (pb * gm.tA[:, r0:r1].astype(dt)[:, :, None]
          * gm.sgnB.astype(dt)[:, None, :])
    return pa + pb


# HBM ceiling for the row-streamed Hamiltonian apply's pair-blocked Y
# buffers (Phi never materializes).  The call site (ops/hamiltonian.py)
# sizes pair blocks to ~1/5 of this: the scan-stacked Ys, their
# moveaxis+reshape copy and epq_sum's gather/transpose temporaries are
# each block-sized, so ~5 block-sized buffers are live at peak.
_Y_BUDGET_BYTES = 10 << 30


def _row_chunk(B, n2, Nb, itemsize):
    per_row = B * n2 * Nb * itemsize
    return max(1, int(_PAIR_CHUNK_BYTES // max(1, per_row)))


_ROW_SCAN_CACHE = {}


def _row_scan_tables(gm, row_chunk):
    """Per-chunk xs for a lax.scan over grid A-row chunks: the row axis
    is padded to a multiple of ``row_chunk`` using the grid-map invalid-
    entry convention (src 0 / sgn 0 / t 0 — pad rows contribute exactly
    zero), then each table is reshaped to (nchunk, n2, L).

    Memoized per (maps identity, row_chunk): the hosted drivers call
    this once per PASS, and re-dispatching the pad/reshape programs
    under (16e,16o)-scale heap pressure was measured to race pending
    async frees into transient RESOURCE_EXHAUSTED."""
    key = (id(gm.srcA), int(row_chunk))
    hit = _ROW_SCAN_CACHE.get(key)
    if hit is not None:
        return hit
    out = _row_scan_tables_impl(gm, row_chunk)
    _ROW_SCAN_CACHE[key] = out
    return out


def _row_scan_tables_impl(gm, row_chunk):
    n2, Na = gm.srcA.shape
    nchunk = -(-Na // row_chunk)
    pad = nchunk * row_chunk - Na
    def padded(a, fill):
        return jnp.pad(a, ((0, 0), (0, pad)), constant_values=fill)
    srcA = padded(gm.srcA, 0).reshape(n2, nchunk, row_chunk)
    sgnA = padded(gm.sgnA, 0).reshape(n2, nchunk, row_chunk)
    tA = padded(gm.tA, 0).reshape(n2, nchunk, row_chunk)
    return (jnp.swapaxes(srcA, 0, 1), jnp.swapaxes(sgnA, 0, 1),
            jnp.swapaxes(tA, 0, 1), nchunk, pad)


def _pad_rows(xg, pad):
    """Zero-pad the grid A-row axis (second-to-last) by ``pad`` rows."""
    if pad == 0:
        return xg
    widths = [(0, 0)] * (xg.ndim - 2) + [(0, pad), (0, 0)]
    return jnp.pad(xg, widths)


def _phi_chunk(xg, rows_k, srcA_k, sgnA_k, tA_k, gm, dt):
    """One row chunk of Phi from chunked tables: alpha gathers rows of
    the FULL resident grid state, beta lane-gathers within the chunk's
    own rows (exactly _phi_rows_xla with traced table slices, so it is
    legal inside lax.scan).  Dispatches to the pallas gather kernels
    under the same conditions as phi_rows."""
    if _pallas_dispatch(dt):
        from .pallas_grid import gather_rows_scaled, _f32

        interp = _pallas_interpret()
        pa = gather_rows_scaled(xg, srcA_k, _f32(sgnA_k), _f32(gm.tB),
                                interpret=interp)
        pb = gather_rows_scaled(jnp.swapaxes(rows_k, -1, -2), gm.srcB,
                                _f32(gm.sgnB), _f32(tA_k),
                                interpret=interp)
        return pa + jnp.swapaxes(pb, -1, -2)
    pa = (jnp.take(xg, srcA_k, axis=-2)
          * sgnA_k.astype(dt)[:, :, None] * gm.tB.astype(dt)[:, None, :])
    pb = jnp.take(rows_k, gm.srcB, axis=-1)       # (..., rows, n2, Nb)
    pb = jnp.moveaxis(pb, -2, -3)                 # (..., n2, rows, Nb)
    pb = (pb * tA_k.astype(dt)[:, :, None]
          * gm.sgnB.astype(dt)[:, None, :])
    return pa + pb


def ham_apply_rows(c1eff_flat, C2, x, gm, row_chunk, pair_block=None):
    """sum_pq E_pq [sum_rs C2 E_rs + c1eff] x with Phi streamed over
    grid A-rows: each Phi block is built once per pair block and
    contracted immediately on the MXU, so the gather traffic is
    ceil(n2/pair_block) full-Phi passes (vs O(n2/chunk) for the
    pair-streamed ham_apply_chunked).  Y is materialized only as a
    (..., pair_block, D) buffer; ``pair_block=None`` means all n2 pairs
    (one pass, one full Y).  Callers must size pair_block for ~5 live
    block-sized buffers (see _Y_BUDGET_BYTES); at (14e,14o) f64 that is
    ~21 pairs per block, ~10 Phi passes.

    The row chunks run under lax.scan, NOT a Python loop: an unrolled
    loop lets the XLA scheduler keep every chunk's Phi temp live at
    once (measured 100 GB of HLO temps at (14e,14o) — the demo OOM);
    the scan pins peak extra memory to one in-flight chunk."""
    n2, Na, Nb = gm.n2, gm.Na, gm.Nb
    if pair_block is None:
        pair_block = n2
    xg = _as_grid2d(x, gm)
    C2x = C2.astype(x.dtype)
    c1x = c1eff_flat.astype(x.dtype)
    srcA_c, sgnA_c, tA_c, nchunk, pad = _row_scan_tables(gm, row_chunk)
    xg_p = _pad_rows(xg, pad)
    rows_c = jnp.moveaxis(
        xg_p.reshape(xg.shape[:-2] + (nchunk, row_chunk, Nb)), -3, 0)
    out = jnp.zeros_like(x)
    for lo in range(0, n2, pair_block):
        hi = min(n2, lo + pair_block)

        def body(_, xs, lo=lo, hi=hi):
            srcA_k, sgnA_k, tA_k, rows_k = xs
            phi_c = _phi_chunk(xg, rows_k, srcA_k, sgnA_k, tA_k, gm,
                               x.dtype)
            L = phi_c.shape[-2] * phi_c.shape[-1]
            # small_matmul_free_last, not a raw einsum: slices the large
            # free axis so the f64 emulation's operand expansion stays
            # bounded (see rdms_rows)
            yc = _rdms_mod().small_matmul_free_last(
                C2x[lo:hi], phi_c.reshape(phi_c.shape[:-2] + (L,)))
            y = (yc.reshape(yc.shape[:-1] + phi_c.shape[-2:])
                 + c1x[lo:hi, None, None] * rows_k[..., None, :, :])
            return 0, y

        _, Ys = jax.lax.scan(body, 0, (srcA_c, sgnA_c, tA_c, rows_c))
        # (nchunk, ..., blk, L, Nb) -> (..., blk, Na, Nb) -> (..., blk, D)
        Ys = jnp.moveaxis(Ys, 0, -3)
        Y = Ys.reshape(x.shape[:-1] + (hi - lo, nchunk * row_chunk, Nb))
        Y = Y[..., :Na, :].reshape(x.shape[:-1] + (hi - lo, gm.dim))
        out = out + epq_sum(Y, pair_slice(gm, lo, hi),
                            full_pairs=False)
    return out


def rdms_rows(psi, gm, ncas, row_chunk):
    """(gamma, Gamma) of a GRID-ordered state with Phi streamed over
    grid A-rows: each Phi element is built exactly once and consumed by
    an (n2, L) x (L, n2) MXU gram — peak extra memory one Phi block,
    total gather traffic ONE full-Phi pass (the pair-streamed
    rdms_chunked pays O(n2/chunk) passes).

    The chunks run under lax.scan, NOT a Python loop: an unrolled loop
    lets the XLA scheduler keep every chunk's Phi temp live at once
    (measured 100 GB of HLO temps at (14e,14o) — the demo OOM); the
    scan pins peak extra memory to one in-flight chunk."""
    n2, Na, Nb = gm.n2, gm.Na, gm.Nb
    psig = _as_grid2d(psi, gm)
    rdt = jnp.zeros((), dtype=psi.dtype).real.dtype
    srcA_c, sgnA_c, tA_c, nchunk, pad = _row_scan_tables(gm, row_chunk)
    rows_c = jnp.moveaxis(
        _pad_rows(psig, pad).reshape((nchunk, row_chunk, Nb)), 0, 0)

    def body(carry, xs):
        gamma, corr = carry
        srcA_k, sgnA_k, tA_k, rows_k = xs
        phi_c = _phi_chunk(psig, rows_k, srcA_k, sgnA_k, tA_k, gm,
                           psi.dtype).reshape(n2, -1)
        bra_c = jnp.conj(rows_k).reshape(-1)
        # gram_last, not raw dots: the chunk axis L = row_chunk*Nb is
        # ~683k at (14e,14o), and an unchunked f64 dot's ~8x f32
        # operand expansion is ~4 GB per side (the second demo OOM);
        # gram_last slices L above 2^18 so the expansion stays ~400 MB
        gram = _rdms_mod().gram_last
        gamma = gamma + jnp.real(gram(phi_c, bra_c))
        corr = corr + jnp.real(gram(jnp.conj(phi_c), phi_c))
        return (gamma, corr), None

    (gamma, corr), _ = jax.lax.scan(
        body,
        (jnp.zeros((n2,), dtype=rdt), jnp.zeros((n2, n2), dtype=rdt)),
        (srcA_c, sgnA_c, tA_c, rows_c))
    gamma = gamma.reshape(ncas, ncas)
    corr = corr.reshape(ncas, ncas, ncas, ncas)
    epq_ers = jnp.transpose(corr, (1, 0, 2, 3))
    delta = jnp.eye(ncas, dtype=gamma.dtype)
    Gamma = epq_ers - jnp.einsum("qr,ps->pqrs", delta, gamma)
    return gamma, Gamma


def transition_rdms_rows(psi, tpsi, gm, ncas, row_chunk):
    """Transition-RDM rows of a GRID-ordered state/tangent pair with Phi
    streamed over grid A-rows — the (14e,14o)-scale form of the
    per-tangent Hessian row (models/oo_pqc._row_fused), where a full
    (n2, D) Phi (18.5 GB f64 at D = 11.78M) cannot materialize:

        dgamma[pq]   = Re( (E_pq tpsi)·conj(psi) + (E_pq psi)·conj(tpsi) )
        dcorr[pq,rs] = Re( <E_qp tpsi|E_rs psi> + <E_qp psi|E_rs tpsi> )

    identical pair ordering/conjugation to the dense-phi formulas in
    _row_fused (dgram/dgamma there).  Both Phi chunks are built once per
    A-row chunk and consumed by MXU grams; peak extra memory is two
    (n2, chunk·Nb) blocks, total gather traffic one full-Phi pass per
    state.  Returns (dgamma (n2,), dcorr (n2, n2)), real dtype."""
    n2, Na, Nb = gm.n2, gm.Na, gm.Nb
    psig = _as_grid2d(psi, gm)
    tpsig = _as_grid2d(tpsi, gm)
    rdt = jnp.zeros((), dtype=psi.dtype).real.dtype
    srcA_c, sgnA_c, tA_c, nchunk, pad = _row_scan_tables(gm, row_chunk)
    rows_p = _pad_rows(psig, pad).reshape((nchunk, row_chunk, Nb))
    rows_t = _pad_rows(tpsig, pad).reshape((nchunk, row_chunk, Nb))
    gram = _rdms_mod().gram_last

    def body(carry, xs):
        dgamma, dcorr = carry
        srcA_k, sgnA_k, tA_k, rp_k, rt_k = xs
        phi_p = _phi_chunk(psig, rp_k, srcA_k, sgnA_k, tA_k, gm,
                           psi.dtype).reshape(n2, -1)
        phi_t = _phi_chunk(tpsig, rt_k, srcA_k, sgnA_k, tA_k, gm,
                           tpsi.dtype).reshape(n2, -1)
        bra_p = jnp.conj(rp_k).reshape(-1)
        bra_t = jnp.conj(rt_k).reshape(-1)
        dgamma = dgamma + jnp.real(gram(phi_t, bra_p)
                                   + gram(phi_p, bra_t))
        dcorr = dcorr + jnp.real(gram(jnp.conj(phi_t), phi_p)
                                 + gram(jnp.conj(phi_p), phi_t))
        return (dgamma, dcorr), None

    (dgamma, dcorr), _ = jax.lax.scan(
        body,
        (jnp.zeros((n2,), dtype=rdt), jnp.zeros((n2, n2), dtype=rdt)),
        (srcA_c, sgnA_c, tA_c, rows_p, rows_t))
    return dgamma, dcorr


def epq_sum(Y, gm, full_pairs=True):
    """out = sum_pq E_pq Y[..., pq, :] — the reduction half of the
    Hamiltonian apply.  Y (..., n2, Ds) and the result (..., Ds) are
    grid-ordered.  Per-pair row gathers on the (Na, Nb) grid; 18-22x
    faster on chip than the flat row-specific element gathers.
    ``full_pairs`` as in phi_all."""
    if _pallas_dispatch(Y.dtype):
        from .pallas_grid import epq_sum_pallas

        return epq_sum_pallas(Y, gm, interpret=_pallas_interpret(),
                              full_pairs=full_pairs)
    if _mm_dispatch(Y.dtype, gm):
        return _epq_sum_mm(Y, gm)
    return _epq_sum_xla(Y, gm)


def _epq_sum_xla(Y, gm):
    """XLA gather implementation of epq_sum (adjoint oracle for the
    pallas path on sliced maps)."""
    Yg = Y.reshape(Y.shape[:-1] + (gm.Na, gm.Nb))
    dt = Y.dtype
    rows = jnp.arange(gm.n2)[:, None]
    Ga = Yg[..., rows, gm.srcA, :]
    outA = jnp.sum(Ga * gm.sgnA.astype(dt)[:, :, None]
                   * gm.tB.astype(dt)[:, None, :], axis=-3)
    Yt = jnp.swapaxes(Yg, -1, -2)
    Gb = Yt[..., rows, gm.srcB, :]
    outBt = jnp.sum(Gb * gm.sgnB.astype(dt)[:, :, None]
                    * gm.tA.astype(dt)[:, None, :], axis=-3)
    out = outA + jnp.swapaxes(outBt, -1, -2)
    return out.reshape(Y.shape[:-2] + (gm.dim,))


# ---- spin-lowering (S^-) maps on the string grid ------------------------
# S^2 diagnostics at (14e,14o)+ scale: the flat cross-sector tables of
# simulator/sector.sector_sminus_maps are (ncas, D_target) over the full
# PRODUCT basis — ~10 GB host / ~17 GB device gather traffic at
# (16e,16o) — while S^- = sum_p a^dag_{p,beta} a_{p,alpha} factorizes
# over spin strings exactly like E_pq (reference capability via
# qml.qchem.spin2, active_space.py:243-253, dense-only): the
# Jordan-Wigner sign parity_below(S, P_alpha) * parity_below(S^bit, P_beta)
# splits into an alpha-string factor times a beta-string factor because
# alpha and beta bits are disjoint.  Host cost O(ncas * (Na' + Nb')),
# device cost ncas row+column gathers of the grid state.


class SMinusGridMaps(NamedTuple):
    """Per-orbital string-factorized maps of S^-: sector (na, nb) ->
    (na-1, nb+1).  Target-indexed: for target grid cell (i', j') and
    orbital p, the source cell is (srcAm[p, i'], srcBp[p, j']) with
    sign fA[p, i'] * fB[p, j'] (0 marks an invalid transfer)."""

    srcAm: jnp.ndarray  # (ncas, Na_t) alpha source rank (p annihilated)
    fA: jnp.ndarray     # (ncas, Na_t) alpha sign factor, 0 = invalid
    srcBp: jnp.ndarray  # (ncas, Nb_t) beta source rank (p created)
    fB: jnp.ndarray     # (ncas, Nb_t) beta sign factor, 0 = invalid


def sminus_grid_maps(ncas, nelecas, up_then_down=False):
    """SMinusGridMaps for the (na, nb) sector, or None when S^- is the
    zero map (na = 0 or nb = ncas).  Same splitting convention as
    grid_perms (beta gets the floor)."""
    if isinstance(nelecas, (tuple, list)):
        na, nb = int(nelecas[0]), int(nelecas[1])
    else:
        nb = int(nelecas) // 2
        na = int(nelecas) - nb
    if na - 1 < 0 or nb + 1 > ncas:
        return None
    nm = 2 * ncas
    A = spin_strings(ncas, na, 0, up_then_down)
    At = spin_strings(ncas, na - 1, 0, up_then_down)
    B = spin_strings(ncas, nb, 1, up_then_down)
    Bt = spin_strings(ncas, nb + 1, 1, up_then_down)
    srcAm = np.zeros((ncas, At.size), dtype=np.int32)
    fA = np.zeros((ncas, At.size), dtype=np.int8)
    srcBp = np.zeros((ncas, Bt.size), dtype=np.int32)
    fB = np.zeros((ncas, Bt.size), dtype=np.int8)
    for p in range(ncas):
        Pa = fermion.mode_of(p, 0, ncas, up_then_down)
        Pb = fermion.mode_of(p, 1, ncas, up_then_down)
        bita = 1 << (nm - 1 - Pa)
        bitb = 1 << (nm - 1 - Pb)
        # alpha: target A' lacks p; source A = A' + p.  JW alpha factor:
        # parity_below(A, P_alpha) [annihilation, on the source string]
        # * parity_below(A', P_beta) [creation step sees A' = A - p]
        validA = (At & bita) == 0
        srcA_full = np.where(validA, At | bita, A[0])
        pos = np.minimum(np.searchsorted(A, srcA_full), A.size - 1)
        validA &= A[pos] == srcA_full
        sA = (fermion._parity_below(srcA_full, Pa, nm)
              * fermion._parity_below(At, Pb, nm))
        srcAm[p] = np.where(validA, pos, 0)
        fA[p] = np.where(validA, sA, 0)
        # beta: target B' contains p; source B = B' - p.  JW beta factor:
        # parity_below(B, P_alpha) * parity_below(B, P_beta) (the beta
        # string is B at both steps — only the alpha bit changed between
        # them)
        validB = (Bt & bitb) != 0
        srcB_full = np.where(validB, Bt ^ bitb, B[0])
        posB = np.minimum(np.searchsorted(B, srcB_full), B.size - 1)
        validB &= B[posB] == srcB_full
        sB = (fermion._parity_below(srcB_full, Pa, nm)
              * fermion._parity_below(srcB_full, Pb, nm))
        srcBp[p] = np.where(validB, posB, 0)
        fB[p] = np.where(validB, sB, 0)
    return SMinusGridMaps(
        srcAm=jnp.asarray(srcAm), fA=jnp.asarray(fA),
        srcBp=jnp.asarray(srcBp), fB=jnp.asarray(fB))


def sminus_apply_grid(psi_grid, sm):
    """v = S^- psi on the grid: psi_grid (..., Na, Nb) -> (..., Na', Nb').
    One row gather + one column gather + a rank-1 sign scale per orbital,
    accumulated by lax.scan — peak memory one target-grid buffer."""
    dt = psi_grid.dtype

    def step(acc, maps_p):
        srcA_p, fA_p, srcB_p, fB_p = maps_p
        rows = psi_grid[..., srcA_p, :]
        cell = rows[..., :, srcB_p]
        sgn = (fA_p.astype(dt)[:, None] * fB_p.astype(dt)[None, :])
        return acc + cell * sgn, None

    Na_t = sm.srcAm.shape[1]
    Nb_t = sm.srcBp.shape[1]
    acc0 = jnp.zeros(psi_grid.shape[:-2] + (Na_t, Nb_t), dtype=dt)
    out, _ = jax.lax.scan(step, acc0,
                          (sm.srcAm, sm.fA, sm.srcBp, sm.fB))
    return out


def s2_expectation_grid(psi, gm, sm, nelecas):
    """<S^2> of a grid-sector state via ||S^- psi||^2 + Sz^2 - Sz.
    ``psi`` is CANONICAL (sorted) order — converted here; pass a 2-D
    (Na, Nb) grid array to skip the conversion."""
    if isinstance(nelecas, (tuple, list)):
        na, nb = int(nelecas[0]), int(nelecas[1])
    else:
        nb = int(nelecas) // 2
        na = int(nelecas) - nb
    sz = 0.5 * (na - nb)
    if sm is None:
        return jnp.asarray(sz * sz - sz + 0.0)
    if psi.ndim == 1:
        psi = _as_grid2d(to_grid(psi, gm), gm)
    v = sminus_apply_grid(psi, sm)
    # multiply+reduce, not vdot: the S^- image is 130.9M amplitudes at
    # (16e,16o), where the f64 dot emulation's operand expansion OOMs
    return (jnp.real(_rdms_mod().vdot_big(jnp.conj(v), v))
            + sz * sz - sz)
