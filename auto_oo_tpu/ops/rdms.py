"""RDM extraction kernel (device side, pure JAX) — the TPU centerpiece.

The reference computed gamma_pq = <psi|E_pq|psi> and Gamma_pqrs =
<psi|e_pqrs|psi> with a Python loop over ncas^2 + ncas^4 sparse matvecs
(reference pqc.py:192-218 — its hottest path).  TPU redesign:

1. Build Phi[p,q] = E_pq |psi> for ALL (p,q) at once via a precomputed
   gather map (one vectorized gather-multiply-reduce, VPU work).
2. gamma = Phi @ psi                                   (one matvec)
3. <E_pq E_rs> = <E_qp psi | E_rs psi> = Phi_flat @ Phi_flat^T
                                                        (one MXU matmul)
4. Gamma = that matrix minus the delta_qr gamma_ps contraction term
   (e_pqrs = E_pq E_rs - delta_qr E_ps, reference utils/active_space.py:57).

Everything is a fixed-shape jittable function of psi; gathers
differentiate to scatters so jax.grad / jax.hessian flow through.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from . import fermion


# ---------------------------------------------------------------------------
# On-the-fly E_pq gather maps (table-free).
#
# The precomputed (2, ncas^2, D) src/sign tables cost
# 12 * ncas^2 * 4^ncas bytes — 2.4 GB at (10e,10o) — and get captured
# as program constants.  The maps are pure bit arithmetic on the basis
# index, so they are recomputed inside the trace instead: a few integer
# ops + population_count per element, fused by XLA into the consuming
# gather/multiply.  Only tiny per-pair bit constants are cached.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _epq_bit_consts(ncas, up_then_down=False):
    nm = 2 * ncas
    n2 = ncas * ncas
    # int64: at ncas = 16 the top mode's bit is 1 << 31 (the full-space
    # determinant index needs nm = 32 bits) — int32 overflows exactly
    # there, and the constructor warms these consts at every ncas even
    # when only the sector/grid paths will run
    bitP = np.zeros((2, n2), dtype=np.int64)
    bitQ = np.zeros((2, n2), dtype=np.int64)
    shP = np.zeros((2, n2), dtype=np.int64)
    shQ = np.zeros((2, n2), dtype=np.int64)
    for s in range(2):
        for p in range(ncas):
            for q in range(ncas):
                P = fermion.mode_of(p, s, ncas, up_then_down)
                Q = fermion.mode_of(q, s, ncas, up_then_down)
                k = p * ncas + q
                bitP[s, k] = 1 << (nm - 1 - P)
                bitQ[s, k] = 1 << (nm - 1 - Q)
                shP[s, k] = nm - P
                shQ[s, k] = nm - Q
    # numpy on purpose: this cache may be first-touched inside a trace,
    # and caching jnp arrays there would cache tracers; the arrays are
    # tiny (a few KB) so per-trace constant embedding is free
    return bitP, bitQ, shP, shQ


# below this statevector size the per-spin maps are precomputed host-side
# and embedded (small constants, zero per-call arithmetic); above it they
# are recomputed from bit ops inside the trace (O(1) memory at any ncas)
_ONTHEFLY_MIN_DIM = 1 << 16


_EPQ_TABLE_CACHE = {}


def _epq_tables_spin(ncas, up_then_down, spin, dtype_str):
    """Cached device-array maps.  The cache is only FILLED outside traces
    (jnp.asarray under jit returns a tracer; caching that poisons every
    later call — warm_tables in the circuit constructor does the eager
    fill).  Returns None when uncached inside a trace."""
    key = (ncas, up_then_down, spin, dtype_str)
    hit = _EPQ_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    src, sign = fermion.epq_gather(ncas, up_then_down)
    D = src.shape[-1]
    entry = (jnp.asarray(src[:, :, spin].reshape(ncas * ncas, D)),
             jnp.asarray(sign[:, :, spin].reshape(ncas * ncas, D),
                         dtype=jnp.dtype(dtype_str)))
    if isinstance(entry[0], jax.core.Tracer):
        return None  # mid-trace: caller computes on the fly instead
    _EPQ_TABLE_CACHE[key] = entry
    return entry


def _epq_maps_spin(ncas, up_then_down, spin, D, dtype):
    """(src, sign) for a^dag_{P} a_{Q} over all spatial pairs at one spin,
    shapes (ncas^2, D): precomputed tables for small statevectors,
    bit-arithmetic on the fly for large ones (matches
    fermion.single_mode_transfer element-for-element)."""
    if D < _ONTHEFLY_MIN_DIM:
        entry = _epq_tables_spin(ncas, up_then_down, spin,
                                 jnp.dtype(dtype).name)
        if entry is not None:
            return entry
    bitP, bitQ, shP, shQ = _epq_bit_consts(ncas, up_then_down)
    bP = bitP[spin][:, None]
    bQ = bitQ[spin][:, None]
    idx = jax.lax.iota(jnp.int32, D)[None, :]
    diag = bP == bQ
    hasP = (idx & bP) != 0
    empQ = (idx & bQ) == 0
    valid = hasP & (empQ | diag)
    src = jnp.where(diag, idx, idx ^ bP ^ bQ)
    # parity of occupied modes below Q in src, then below P after
    # removing Q (exactly fermion.single_mode_transfer)
    pcq = jax.lax.population_count(
        jnp.right_shift(src, shQ[spin][:, None]))
    sq = 1 - 2 * (pcq & 1)
    mid = jnp.where(diag, src, src ^ bQ)
    pcp = jax.lax.population_count(
        jnp.right_shift(mid, shP[spin][:, None]))
    sp = 1 - 2 * (pcp & 1)
    sign = jnp.where(diag, 1, sq * sp).astype(dtype)
    sign = jnp.where(valid, sign, jnp.zeros((), dtype))
    return src, sign


@lru_cache(maxsize=None)
def _pair_annihilation_np(ncas):
    src, sign = fermion.pair_annihilation_gather(ncas)
    nm = 2 * ncas
    D = src.shape[-1]
    return src.reshape(nm * nm, D), sign.reshape(nm * nm, D)


_PAIR_DEV_CACHE = {}


def _pair_annihilation_tables(ncas):
    """Device-array maps, cached only when built OUTSIDE a trace
    (jnp.asarray under jit returns a tracer; caching that poisons every
    later call — same discipline as _epq_tables_spin).  Mid-trace,
    uncached, the numpy tables are returned and embed as constants."""
    hit = _PAIR_DEV_CACHE.get(ncas)
    if hit is not None:
        return hit
    src, sign = _pair_annihilation_np(ncas)
    entry = (jnp.asarray(src), jnp.asarray(sign))
    if isinstance(entry[0], jax.core.Tracer):
        return src, sign
    _PAIR_DEV_CACHE[ncas] = entry
    return entry


def warm_tables(ncas, up_then_down=False):
    """Eagerly build the small-D gather tables and per-pair bit constants
    outside any trace (call from constructors; see _epq_tables_spin)."""
    _epq_bit_consts(ncas, up_then_down)
    if (1 << (2 * ncas)) < _ONTHEFLY_MIN_DIM:
        for s in range(2):
            _epq_tables_spin(ncas, up_then_down, s, "float64")


def _dot_last(a, b):
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (b.ndim - 1,)), ((), ())))


# the TPU f64 dot emulation materializes ~8 f32 copies of each operand:
# a (144, D) gram at D = 853,776 expands to 2 x 3.7 GB of temporaries.
# Above _CHUNK_MIN_D the big axis is processed in _CHUNK_D slices so the
# expanded buffers stay ~350 MB; below it (every bench tier up to
# (10e,10o)) the direct dot is used unchanged.
_CHUNK_MIN_D = 1 << 18
_CHUNK_D = 1 << 16


def _pad_last(x, pad):
    if not pad:
        return x
    return jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)


def gram_last(a, b):
    """Contract the LAST axis of both operands: (..., D) x (..., D) ->
    outer batch shape, without ever materializing a transpose of the
    large-D operand.  ``a @ b.T`` makes XLA relayout b into (D, n) whose
    (8,128) tiling pads the minor n axis (144 -> 256, 1.8x); large D is
    additionally sliced so the f64 dot emulation's expanded operand
    copies stay bounded (see _CHUNK_MIN_D)."""
    D = a.shape[-1]
    if D <= _CHUNK_MIN_D:
        return _dot_last(a, b)
    # full chunks via fori_loop + an explicit remainder dot: padding the
    # operands instead costs two FULL-SIZE copies (4+ GB at (14e,14o)
    # pair-block shapes) for the sake of the last partial chunk
    n = D // _CHUNK_D
    out0 = jnp.zeros(a.shape[:-1] + b.shape[:-1],
                     jnp.result_type(a.dtype, b.dtype))

    def body(k, acc):
        sa = jax.lax.dynamic_slice_in_dim(a, k * _CHUNK_D, _CHUNK_D,
                                          axis=a.ndim - 1)
        sb = jax.lax.dynamic_slice_in_dim(b, k * _CHUNK_D, _CHUNK_D,
                                          axis=b.ndim - 1)
        return acc + _dot_last(sa, sb)

    out = jax.lax.fori_loop(0, n, body, out0)
    if D > n * _CHUNK_D:
        out = out + _dot_last(
            jax.lax.slice_in_dim(a, n * _CHUNK_D, D, axis=a.ndim - 1),
            jax.lax.slice_in_dim(b, n * _CHUNK_D, D, axis=b.ndim - 1))
    return out


def vdot_big(a, b):
    """sum_i a_i * b_i of two LARGE same-shape operands as an
    elementwise multiply + reduction (VPU), never a dot_general: the TPU
    f64 dot emulation materializes ~8 f32 copies of EACH operand, which
    is ~10.6 GB at D = 165.6M ((16e,16o)) — the OOM that killed the
    16e16o demo's norm/overlap scalars.  The product fuses into the
    reduce, so peak extra memory is O(1).  Reverse-differentiable
    (unlike the fori_loop-chunked gram_last), so it is safe inside the
    VJP scalars of the gradient pipelines.  Callers conjugate
    explicitly, matching the raw-dot call sites it replaces."""
    return jnp.sum(a * b)


def small_matmul_free_last(C, X):
    """C (m, k) @ X (..., k, D) -> (..., m, D) with the small k axis
    contracted and the large FREE last axis sliced above _CHUNK_MIN_D
    (same f64-emulation containment as gram_last)."""
    def dot(x):
        return jnp.einsum("mk,...kd->...md", C, x)

    D = X.shape[-1]
    if D <= _CHUNK_MIN_D:
        return dot(X)
    # full chunks + explicit remainder, no padded operand copy (see
    # gram_last)
    n = D // _CHUNK_D
    out0 = jnp.zeros(X.shape[:-2] + (C.shape[0], D),
                     jnp.result_type(C.dtype, X.dtype))

    def body(k, acc):
        sx = jax.lax.dynamic_slice_in_dim(X, k * _CHUNK_D, _CHUNK_D,
                                          axis=X.ndim - 1)
        return jax.lax.dynamic_update_slice_in_dim(
            acc, dot(sx), k * _CHUNK_D, axis=acc.ndim - 1)

    out = jax.lax.fori_loop(0, n, body, out0)
    if D > n * _CHUNK_D:
        tail = dot(jax.lax.slice_in_dim(X, n * _CHUNK_D, D,
                                        axis=X.ndim - 1))
        out = jax.lax.dynamic_update_slice_in_dim(
            out, tail, n * _CHUNK_D, axis=out.ndim - 1)
    return out


def apply_epq_all(psi, ncas, up_then_down=False, maps=None):
    """Phi[p*ncas+q] = E_pq |psi> for all pairs, shape (ncas^2, D).

    `maps` optionally overrides the gather maps (e.g. sector-basis maps
    from simulator/sector.py, shapes (2, ncas^2, D)).  A
    ops.grid.GridMaps instance selects the string-factorized sector
    kernels instead — then psi and the result are GRID-ordered (see
    ops/grid.py layout contract)."""
    from .grid import GridMaps, phi_all

    if isinstance(maps, GridMaps):
        return phi_all(psi, maps)
    D = psi.shape[0]
    out = None
    for s in range(2):
        if maps is not None:
            src, sign = maps[0][s], maps[1][s].astype(psi.dtype)
        else:
            src, sign = _epq_maps_spin(ncas, up_then_down, s, D, psi.dtype)
        term = psi[src] * sign
        out = term if out is None else out + term
    return out


def rdms_from_state(psi, ncas, up_then_down=False, maps=None,
                    grid_order=False):
    """Spin-summed restricted (gamma, Gamma), chemist ordering.

    Matches reference Parameterized_circuit.get_rdms_from_state
    (pqc.py:192-218): gamma_pq = Re<psi|E_pq|psi>, Gamma via the Phi gram.
    Complex statevectors are handled natively — the bra side is
    conjugated and the real part taken (conj/real are no-ops in XLA for
    the real-valued built-in ansatze, so the hot path is unchanged).
    `maps` overrides the gather maps (sector basis); a grid.GridMaps
    selects the string-factorized kernels — psi arrives in canonical
    order and is converted once (the gram and dot below are invariant
    under any common permutation of both operands).
    """
    from .grid import (GridMaps, to_grid, _pair_chunk, _row_chunk,
                       rdms_rows)

    if isinstance(maps, GridMaps):
        if not grid_order:
            psi = to_grid(psi, maps)
        itemsize = jnp.dtype(psi.dtype).itemsize
        if _pair_chunk(1, psi.shape[-1], maps.n2, itemsize) < maps.n2:
            # (14e,14o)-scale: stream Phi over grid A-rows — one full
            # gather pass, gram blocks on the MXU (ops/grid.rdms_rows)
            return rdms_rows(psi, maps, ncas,
                             _row_chunk(1, maps.n2, maps.Nb, itemsize))
    phi = apply_epq_all(psi, ncas, up_then_down, maps)   # (ncas^2, D)
    gamma = jnp.real(phi @ jnp.conj(psi)).reshape(ncas, ncas)
    # corr[(q,p),(r,s)] = <E_qp psi|E_rs psi> = <psi|E_pq E_rs|psi>
    corr = jnp.real(gram_last(jnp.conj(phi), phi))
    corr = corr.reshape(ncas, ncas, ncas, ncas)
    epq_ers = jnp.transpose(corr, (1, 0, 2, 3))
    delta = jnp.eye(ncas, dtype=gamma.dtype)
    Gamma = epq_ers - jnp.einsum("qr,ps->pqrs", delta, gamma)
    return gamma, Gamma


def rdms_from_state_unrestricted(psi, ncas):
    """Spin-resolved (unrestricted) RDMs over 2*ncas spin-orbitals:
    gamma_pq = <a^dag_p a_q>, Gamma_pqrs = <a^dag_p a^dag_q a_r a_s>
    (reference pqc.py:192-218 with restricted=False).

    gamma reuses the restricted gather tables' per-spin components is not
    possible in general orderings, so it uses its own single-mode maps;
    Gamma is one gram matrix of the pair-annihilation vectors:
    <a^dag_p a^dag_q a_r a_s> = <W_qp psi | W_rs psi>, W_rs = a_r a_s.
    """
    nm = 2 * ncas
    src, sign = _pair_annihilation_tables(ncas)
    W = psi[src] * sign.astype(psi.dtype)                # (nm^2, D)
    corr = jnp.real(gram_last(jnp.conj(W), W))           # <W_ab psi|W_rs psi>
    corr = corr.reshape(nm, nm, nm, nm)
    # corr[(q,p),(r,s)] -> Gamma[p,q,r,s]
    Gamma = jnp.transpose(corr, (1, 0, 2, 3))
    # gamma via number/transfer single-mode maps derived from W is not
    # available (W_rr = 0), so gather directly
    gsrc, gsign = _single_mode_tables(ncas)
    gamma = jnp.real((psi[gsrc] * gsign.astype(psi.dtype))
                     @ jnp.conj(psi)).reshape(nm, nm)
    return gamma, Gamma


@lru_cache(maxsize=None)
def _single_mode_np(ncas):
    nm = 2 * ncas
    D = 1 << nm
    src = np.zeros((nm, nm, D), dtype=np.int32)
    sign = np.zeros((nm, nm, D), dtype=np.float64)
    for p in range(nm):
        for q in range(nm):
            s, g = fermion.single_mode_transfer(p, q, nm)
            src[p, q] = s
            sign[p, q] = g
    return src.reshape(nm * nm, D), sign.reshape(nm * nm, D)


_SINGLE_DEV_CACHE = {}


def _single_mode_tables(ncas):
    """(src, sign) for all unrestricted a^dag_p a_q, shape (nm^2, D);
    tracer-safe caching as in _pair_annihilation_tables."""
    hit = _SINGLE_DEV_CACHE.get(ncas)
    if hit is not None:
        return hit
    src, sign = _single_mode_np(ncas)
    entry = (jnp.asarray(src), jnp.asarray(sign))
    if isinstance(entry[0], jax.core.Tracer):
        return src, sign
    _SINGLE_DEV_CACHE[ncas] = entry
    return entry


@lru_cache(maxsize=None)
def s2_matrix(ncas):
    """Dense S^2 matrix over the 2^(2 ncas) space (reference
    utils/active_space.py:243-248 via PennyLane qchem.spin2)."""
    return jnp.asarray(fermion.s2_sparse(ncas).toarray())


@lru_cache(maxsize=None)
def sz_matrix(ncas):
    """Dense S_z matrix (reference utils/active_space.py:250-253)."""
    return jnp.asarray(fermion.sz_sparse(ncas).toarray())
