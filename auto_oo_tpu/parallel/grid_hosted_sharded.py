"""Hosted x row-sharded string-grid engine: the (18e,18o) axis.

Composes the two large-D execution models this package already has —
host-segmented bounded dispatches (ops/grid_hosted, the (16e,16o)
single-chip path) and mesh row-sharding (parallel/grid_sharded) — in the
ONLY form that scales past the point where a device can hold one full
statevector: at (18e,18o) (D = C(18,9)^2 = 2.364G) one f64 statevector
is 18.9 GB, so the row-sharded engine's per-apply `all_gather` of x
(grid_sharded._rdms_local / _ham_local) no longer fits ANY single
device, and the hosted drivers' device-resident full-height accumulators
don't either.

The composition keeps the state in BOTH string layouts, each sharded:

    N layout: x as (Na, Nb), sharded over ALPHA rows   (D/n_dev each)
    T layout: x as (Nb, Na), sharded over BETA rows    (D/n_dev each)

because every operator factor is LOCAL in one of them (the spin
factorization of ops/grid.py): beta-spin E_pq factors gather on the lane
axis of the N layout; alpha-spin factors gather on the lane axis of the
T layout.  Per hosted segment (a chunk of every device's local alpha
rows, SPMD):

  1. the segment's alpha-Phi is built in the T layout (local lane
     gathers) and moved to the N layout with ONE tiled `all_to_all` —
     the phi-volume transpose traffic is spread evenly over the mesh
     and replaces cross-device row gathers entirely;
  2. the beta-Phi is built locally in the N layout and added; the RDM
     grams consume the full Phi chunk on the MXU (psum per segment);
  3. for the Hamiltonian apply, Y = C2 Phi + c1 x is formed on the
     chunk, its beta half reduces LOCALLY in N, and its alpha half is
     `all_to_all`-transposed to T where the inverse alpha maps
     (ops/grid.inverse_alpha_maps) SCATTER it into a persistent
     (Nb/n_dev, Na) accumulator — local lane scatters, no full-height
     buffer anywhere;
  4. one final D-sized all_to_all folds the T-layout alpha accumulator
     back onto the N-layout output.

Per-device memory at (18e,18o) on 8 devices (f64): x in two layouts
2 x 2.4 GB, two output accumulators 2 x 2.4 GB, transient chunk blocks
~2 GB => ~12 GB — fits a 16 GB chip; per-device gather work is 1/n_dev
of a full-Phi pass (true scaling), and the ICI cost is the phi-volume
all_to_all (1/n_dev of the HBM gather bytes, moving at ICI rates).

Host-driven multi-dispatch exactly like ops/grid_hosted: accumulators
stay device-resident between segment dispatches, ONE compiled program
serves every full-size segment (r0 is a traced scalar; only the
remainder shape compiles separately), and all grid tables ride as
runtime arguments.  Exactness vs the single-device kernels is pinned on
the virtual CPU mesh (tests/test_parallel.py) and exercised by
__graft_entry__.dryrun_multichip.

No reference counterpart (the reference is single-process,
/root/reference/src/auto_oo — SURVEY §2.3); the decomposition is the
alpha/beta-transpose layout of distributed FCI sigma builds, rebuilt on
jax.shard_map + XLA collectives.
"""

import contextlib

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.grid import GridMaps, inverse_alpha_maps
from ..ops import rdms as _rdms


def _pad_cols(a, mult):
    """Pad the last (row-index) axis of a (n2, Na) table to a multiple
    of ``mult`` (pad entries carry sign/t 0 => contribute nothing)."""
    a = np.asarray(a)
    pad = (-a.shape[-1]) % mult
    if pad:
        a = np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
    return a


def _seg_slice(tab, n_dev, rows_loc, r0, r1):
    """Slice the per-device row range [r0:r1) out of a (n2, Na_pad)
    table for ALL devices at once, e-major lane order (n2, n_dev*(r1-r0))."""
    t = np.asarray(tab).reshape(tab.shape[0], n_dev, rows_loc)[:, :, r0:r1]
    return t.reshape(tab.shape[0], -1)


def _prec(dtype):
    if jnp.dtype(dtype) in (jnp.dtype(jnp.float32),
                            jnp.dtype(jnp.complex64)):
        return jax.default_matmul_precision("float32")
    return contextlib.nullcontext()


def hosted_sharded_fns(gm, mesh, axis="row", dtype=jnp.float64,
                       row_chunk=None):
    """Build the hosted x row-sharded engine for one sector.

    Returns a dict of HOST-DRIVEN callables over flat GRID-ordered
    statevectors (replicated in, replicated out — the test/dryrun
    surface; production callers keep the sharded layouts resident):

      rdms(psi)                  -> (gamma (n2,), corr (n2, n2)) raw
                                    grid gram accumulators, real dtype
      ham_apply(c1eff, c2, psi)  -> H|psi> flat grid order (device out)
      memory_budget(n_dev, itemsize) -> per-device byte table

    ``row_chunk`` = alpha rows PER DEVICE per segment dispatch."""
    if not isinstance(gm, GridMaps):
        raise ValueError("hosted_sharded_fns needs string-grid maps")
    n_dev = int(mesh.shape[axis])
    n2, Na, Nb = gm.n2, gm.Na, gm.Nb
    rdt = jnp.zeros((), dtype).real.dtype

    Na_pad = -(-Na // n_dev) * n_dev
    Nb_pad = -(-Nb // n_dev) * n_dev
    rows_loc = Na_pad // n_dev
    nbloc = Nb_pad // n_dev
    itemsize = jnp.dtype(dtype).itemsize
    if row_chunk is None:
        # ~4 live chunk-block copies per device; one chunk row costs
        # n2 * Nb elements PER DEVICE (the local phiT block is
        # (Nb_pad/n_dev, n2, n_dev*chunk) — the n_dev factors cancel)
        per_row = 4 * n2 * Nb * itemsize
        row_chunk = max(1, int(1.5e9 // max(1, per_row)))
    row_chunk = max(1, min(row_chunk, rows_loc))

    # ---- host tables ---------------------------------------------------
    srcA_p = _pad_cols(gm.srcA, n_dev)
    sgnA_p = _pad_cols(gm.sgnA, n_dev)
    tA_p = _pad_cols(gm.tA, n_dev)
    dst, dsg = inverse_alpha_maps(gm)
    dstA_p = _pad_cols(dst, n_dev)
    dsgnA_p = _pad_cols(dsg, n_dev)
    tB_p = _pad_cols(gm.tB, n_dev)

    repl = NamedSharding(mesh, P())
    row_sh = NamedSharding(mesh, P(axis, None))
    colB_sh = NamedSharding(mesh, P(None, axis))

    tB_dev = jax.device_put(jnp.asarray(tB_p, dtype), colB_sh)
    srcB_dev = jax.device_put(jnp.asarray(np.asarray(gm.srcB),
                                          jnp.int32), repl)
    sgnB_dev = jax.device_put(jnp.asarray(np.asarray(gm.sgnB), dtype),
                              repl)

    def _layouts(psi):
        """Flat grid-order psi -> (xn, xt) sharded device arrays."""
        xg = jnp.asarray(psi, dtype).reshape(Na, Nb)
        xn = jnp.pad(xg, ((0, Na_pad - Na), (0, 0)))
        xt = jnp.pad(xg.T, ((0, Nb_pad - Nb), (0, 0)))
        return (jax.device_put(xn, row_sh), jax.device_put(xt, row_sh))

    def _seg_tables(r0, r1, need_inverse):
        sl = lambda t: _seg_slice(t, n_dev, rows_loc, r0, r1)
        args = [jnp.asarray(sl(srcA_p), jnp.int32),
                jnp.asarray(sl(sgnA_p), dtype),
                jnp.asarray(sl(tA_p), dtype)]
        if need_inverse:
            args += [jnp.asarray(sl(dstA_p), jnp.int32),
                     jnp.asarray(sl(dsgnA_p), dtype)]
        return args

    def _phi_chunk_local(me, xn_l, xt_l, tB_l, srcB, sgnB, r0, srcA_s,
                         sgnA_s, tA_s):
        """Full Phi of this device's segment rows in N layout,
        (n2, chunk, Nb), plus the segment's xn rows.  ``tA_s``/``srcA_s``
        cover ALL devices' chunks (e-major, n_dev*chunk lanes); the
        all_to_all hands each device its own chunk back."""
        ndc = srcA_s.shape[-1]
        chunk = ndc // n_dev
        # alpha part, T layout: (nbloc, n2, ndc) local lane gathers
        phiT = (jnp.take(xt_l, srcA_s, axis=-1)
                * sgnA_s[None, :, :] * tB_l.T[:, :, None])
        # -> (Nb_pad, n2, chunk): my chunk's lanes, global jb rows
        phiN = jax.lax.all_to_all(phiT, axis, split_axis=2,
                                  concat_axis=0, tiled=True)
        phi_a = jnp.moveaxis(phiN[:Nb], 0, -1)          # (n2, chunk, Nb)
        xn_chunk = jax.lax.dynamic_slice(xn_l, (r0, 0), (chunk, Nb))
        # my own tA lanes: e-major block ``me`` of tA_s
        z = jnp.zeros((), dtype=me.dtype)
        tA_mine = jax.lax.dynamic_slice(
            tA_s, (z, me * chunk), (n2, chunk))
        phi_b = (jnp.take(xn_chunk, srcB, axis=-1)      # (chunk, n2, Nb)
                 * sgnB[None, :, :])
        phi_b = jnp.moveaxis(phi_b, 0, 1) * tA_mine[:, :, None]
        return phi_a + phi_b, xn_chunk, tA_mine

    # ---- RDM segment ---------------------------------------------------
    def _rdms_seg_body(xn_l, xt_l, tB_l, srcB, sgnB, r0, srcA_s, sgnA_s,
                       tA_s, gamma, corr):
        me = jax.lax.axis_index(axis)
        with _prec(dtype):
            phi, xn_chunk, _ = _phi_chunk_local(
                me, xn_l, xt_l, tB_l, srcB, sgnB, r0, srcA_s, sgnA_s,
                tA_s)
            pf = phi.reshape(n2, -1)
            bra = jnp.conj(xn_chunk).reshape(-1)
            gamma = gamma + jax.lax.psum(
                jnp.real(_rdms.gram_last(pf, bra)), axis)
            corr = corr + jax.lax.psum(
                jnp.real(_rdms.gram_last(jnp.conj(pf), pf)), axis)
        return gamma, corr

    def _run_rdms_seg(xn, xt, tB, srcB, sgnB, r0, srcA_s, sgnA_s, tA_s,
                      gamma, corr):
        return jax.shard_map(
            _rdms_seg_body, mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(None, axis),
                      P(), P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P()))(
            xn, xt, tB, srcB, sgnB, r0, srcA_s, sgnA_s, tA_s, gamma,
            corr)

    _jits = {}

    def _jit(name, fn):
        if name not in _jits:
            _jits[name] = jax.jit(fn)
        return _jits[name]

    def rdms(psi):
        """Raw grid gram accumulators (gamma (n2,), corr (n2, n2)) —
        equal to the scan state of ops/grid.rdms_rows; assemble with
        ops/grid_hosted._assemble_rdms for (gamma, Gamma)."""
        xn, xt = _layouts(psi)
        gamma = jnp.zeros((n2,), rdt)
        corr = jnp.zeros((n2, n2), rdt)
        run = _jit("rdms_seg", _run_rdms_seg)
        for r0 in range(0, rows_loc, row_chunk):
            r1 = min(rows_loc, r0 + row_chunk)
            srcA_s, sgnA_s, tA_s = _seg_tables(r0, r1, False)
            gamma, corr = run(xn, xt, tB_dev, srcB_dev, sgnB_dev,
                              jnp.asarray(r0), srcA_s, sgnA_s, tA_s,
                              gamma, corr)
        return gamma, corr

    # ---- Hamiltonian-apply segment -------------------------------------
    def _ham_seg_body(xn_l, xt_l, tB_l, srcB, sgnB, C2, c1f, r0,
                      srcA_s, sgnA_s, tA_s, dstA_s, dsgnA_s, out_n,
                      out_t):
        me = jax.lax.axis_index(axis)
        with _prec(dtype):
            phi, xn_chunk, tA_mine = _phi_chunk_local(
                me, xn_l, xt_l, tB_l, srcB, sgnB, r0, srcA_s, sgnA_s,
                tA_s)
            chunk = phi.shape[1]
            Y = _rdms.small_matmul_free_last(
                C2, phi.reshape(n2, -1)).reshape(n2, chunk, Nb)
            Y = Y + c1f[:, None, None] * xn_chunk[None, :, :]
            # beta half: local lane gathers on my chunk rows
            rows2 = jnp.arange(n2)[:, None]
            Yt = jnp.swapaxes(Y, -1, -2)                # (n2, Nb, chunk)
            Gb = Yt[rows2, srcB, :]
            outB = jnp.sum(Gb * sgnB[:, :, None]
                           * tA_mine[:, None, :], axis=0).T
            out_n = jax.lax.dynamic_update_slice(
                out_n,
                jax.lax.dynamic_slice(out_n, (r0, 0), (chunk, Nb))
                + outB, (r0, 0))
            # alpha half: chunk Y to T layout, local lane scatter
            Yp = jnp.pad(Y, ((0, 0), (0, 0), (0, Nb_pad - Nb)))
            YT = jax.lax.all_to_all(Yp, axis, split_axis=2,
                                    concat_axis=1, tiled=True)
            # YT: (n2, ndc, nbloc); contrib[p, l, jb] * tB[p, jb]
            contrib = YT * dsgnA_s[:, :, None] * tB_l[:, None, :]
            cflat = jnp.moveaxis(contrib, 2, 0).reshape(nbloc, -1)
            out_t = out_t.at[:, dstA_s.reshape(-1)].add(cflat)
        return out_n, out_t

    def _run_ham_seg(xn, xt, tB, srcB, sgnB, C2, c1f, r0, srcA_s,
                     sgnA_s, tA_s, dstA_s, dsgnA_s, out_n, out_t):
        return jax.shard_map(
            _ham_seg_body, mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(None, axis),
                      P(), P(), P(), P(), P(), P(), P(), P(), P(),
                      P(), P(axis, None), P(axis, None)),
            out_specs=(P(axis, None), P(axis, None)))(
            xn, xt, tB, srcB, sgnB, C2, c1f, r0, srcA_s, sgnA_s, tA_s,
            dstA_s, dsgnA_s, out_n, out_t)

    def _fold_body(out_n_l, out_t_l):
        otp = jnp.pad(out_t_l[:, :Na], ((0, 0), (0, Na_pad - Na)))
        o = jax.lax.all_to_all(otp, axis, split_axis=1, concat_axis=0,
                               tiled=True)              # (Nb_pad, rows)
        return out_n_l + o.T[:, :Nb]

    def _fold_out(out_n, out_t):
        return jax.shard_map(
            _fold_body, mesh=mesh,
            in_specs=(P(axis, None), P(axis, None)),
            out_specs=P(axis, None))(out_n, out_t)

    def ham_apply(c1eff, c2, psi):
        """H|psi> (no c0 constant), flat grid order — equal to
        ops/hamiltonian.ham_apply / ops/grid_hosted.ham_apply_hosted."""
        xn, xt = _layouts(psi)
        C2 = jnp.asarray(c2, dtype).reshape(n2, n2)
        c1f = jnp.asarray(c1eff, dtype).reshape(n2)
        out_n = jax.device_put(jnp.zeros((Na_pad, Nb), dtype), row_sh)
        out_t = jax.device_put(jnp.zeros((Nb_pad, Na), dtype), row_sh)
        run = _jit("ham_seg", _run_ham_seg)
        for r0 in range(0, rows_loc, row_chunk):
            r1 = min(rows_loc, r0 + row_chunk)
            srcA_s, sgnA_s, tA_s, dstA_s, dsgnA_s = _seg_tables(
                r0, r1, True)
            out_n, out_t = run(xn, xt, tB_dev, srcB_dev, sgnB_dev, C2,
                               c1f, jnp.asarray(r0), srcA_s, sgnA_s,
                               tA_s, dstA_s, dsgnA_s, out_n, out_t)
        out = _jit("fold", _fold_out)(out_n, out_t)
        return out[:Na].reshape(-1)

    def memory_budget(n_dev_q=None, itemsize_q=None):
        """Per-device byte counts of the engine's persistent and
        transient objects — the (18e,18o)-on-a-mesh feasibility table."""
        nd = n_dev_q or n_dev
        isz = itemsize_q or itemsize
        na_p = -(-Na // nd) * nd
        nb_p = -(-Nb // nd) * nd
        state_n = na_p // nd * Nb * isz
        state_t = nb_p // nd * Na * isz
        chunk_block = n2 * nd * row_chunk * Nb * isz // nd
        return {
            "n_dev": nd,
            "x_layout_n": state_n,
            "x_layout_t": state_t,
            "out_accum_n": state_n,
            "out_accum_t": state_t,
            "phi_chunk_block": chunk_block,
            "live_chunk_blocks": 4,
            "total_est": 2 * (state_n + state_t) + 4 * chunk_block,
        }

    return {"rdms": rdms, "ham_apply": ham_apply,
            "memory_budget": memory_budget, "row_chunk": row_chunk,
            "layouts": _layouts}
