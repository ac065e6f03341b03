"""Active-space Hamiltonian apply: |chi> -> H|chi> as gathers + one matmul.

The OO-PQC energy is the quadratic form E = c0 + <psi|H|psi> with
H = sum_pq c1_pq E_pq + sum_pqrs c2_pqrs e_pqrs (chemist order).  This
kernel applies H to a (batch of) statevector(s) with

    H chi = sum_pq E_pq [ sum_rs c2'_{(pq),(rs)} (E_rs chi) + c1'' ... ]

concretely:
    Phi[rs]   = E_rs chi                       (2 gathers, ops/rdms tables)
    Y[pq]     = sum_rs C2[(pq),(rs)] Phi[rs]   (one (n^2, n^2) MXU matmul)
    Y[pq]    += c1eff[pq] * chi                (rank-1 broadcast)
    H chi     = sum_pq E_pq Y[pq]              (2 batched-source gathers)

where c1eff = c1 - sum_t c2[p,t,t,s] absorbs the -delta_qr E_ps term of
e_pqrs = E_pq E_rs - delta_qr E_ps.  Everything is fixed-shape, layouts
keep the state dimension minor (no TPU tile padding of small axes), and
the kernel vmaps cleanly over a batch of states — this is what makes the
theta-Hessian a batched quadratic-form contraction instead of
autodiff-through-RDM-extraction (see models/oo_pqc.py).

Replaces the capability of reference pqc.py:22-66 + fermionic Hamiltonian
assembly (utils/active_space.py:215-240) on the device side.
"""

import numpy as np
import jax
import jax.numpy as jnp

from . import rdms as _rdms


def c1_effective(c1, c2):
    """Absorb the -delta_qr E_ps contraction of chemist e_pqrs into an
    effective one-body coefficient (reference active_space.py:57-84)."""
    return c1 - jnp.einsum("ptts->ps", c2)


def ham_apply(c1eff, c2, chi, ncas, up_then_down=False, maps=None,
              phi_pre=None):
    """H|chi> (without the c0 constant).  chi: (D,) or (B, D).

    `maps` optionally overrides the E_pq gather maps (sector basis).
    `phi_pre` optionally supplies the precomputed Phi[b, rs, :] =
    E_rs chi_b tensor ((B, n2, D)) so callers that already built it
    (e.g. the staged per-tangent pipeline, which needs Phi_J for the
    transition RDMs anyway) skip the second E_pq gather pass."""
    from .grid import GridMaps, phi_all, epq_sum

    n2 = ncas * ncas
    batched = chi.ndim == 2
    x = chi if batched else chi[None, :]
    B, D = x.shape
    if isinstance(maps, GridMaps):
        # string-factorized sector path: x, phi_pre and the result are
        # GRID-ordered (ops/grid.py); same three-stage structure with
        # row gathers replacing the flat element gathers
        from .grid import (_pair_chunk, _row_chunk, _Y_BUDGET_BYTES,
                           ham_apply_rows)

        C2g = c2.reshape(n2, n2).astype(x.dtype)
        c1f = c1eff.reshape(n2).astype(x.dtype)
        itemsize = jnp.dtype(x.dtype).itemsize
        chunk = _pair_chunk(B, D, n2, itemsize)
        if phi_pre is None and chunk < n2:
            # (14e,14o)-scale: Phi cannot be materialized.  Stream Phi
            # over grid A-rows (each element built once per pass) into
            # pair-blocked Y buffers (ops/grid.ham_apply_rows).  The
            # budget divides by ~5 live block-sized buffers: the scan-
            # stacked Ys, its moveaxis+reshape copy, and epq_sum's
            # alpha gather + beta transpose + beta gather (an AOT
            # compile at (14e,14o) f64 measured 27.4 GB with the block
            # sized to the raw budget — 3 allocations of ~5 GB each)
            pair_block = max(1, int((_Y_BUDGET_BYTES // 5)
                                    // max(1, B * D * itemsize)))
            out = ham_apply_rows(c1f, C2g, x, maps,
                                 _row_chunk(B, n2, maps.Nb, itemsize),
                                 pair_block=min(n2, pair_block))
            return out if batched else out[0]
        phi = phi_pre if phi_pre is not None else phi_all(x, maps)
        Y = _rdms.small_matmul_free_last(C2g, phi)
        Y = Y + c1f[None, :, None] * x[:, None, :]
        out = epq_sum(Y, maps)
        return out if batched else out[0]
    if maps is not None:
        maps = [(maps[0][s], maps[1][s].astype(x.dtype)) for s in range(2)]
    else:
        maps = [_rdms._epq_maps_spin(ncas, up_then_down, s, D, x.dtype)
                for s in range(2)]
    # Phi[b, rs, :] = E_rs x_b
    phi = (phi_pre if phi_pre is not None
           else sum(x[:, src] * sign for src, sign in maps))  # (B, n2, D)
    C2 = c2.reshape(n2, n2).astype(x.dtype)
    # Y[b] = C2 @ phi[b] with the LARGE state axis kept minor-most and
    # sliced above ~260k (ops/rdms.small_matmul_free_last): the einsum
    # form "pr,brd->bpd" let XLA pick a [..., D, n2] layout whose
    # (8,128) tiling pads n2 (144 -> 256, 1.8x) and whose f64 dot
    # emulation materialized 3.7-6.5 GB expanded-operand temporaries —
    # the difference between (12e,12o) fitting in 15.75 GB HBM and OOM
    Y = _rdms.small_matmul_free_last(C2, phi)              # (B, n2, D)
    Y = Y + c1eff.reshape(n2)[None, :, None] * x[:, None, :]
    # out = sum_pq E_pq Y[pq]:  E_pq acts row-wise with row-specific
    # sources: out[i] += sign[s,pq,i] * Y[pq, src[s,pq,i]].  Integer
    # advanced indexing, NOT take_along_axis — the latter lowers to a
    # gather that runs 7.7x slower on TPU for this pattern.
    rows = jnp.arange(n2)[:, None]

    def epq_rowwise(y):
        return sum((y[rows, src] * sign).sum(axis=0) for src, sign in maps)

    out = jax.vmap(epq_rowwise)(Y)
    return out if batched else out[0]


def energy_quadratic(c0, c1, c2, psi, ncas, up_then_down=False):
    """E = c0 + Re<psi|H|psi> via the apply kernel (equals
    transforms.energy_from_rdms on the RDMs of psi; conj/real are no-ops
    for real states)."""
    c1eff = c1_effective(c1, c2)
    return c0 + jnp.real(
        jnp.conj(psi) @ ham_apply(c1eff, c2, psi, ncas, up_then_down))
