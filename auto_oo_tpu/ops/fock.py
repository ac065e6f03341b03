"""Closed-form orbital derivatives: generalized Fock matrix, analytic
gradient 2(F - F^T) and analytic orbital Hessian (device side, pure JAX).

TPU redesign of reference oo_energy.py:238-402.  Unlike the reference,
``full_rdms`` here is built with functional ``.at[].set`` updates so the
whole Hessian is AD-traceable (the reference used in-place numpy writes,
blocking AD — SURVEY.md known bug list).  All index sets are static
Python tuples so XLA sees fixed shapes.
"""

import numpy as np
import jax.numpy as jnp


def fock_core(int1e_mo, int2e_mo, occ_idx):
    """F^I_mn = h_mn + sum_i (2 g_mnii - g_mi i n)
    (reference oo_energy.py:272-284)."""
    if len(occ_idx) == 0:
        return int1e_mo
    occ = jnp.array(list(occ_idx))
    g_tilde = (2.0 * jnp.einsum("mnii->mn",
                                int2e_mo[:, :, occ][:, :, :, occ])
               - jnp.einsum("miin->mn", int2e_mo[:, occ][:, :, occ, :]))
    return int1e_mo + g_tilde


def fock_active(int2e_mo, one_rdm, act_idx):
    """F^A_mn = sum_vw gamma_vw (g_mnvw - 0.5 g_mwvn)
    (reference oo_energy.py:286-298)."""
    act = jnp.array(list(act_idx))
    g_tilde = (int2e_mo[:, :, act][:, :, :, act]
               - 0.5 * jnp.transpose(
                   int2e_mo[:, :, act, :][:, act, :, :], (0, 3, 2, 1)))
    return jnp.einsum("vw,mnvw->mn", one_rdm, g_tilde)


def fock_generalized(int1e_mo, int2e_mo, one_rdm, two_rdm, occ_idx, act_idx):
    """Generalized Fock matrix (reference oo_energy.py:238-270)."""
    fc = fock_core(int1e_mo, int2e_mo, occ_idx)
    fa = fock_active(int2e_mo, one_rdm, act_idx)
    F = jnp.zeros_like(int1e_mo)
    occ = np.array(list(occ_idx), dtype=int)
    act = np.array(list(act_idx), dtype=int)
    if len(occ):
        F = F.at[occ, :].set(2.0 * (fc[:, occ] + fa[:, occ]).T)
    g_act3 = int2e_mo[:, :, :, act][:, :, act, :][:, act, :, :]
    F = F.at[act, :].set(
        jnp.einsum("nw,vw->vn", fc[:, act], one_rdm)
        + jnp.einsum("vwxy,nwxy->vn", two_rdm, g_act3))
    return F


def analytic_gradient_from_integrals(int1e_mo, int2e_mo, one_rdm, two_rdm,
                                     occ_idx, act_idx):
    """G = 2 (F - F^T) (reference oo_energy.py:300-309)."""
    F = fock_generalized(int1e_mo, int2e_mo, one_rdm, two_rdm,
                         occ_idx, act_idx)
    return 2.0 * (F - F.T)


def full_rdms(one_rdm, two_rdm, occ_idx, act_idx, nao):
    """Promote active-space RDMs to the full orbital space
    (reference oo_energy.py:342-379) — functional, AD-traceable."""
    occ = np.array(list(occ_idx), dtype=int)
    act = np.array(list(act_idx), dtype=int)
    dtype = one_rdm.dtype
    one_full = jnp.zeros((nao, nao), dtype=dtype)
    two_full = jnp.zeros((nao,) * 4, dtype=dtype)
    no = len(occ)
    if no:
        one_full = one_full.at[occ, occ].set(2.0)
    one_full = one_full.at[np.ix_(act, act)].set(one_rdm)
    if no:
        eye = jnp.eye(no, dtype=dtype)
        two_full = two_full.at[np.ix_(occ, occ, occ, occ)].set(
            4.0 * jnp.einsum("ij,kl->ijkl", eye, eye)
            - 2.0 * jnp.einsum("il,jk->ijkl", eye, eye))
        two_full = two_full.at[np.ix_(occ, occ, act, act)].set(
            2.0 * jnp.einsum("wv,ij->ijwv", one_rdm, eye))
        two_full = two_full.at[np.ix_(act, act, occ, occ)].set(
            2.0 * jnp.einsum("wv,ij->wvij", one_rdm, eye))
        two_full = two_full.at[np.ix_(occ, act, act, occ)].set(
            -jnp.einsum("wv,ij->iwvj", one_rdm, eye))
        two_full = two_full.at[np.ix_(act, occ, occ, act)].set(
            -jnp.einsum("wv,ij->vjiw", one_rdm, eye))
    two_full = two_full.at[np.ix_(act, act, act, act)].set(two_rdm)
    return one_full, two_full


def y_matrix(int2e_mo, two_full):
    """Y_pqrs = sum_mn [(G_pmrn + G_pmnr) g_qmns + G_prmn g_qsmn]
    (reference oo_energy.py:381-393).  Dense O(nao^6) form; the Hessian
    below uses the blocked form instead."""
    y0 = jnp.einsum("pmrn,qmns->pqrs", two_full, int2e_mo)
    y1 = jnp.einsum("pmnr,qmns->pqrs", two_full, int2e_mo)
    y2 = jnp.einsum("prmn,qsmn->pqrs", two_full, int2e_mo)
    return y0 + y1 + y2


def analytic_hessian_from_integrals(int1e_mo, int2e_mo, one_rdm, two_rdm,
                                    occ_idx, act_idx):
    """(1-P_pq)(1-P_rs)[2 gamma_pr h_qs - (F_pr+F_rp) delta_qs + 2 Y_pqrs]
    (reference oo_energy.py:311-340).

    Blocked evaluation: the full-space RDMs vanish unless EVERY index is
    in occ+act, so gamma/Gamma are built on that ns-dim sub-block and the
    Y contraction costs O(ns^4 nao^2) instead of O(nao^6) — at cc-pVDZ
    scale (ns=9, nao=43) that is a ~500x FLOP cut, which is what makes
    large-basis CASSCF/OO-VQE Hessians tractable."""
    nao = int1e_mo.shape[0]
    sub = tuple(occ_idx) + tuple(act_idx)
    ns = len(sub)
    no = len(occ_idx)
    sub_a = np.asarray(sub, dtype=int)
    # RDMs in sub coordinates (occ first, act after)
    one_sub, two_sub = full_rdms(one_rdm, two_rdm,
                                 tuple(range(no)), tuple(range(no, ns)), ns)
    # g[q, m, n, s] and g[q, s, m, n] with m, n restricted to sub
    g_qmns = int2e_mo[:, sub_a][:, :, sub_a, :]          # (nao,ns,ns,nao)
    g_qsmn = int2e_mo[:, :, sub_a][:, :, :, sub_a]       # (nao,nao,ns,ns)
    y0 = jnp.einsum("pmrn,qmns->pqrs", two_sub, g_qmns)
    y1 = jnp.einsum("pmnr,qmns->pqrs", two_sub, g_qmns)
    y2 = jnp.einsum("prmn,qsmn->pqrs", two_sub, g_qsmn)
    # 2 gamma_pr h_qs + 2 Y, nonzero only for p, r in sub
    h0_sub = (2.0 * jnp.einsum("pr,qs->pqrs", one_sub, int1e_mo)
              + 2.0 * (y0 + y1 + y2))                    # (ns,nao,ns,nao)
    all_i = np.arange(nao)
    h0 = jnp.zeros((nao,) * 4, dtype=int1e_mo.dtype)
    h0 = h0.at[np.ix_(sub_a, all_i, sub_a, all_i)].set(h0_sub)
    F = fock_generalized(int1e_mo, int2e_mo, one_rdm, two_rdm,
                         occ_idx, act_idx)
    Fs = F + F.T
    h0 = h0 - jnp.einsum("pr,qs->pqrs", Fs, jnp.eye(nao, dtype=F.dtype))
    return (h0 - jnp.transpose(h0, (0, 1, 3, 2))
            - jnp.transpose(h0, (1, 0, 2, 3))
            + jnp.transpose(h0, (1, 0, 3, 2)))


def full_hessian_to_matrix(full_hess, params_idx, nao):
    """Project the (nao,nao,nao,nao) Hessian onto non-redundant tril pairs
    (reference oo_energy.py:395-402)."""
    rows, cols = np.tril_indices(nao, k=-1)
    part = full_hess[rows, cols, :, :][:, rows, cols]
    return part[np.ix_(params_idx, params_idx)]
