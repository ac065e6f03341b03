"""Integral transforms and active-space reduction (device side, pure JAX).

TPU redesign of reference oo_energy.py:21-51 and utils/active_space.py:
111-212.  The 4-index transform is expressed as four dot_generals (each a
single MXU matmul over a reshaped tensor) rather than generic einsums, and
the active-space reduction uses static index slices so XLA sees fixed
shapes.  Everything here is AD-traceable (the hybrid Hessian
differentiates through these).
"""


import jax.numpy as jnp


def int1e_transform(int1e_ao, mo_coeff):
    """C^T h C (reference oo_energy.py:44)."""
    return mo_coeff.T @ int1e_ao @ mo_coeff


def int2e_transform(int2e_ao, mo_coeff):
    """Uniform 4-index transform of the chemist-ordered ERI tensor.

    Chained one-index transforms (reference oo_energy.py:21-41 notes the
    chained form is the efficient one); each step is a (N^3, N) x (N, N)
    matmul -> MXU-friendly.
    """
    n = int2e_ao.shape[0]
    M = int2e_ao
    for _ in range(4):
        # contract leading index, cycle axes: M[p,...] C[p,i] -> [..., i]
        M = jnp.tensordot(M, mo_coeff, axes=[[0], [0]])
    return M


def general_4index_transform(M, C0, C1, C2, C3):
    """Independent per-index transformation (reference oo_energy.py:21)."""
    for C in (C0, C1, C2, C3):
        M = jnp.tensordot(M, C, axes=[[0], [0]])
    return M


def active_space_integrals(one_body, two_body, occ_idx, act_idx):
    """Core-constant / effective-1-body / active-2-body reduction
    (chemist ordering; reference utils/active_space.py:111-174).

    occ_idx / act_idx must be static tuples so slicing is compile-time.
    """
    occ = list(occ_idx)
    act = list(act_idx)
    if len(occ) == 0:
        core = jnp.asarray(0.0, dtype=one_body.dtype)
        h_eff = one_body[jnp.ix_(jnp.array(act), jnp.array(act))]
        g_act = two_body[jnp.ix_(*[jnp.array(act)] * 4)]
        return core, h_eff, g_act
    occ_a = jnp.array(occ)
    act_a = jnp.array(act)
    g_oo = two_body[jnp.ix_(occ_a, occ_a, occ_a, occ_a)]
    core = (2.0 * jnp.sum(one_body[occ_a, occ_a])
            + 2.0 * jnp.einsum("iijj->", g_oo)
            - jnp.einsum("ijji->", g_oo))
    h_eff = (one_body[jnp.ix_(act_a, act_a)]
             + 2.0 * jnp.einsum("pqii->pq",
                                two_body[jnp.ix_(act_a, act_a, occ_a, occ_a)])
             - jnp.einsum("piiq->pq",
                          two_body[jnp.ix_(act_a, occ_a, occ_a, act_a)]))
    g_act = two_body[jnp.ix_(*[act_a] * 4)]
    return core, h_eff, g_act


def molecular_hamiltonian_coefficients(nuclear_repulsion, one_body, two_body,
                                       occ_idx=None, act_idx=None):
    """(c0, c1, c2) with c2 = 0.5 * active two-body tensor
    (reference utils/active_space.py:177-212)."""
    if occ_idx is None and act_idx is None:
        return (jnp.asarray(nuclear_repulsion, dtype=one_body.dtype),
                one_body, 0.5 * two_body)
    core, h_eff, g_act = active_space_integrals(
        one_body, two_body, occ_idx, act_idx)
    return core + nuclear_repulsion, h_eff, 0.5 * g_act


def energy_from_rdms(c0, c1, c2, one_rdm, two_rdm):
    """E = c0 + sum c1*gamma + sum c2*Gamma (reference oo_energy.py:178)."""
    return (c0 + jnp.sum(c1 * one_rdm) + jnp.sum(c2 * two_rdm))
