"""Statevector and two-electron-transform sharding (GSPMD).

The two memory-scaling axes of the problem (SURVEY.md section 5) are the
statevector (4^ncas, or the C(n,na)*C(n,nb) sector basis) and the AO
integral tensor (nao^4).  Both are sharded here with jax.sharding
annotations and compiled under one jit — XLA inserts the collectives (the
scaling-book recipe: pick a mesh, annotate, let GSPMD partition).

Design notes:
* The statevector is sharded on its single dimension.  Gate application
  is gather-based, so XLA partitions each pair-rotation into local work
  plus boundary exchanges; exactness (not performance) is what the
  virtual-mesh tests pin — bit-locality-aware qubit remapping (keeping
  hot qubits in the low bits so exchanges ride ICI neighbors) is the
  next-level optimization and orthogonal to correctness.
* SECTOR mode composes: a sector-projected GateProgram and its E_pq
  gather maps are just smaller tables, so the same sharded functions run
  on the sector vector (pass a sector Parameterized_circuit).
* Gate tables, sector maps and molecule arrays travel as runtime
  ARGUMENTS of the jitted programs (closure capture would embed them as
  program constants — the compile-service failure mode documented in
  models/oo_pqc.py:25-30).
* The RDM kernel keeps Phi = E_pq|psi> sharded over the state dimension
  ((ncas^2, D) with D sharded), so the gram matrix Phi @ Phi^T is a
  psum-reduced local contraction — the MXU does the work, the mesh only
  sees the (ncas^2)^2 result.
* The 2e transform shards the LEADING AO axis of the nao^4 tensor; each
  chained one-index contraction is a local (N^3/k, N) x (N, N) matmul
  with a reduce-scatter/all-gather pair on the cycled axis.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import rdms as _rdms
from ..ops import transforms as _tr


def _repl(mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def sharded_state_fn(pqc, mesh, axis="tp"):
    """theta -> |psi(theta)> with the statevector sharded over `axis`.

    Exact (same gate program as the single-device path, full-space or
    sector); gate tables are runtime arguments."""
    sh = NamedSharding(mesh, P(axis))
    program = pqc.program
    if program is None:
        raise ValueError("sharded_state_fn needs a compiled GateProgram")

    def state(theta, gates):
        full = pqc._expand_theta(jnp.ravel(theta))
        psi0 = jax.lax.with_sharding_constraint(
            program.initial_state(full.dtype), sh)
        return program.apply(full, psi0, tables=gates)

    state_jit = jax.jit(state, out_shardings=sh)
    gates = _repl(mesh, pqc._tables(flat_sector_maps=True)["gates"])

    def run(theta):
        return state_jit(theta, gates)

    return run


def sharded_rdms_fn(pqc, mesh, axis="tp", shard_gates=True):
    """theta -> (gamma, Gamma) with the statevector AND the Phi
    intermediate sharded over `axis`; RDM outputs are replicated.
    Works for sector circuits (the sector E_pq maps ride along as
    runtime arguments).

    shard_gates=False applies the gate scan on a REPLICATED statevector
    and shards only from the E_pq/gram stage (where the FLOPs are): the
    sharded scan needs one boundary exchange per gate, which is the right
    layout on real multi-chip ICI but trips the XLA CPU in-process
    communicator's hard 40 s rendezvous deadline on a single-core virtual
    mesh at large D — the low-collective layout (3 rendezvous per
    forward) is the safe validation path there."""
    sh_vec = NamedSharding(mesh, P(axis))
    sh_phi = NamedSharding(mesh, P(None, axis))
    repl = NamedSharding(mesh, P())
    program = pqc.program
    if program is None:
        raise ValueError("sharded_rdms_fn needs a compiled GateProgram")
    ncas = pqc.ncas
    utd = pqc.up_then_down

    def rdms(theta, tables):
        full = pqc._expand_theta(jnp.ravel(theta))
        psi0 = program.initial_state(full.dtype)
        if shard_gates:
            psi0 = jax.lax.with_sharding_constraint(psi0, sh_vec)
        psi = program.apply(full, psi0, tables=tables["gates"])
        psi = jax.lax.with_sharding_constraint(psi, sh_vec)
        maps = tables.get("maps")
        phi = _rdms.apply_epq_all(psi, ncas, utd, maps=maps)
        phi = jax.lax.with_sharding_constraint(phi, sh_phi)
        gamma = jnp.real(phi @ jnp.conj(psi)).reshape(ncas, ncas)
        corr = jnp.real(_rdms.gram_last(jnp.conj(phi), phi)).reshape(
            ncas, ncas, ncas, ncas)
        epq_ers = jnp.transpose(corr, (1, 0, 2, 3))
        delta = jnp.eye(ncas, dtype=gamma.dtype)
        Gamma = epq_ers - jnp.einsum("qr,ps->pqrs", delta, gamma)
        return gamma, Gamma

    rdms_jit = jax.jit(rdms, out_shardings=(repl, repl))
    tables = _repl(mesh, pqc._tables(flat_sector_maps=True))

    def run(theta):
        return rdms_jit(theta, tables)

    return run


def _pad_to(n, k):
    return ((n + k - 1) // k) * k


def sharded_int2e_transform_fn(mesh, axis="tp"):
    """(int2e_ao, mo_coeff) -> MO-basis ERI tensor with the nao^4 tensor
    sharded on its leading axis throughout the 4 chained contractions.

    GSPMD requires the sharded dimension to divide by the axis size, so
    all four AO axes are zero-padded to the next multiple (zero basis
    rows contract to zero — the [:nao]^4 block is exact) and sliced back
    at the end.  For realistic nao >> mesh the padding overhead vanishes."""
    n_dev = int(mesh.shape[axis])
    sh = NamedSharding(mesh, P(axis, None, None, None))

    def transform(int2e_ao, mo):
        nao = int2e_ao.shape[0]
        npad = _pad_to(nao, n_dev)
        M = jnp.zeros((npad,) * 4, dtype=int2e_ao.dtype)
        M = M.at[:nao, :nao, :nao, :nao].set(int2e_ao)
        C = jnp.zeros((npad, npad), dtype=mo.dtype).at[:nao, :nao].set(mo)
        M = jax.lax.with_sharding_constraint(M, sh)
        for _ in range(4):
            M = jnp.tensordot(M, C, axes=[[0], [0]])
            M = jax.lax.with_sharding_constraint(M, sh)
        return M[:nao, :nao, :nao, :nao]

    return jax.jit(transform)


def sharded_energy_fn(oo, mesh, sv_axis="tp", eri_axis="tp"):
    """(theta, kappa, oao_mo_coeff) -> E with the statevector sharded over
    `sv_axis` and the 2e transform sharded over `eri_axis` — the full
    forward pass partitioned over the mesh.  Composes with sector mode;
    all molecule arrays / gate tables / sector maps are runtime args."""
    from ..ops.linalg import expm

    pqc = oo.pqc
    repl = NamedSharding(mesh, P())
    sh_vec = NamedSharding(mesh, P(sv_axis))
    sh_phi = NamedSharding(mesh, P(None, sv_axis))
    sh_eri = NamedSharding(mesh, P(eri_axis, None, None, None))
    program = pqc.program
    if program is None:
        raise ValueError("sharded_energy_fn needs a compiled GateProgram")
    ncas = pqc.ncas
    utd = pqc.up_then_down
    nao = int(oo.nao)
    n_dev = int(mesh.shape[eri_axis])
    npad = _pad_to(nao, n_dev)
    int2e_pad = jnp.zeros((npad,) * 4, dtype=oo.int2e_ao.dtype)
    int2e_pad = int2e_pad.at[:nao, :nao, :nao, :nao].set(oo.int2e_ao)
    int2e_sharded = jax.device_put(int2e_pad, sh_eri)
    occ, act = oo._occ, oo._act
    kappa_vector_to_matrix = oo.kappa_vector_to_matrix

    def energy(theta, kappa, oao_mo_coeff, int1e, int2e_p, oao_c, nuc,
               tables):
        mo = oao_c @ oao_mo_coeff
        mo = mo @ expm(-kappa_vector_to_matrix(kappa))
        # sharded statevector + RDMs (sector maps ride along in `tables`)
        full = pqc._expand_theta(jnp.ravel(theta))
        psi = jax.lax.with_sharding_constraint(
            program.initial_state(full.dtype), sh_vec)
        psi = program.apply(full, psi, tables=tables["gates"])
        phi = _rdms.apply_epq_all(psi, ncas, utd, maps=tables.get("maps"))
        phi = jax.lax.with_sharding_constraint(phi, sh_phi)
        gamma = jnp.real(phi @ jnp.conj(psi)).reshape(ncas, ncas)
        corr = jnp.real(_rdms.gram_last(jnp.conj(phi), phi)).reshape(
            ncas, ncas, ncas, ncas)
        Gamma = (jnp.transpose(corr, (1, 0, 2, 3))
                 - jnp.einsum("qr,ps->pqrs",
                              jnp.eye(ncas, dtype=gamma.dtype), gamma))
        # sharded 2e transform (padded axes, see sharded_int2e_transform_fn)
        h1 = _tr.int1e_transform(int1e, mo)
        C = jnp.zeros((npad, npad), dtype=mo.dtype).at[:nao, :nao].set(mo)
        g2 = int2e_p
        for _ in range(4):
            g2 = jnp.tensordot(g2, C, axes=[[0], [0]])
            g2 = jax.lax.with_sharding_constraint(g2, sh_eri)
        g2 = g2[:nao, :nao, :nao, :nao]
        c0, c1, c2 = _tr.molecular_hamiltonian_coefficients(
            nuc, h1, g2, occ, act)
        return _tr.energy_from_rdms(c0, c1, c2, gamma, Gamma)

    energy_jit = jax.jit(energy, out_shardings=repl)
    args = _repl(mesh, (oo.int1e_ao, oo.oao_coeff, jnp.asarray(oo.nuc),
                        pqc._tables(flat_sector_maps=True)))
    int1e_r, oao_c_r, nuc_r, tables_r = args

    def run(theta, kappa, oao_mo_coeff):
        return energy_jit(theta, kappa, oao_mo_coeff, int1e_r,
                          int2e_sharded, oao_c_r, nuc_r, tables_r)

    return run
