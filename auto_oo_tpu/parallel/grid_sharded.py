"""Row-sharded string-grid sector engine (distributed Knowles-Handy).

Shards the (Na, Nb) string grid over its ALPHA-string rows across the
mesh (shard_map): the spin factorization of ops/grid.py makes every
beta-spin operation row-LOCAL (lane work inside a device's row slab)
and confines cross-device traffic to the alpha-spin halves —

  * Phi build: alpha row gathers read the all-gathered statevector
    (D amplitudes — the SMALL object; Phi, n2 x D, never leaves its
    shard); beta is local.
  * Hamiltonian apply: the alpha reduction sum_pq E_pq Y runs as a
    SCATTER from each device's own Y rows through the host-precomputed
    inverse maps (E_pq row maps are partial injections, so dst/sign
    inverse tables exist), finished by ONE psum_scatter of a D-sized
    accumulator — Y (n2 x D, the big object) is never gathered.
  * RDM grams and energy dots reduce with one psum of (n2, n2)/scalar.

Tables arrive pre-sliced through shard_map in_specs (srcA/sgnA/tA and
the inverse dstA/sgnA tables shard their row axis; beta tables
replicate).  This is the scaling axis BEYOND single-chip HBM: at
(16e,16o) (D = 165.6M) one f64 (n2, D) Phi is 339 GB — only
row-partitioned streaming over a mesh can touch it, exactly how
distributed FCI sigma builds decompose (alpha-string partitioning).

Exactness (not performance) is pinned on the virtual CPU mesh
(tests/test_parallel.py); the layout is ICI-friendly by construction —
the one collective per H-apply is a reduce-scatter of D elements.

No reference counterpart (reference is single-process, SURVEY §2.3).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.grid import GridMaps, inverse_alpha_maps


def _padded_tables(gm, n_dev, dtype):
    """Row-axis tables padded to a multiple of the mesh axis, signs cast
    to the compute dtype (padded rows carry sign 0 everywhere, so they
    contribute exactly nothing)."""
    Na = gm.Na
    Na_pad = -(-Na // n_dev) * n_dev
    pad = Na_pad - Na

    def pr(a):          # pad the row (last) axis
        a = np.asarray(a)
        return np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])

    dst, dsg = inverse_alpha_maps(gm)
    f = lambda a: jnp.asarray(np.asarray(a), dtype)
    return {
        "srcA": jnp.asarray(pr(gm.srcA), jnp.int32),
        "sgnA": f(pr(gm.sgnA)),
        "tA": f(pr(gm.tA)),
        "dstA": jnp.asarray(pr(dst), jnp.int32),
        "dsgnA": f(pr(dsg)),
        "srcB": jnp.asarray(np.asarray(gm.srcB), jnp.int32),
        "sgnB": f(gm.sgnB),
        "tB": f(gm.tB),
    }, Na_pad


def _slice_rows(t, r0, r1):
    """Row-axis sub-slice of a device's local tables (static bounds)."""
    out = dict(t)
    for k in ("srcA", "sgnA", "tA", "dstA", "dsgnA"):
        out[k] = t[k][:, r0:r1]
    return out


def _local_phi(x_full, x_loc, t):
    """Phi for this device's row slab: (n2, rows, Nb).  Alpha gathers
    global rows of the all-gathered x; beta is a row gather of the local
    slab's transpose (lane work stays on-device)."""
    pa = (x_full[t["srcA"], :]
          * t["sgnA"][:, :, None] * t["tB"][:, None, :])
    xT_loc = x_loc.T                                  # (Nb, rows)
    pbT = (xT_loc[t["srcB"], :]
           * t["sgnB"][:, :, None] * t["tA"][:, None, :])
    return pa + jnp.swapaxes(pbT, -1, -2)


# per-device ceiling on the materialized (n2, rows, Nb) Phi/Y blocks:
# above it the local row slab is streamed in sub-chunks (static python
# loop, one full gather pass — the ops/grid.py D-axis streaming pattern
# applied per device).  1 GB keeps the (16e,16o) engine inside a v5e's
# HBM: per device the resident set is then x_full + the (Na_pad, Nb)
# alpha accumulator + one bounded block.
_LOCAL_BLOCK_BYTES = 1 << 30


def _local_row_chunk(n2, rows, nb, itemsize):
    per_row = n2 * nb * itemsize
    if rows * per_row <= _LOCAL_BLOCK_BYTES:
        return rows
    return max(1, int(_LOCAL_BLOCK_BYTES // per_row))


def _beta_reduce(Y, t):
    """Row-local beta half of sum_pq E_pq Y for a (n2, rows, Nb) block:
    transpose + row gather of the block (lane work on-device)."""
    n2 = Y.shape[0]
    rows2 = jnp.arange(n2)[:, None]
    Yt = jnp.swapaxes(Y, -1, -2)                      # (n2, Nb, rows)
    Gb = Yt[rows2, t["srcB"], :]
    outBt = jnp.sum(Gb * t["sgnB"][:, :, None] * t["tA"][:, None, :],
                    axis=0)                           # (Nb, rows)
    return outBt.T


def _alpha_scatter(acc, Y, t):
    """Scatter a (n2, rows, Nb) Y block's alpha contributions through
    the inverse row maps into the full-height accumulator."""
    contrib = Y * t["dsgnA"][:, :, None] * t["tB"][:, None, :]
    return acc.at[t["dstA"]].add(contrib)


def row_sharded_sector_fns(pqc, mesh, axis="tp", dtype=jnp.float64):
    """Build the row-sharded engine for a string-grid sector circuit.

    ``dtype`` selects the engine's compute type: jnp.float64 (default)
    for the built-in real ansatze, jnp.complex128 for custom complex
    sector states (RDMs still come back f64 — they are real for any
    state); a complex psi into a real engine raises TypeError.

    Returns a dict of jitted functions over CANONICAL-order
    statevectors (sorted-determinant, as pqc.state returns):

      rdms(psi)                  -> (gamma, Gamma), replicated
      ham_apply(c1eff, c2, psi)  -> H|psi> (canonical order, replicated)
      energy(c0, c1eff, c2, psi) -> scalar  E = c0 + <psi|H|psi>

    and, when the circuit carries a grid gate program, GRID-order /
    theta-driven entry points:

      rdms_grid(psi_g)                        -> (gamma, Gamma)
      state(theta)                            -> canonical |psi(theta)>
      energy_gradient(c0, c1eff, c2, theta)   -> (E, dE/dtheta)
      energy_gradient_psi(...)                -> (E, dE/dtheta, psi_g)

    All grid tables ride as runtime arguments, sharded on their row axis
    by shard_map in_specs; psi is padded/permuted inside the jit.
    """
    gm = pqc.sector_maps
    if not isinstance(gm, GridMaps):
        raise ValueError("row_sharded_sector_fns needs a string-grid "
                         "sector circuit (sector=True)")
    n_dev = int(mesh.shape[axis])
    tabs, Na_pad = _padded_tables(gm, n_dev, dtype)
    ncas = pqc.ncas
    n2, Na, Nb = gm.n2, gm.Na, gm.Nb
    repl = NamedSharding(mesh, P())
    row_sh = NamedSharding(mesh, P(None, axis))
    # device placement: row-axis tables sharded, beta tables replicated
    sharded_keys = ("srcA", "sgnA", "tA", "dstA", "dsgnA")
    t_dev = {k: jax.device_put(v, row_sh if k in sharded_keys else repl)
             for k, v in tabs.items()}
    t_specs = {k: (P(None, axis) if k in sharded_keys else P())
               for k in tabs}
    g2s = jax.device_put(gm.g2s, repl)
    s2g = jax.device_put(gm.s2g, repl)

    def _pad_grid(xg):
        return jnp.pad(xg.astype(dtype), ((0, Na_pad - Na), (0, 0)))

    def to_padded_grid(psi, g2s_):
        return _pad_grid(psi[g2s_].reshape(Na, Nb))

    rows_loc = Na_pad // n_dev
    itemsize = jnp.dtype(dtype).itemsize
    row_chunk = _local_row_chunk(n2, rows_loc, Nb, itemsize)

    # ---- RDMs ----------------------------------------------------------
    # accumulate RDMs in the REAL dtype (gamma/corr are real for any
    # statevector; keeps the complex128 engine's outputs f64 like the
    # single-device kernels, ops/grid.py:322)
    rdt = jnp.zeros((), dtype).real.dtype

    def _rdms_local(x_pad, t):
        x_full = jax.lax.all_gather(x_pad, axis, tiled=True)
        gamma_p = jnp.zeros((n2,), rdt)
        corr_p = jnp.zeros((n2, n2), rdt)
        for r0 in range(0, rows_loc, row_chunk):
            r1 = min(rows_loc, r0 + row_chunk)
            ts = _slice_rows(t, r0, r1)
            phi_c = _local_phi(x_full, x_pad[r0:r1], ts).reshape(n2, -1)
            gamma_p = gamma_p + jnp.real(
                phi_c @ jnp.conj(x_pad[r0:r1].reshape(-1)))
            corr_p = corr_p + jnp.real(jnp.conj(phi_c) @ phi_c.T)
        return (jax.lax.psum(gamma_p, axis),
                jax.lax.psum(corr_p, axis))

    def _rdms_padded(x, t):
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(axis, None)))
        gamma, corr = jax.shard_map(
            lambda xl, tl: _rdms_local(xl, tl),
            mesh=mesh, in_specs=(P(axis, None), t_specs),
            out_specs=(P(), P()))(x, t)
        gamma = gamma.reshape(ncas, ncas)
        corr = corr.reshape(ncas, ncas, ncas, ncas)
        epq_ers = jnp.transpose(corr, (1, 0, 2, 3))
        delta = jnp.eye(ncas, dtype=gamma.dtype)
        Gamma = epq_ers - jnp.einsum("qr,ps->pqrs", delta, gamma)
        return gamma, Gamma

    def rdms(psi, g2s_, t):
        return _rdms_padded(to_padded_grid(psi, g2s_), t)

    def rdms_grid(psi_g, t):
        # GRID-ordered input (e.g. the state returned alongside
        # energy_gradient) — skips the canonical<->grid permutations
        return _rdms_padded(_pad_grid(psi_g.reshape(Na, Nb)), t)

    rdms_jit = jax.jit(rdms, out_shardings=(repl, repl))
    rdms_grid_jit = jax.jit(rdms_grid, out_shardings=(repl, repl))

    # ---- Hamiltonian apply / energy ------------------------------------
    def _ham_local(c1f, C2, x_pad, t):
        x_full = jax.lax.all_gather(x_pad, axis, tiled=True)
        beta_parts = []
        acc = jnp.zeros((Na_pad, Nb), dtype)
        for r0 in range(0, rows_loc, row_chunk):
            r1 = min(rows_loc, r0 + row_chunk)
            ts = _slice_rows(t, r0, r1)
            phi_c = _local_phi(x_full, x_pad[r0:r1], ts)
            Y_c = (jnp.einsum("pr,rij->pij", C2, phi_c)
                   + c1f[:, None, None] * x_pad[None, r0:r1])
            beta_parts.append(_beta_reduce(Y_c, ts))
            acc = _alpha_scatter(acc, Y_c, ts)
        out_loc = (beta_parts[0] if len(beta_parts) == 1
                   else jnp.concatenate(beta_parts, axis=0))
        return out_loc + jax.lax.psum_scatter(
            acc, axis, scatter_dimension=0, tiled=True)

    def ham_apply(c1eff, c2, psi, g2s_, s2g_, t):
        c1f = c1eff.reshape(n2).astype(dtype)
        C2 = c2.reshape(n2, n2).astype(dtype)
        x = jax.lax.with_sharding_constraint(
            to_padded_grid(psi, g2s_),
            NamedSharding(mesh, P(axis, None)))
        out = jax.shard_map(
            lambda xl, tl: _ham_local(c1f, C2, xl, tl),
            mesh=mesh, in_specs=(P(axis, None), t_specs),
            out_specs=P(axis, None))(x, t)
        return out[:Na].reshape(-1)[s2g_]

    ham_jit = jax.jit(ham_apply, out_shardings=repl)

    def energy(c0, c1eff, c2, psi, g2s_, s2g_, t):
        hpsi = ham_apply(c1eff, c2, psi, g2s_, s2g_, t)
        return c0 + jnp.real(jnp.conj(psi.astype(dtype)) @ hpsi)

    energy_jit = jax.jit(energy, out_shardings=repl)

    def _chk(psi):
        # a complex state through a real-dtype engine would be silently
        # truncated by the _pad_grid cast — refuse loudly instead
        if (jnp.iscomplexobj(psi)
                and not jnp.issubdtype(dtype, jnp.complexfloating)):
            raise TypeError(
                "complex statevector into a real row-sharded engine; "
                "build row_sharded_sector_fns(..., dtype=jnp.complex128)")
        return psi

    fns = {
        "rdms": lambda psi: rdms_jit(_chk(psi), g2s, t_dev),
        "rdms_grid": lambda psi_g: rdms_grid_jit(_chk(psi_g), t_dev),
        "ham_apply": lambda c1eff, c2, psi: ham_jit(
            c1eff, c2, _chk(psi), g2s, s2g, t_dev),
        "energy": lambda c0, c1eff, c2, psi: energy_jit(
            c0, c1eff, c2, _chk(psi), g2s, s2g, t_dev),
    }

    # ---- energy + circuit gradient (grid gate program) ------------------
    # The gradient-only optimizer step at row-sharded scale: state from
    # the grid gate program under a GSPMD row partition, ONE row-sharded
    # Hamiltonian apply, then the circuit gradient as a single VJP
    # through the gate program with the constant cotangent w = 2 H|psi>
    # (E = <psi|H|psi> is quadratic and H theta-independent).  Mirrors
    # models/oo_pqc.energy_gradient_staged on the mesh.
    if getattr(pqc, "grid_program", None) is not None:
        gates_dev = jax.device_put(pqc.grid_program.device_tables(), repl)
        sh_flat = NamedSharding(mesh, P(axis))

        def _state_grid(theta, gates):
            # the state build itself is GSPMD-partitioned over the flat
            # grid vector (alpha gates become row exchanges, beta gates
            # stay local) — per-device state memory is D/n_dev, so even
            # the state never needs one device's full HBM; the adjoint
            # (reversible) VJP keeps the BACKWARD pass at O(D/n_dev)
            # residuals per device too (this fn is reverse-mode only —
            # grid2d's jacfwd engine has its own plain-apply state fn)
            psi0 = jax.lax.with_sharding_constraint(
                pqc.grid_program.initial_state(jnp.float64), sh_flat)
            out = pqc.grid_program.apply_adjoint(
                pqc._expand_theta(jnp.ravel(theta)), psi0, tables=gates)
            return jax.lax.with_sharding_constraint(out, sh_flat)

        def _ham_grid_padded(c1f, C2, xg_pad, t):
            return jax.shard_map(
                lambda xl, tl: _ham_local(c1f, C2, xl, tl),
                mesh=mesh, in_specs=(P(axis, None), t_specs),
                out_specs=P(axis, None))(xg_pad, t)

        def energy_gradient(c0, c1eff, c2, theta, gates, t):
            c1f = c1eff.reshape(n2).astype(dtype)
            C2 = c2.reshape(n2, n2).astype(dtype)
            psi_g = _state_grid(theta, gates)             # grid order
            xg = jax.lax.with_sharding_constraint(
                _pad_grid(psi_g.reshape(Na, Nb)),
                NamedSharding(mesh, P(axis, None)))
            h_pad = _ham_grid_padded(c1f, C2, xg, t)
            hpsi = h_pad[:Na].reshape(-1)
            e0 = c0 + jnp.real(jnp.conj(psi_g) @ hpsi)
            w = (2.0 * hpsi).astype(psi_g.dtype)

            def overlap(th):
                return jnp.real(_state_grid(th, gates) @ jnp.conj(w))

            return e0, jax.grad(overlap)(theta), psi_g

        # psi_g's output sharding is left to XLA (rdms_grid re-shards it
        # row-wise anyway); FORCING replication would add a D-sized
        # all-gather per call just to discard it in the 2-output wrapper
        eg_jit = jax.jit(energy_gradient,
                         out_shardings=(repl, repl, None))

        def _eg(c0, c1eff, c2, theta):
            e0, grad, _ = eg_jit(c0, c1eff, c2, theta, gates_dev, t_dev)
            return e0, grad

        fns["energy_gradient"] = _eg
        # ... and the variant that also hands back the grid-order state
        # (device-resident, already computed) so callers can reuse it —
        # e.g. rdms_grid for orbital relaxation without a second
        # gate-program pass
        fns["energy_gradient_psi"] = (
            lambda c0, c1eff, c2, theta: eg_jit(
                c0, c1eff, c2, theta, gates_dev, t_dev))

        def state(theta, gates, s2g_):
            return _state_grid(theta, gates)[s2g_]

        state_jit = jax.jit(state, out_shardings=repl)
        fns["state"] = lambda theta: state_jit(theta, gates_dev, s2g)

    return fns


def grid2d_nr_fns(oo, mesh, t_axis="tp", r_axis="row",
                  dtype=jnp.float64):
    """2D-sharded quadratic-form Newton engine: TANGENT x ROW.

    Composes the two scaling axes this package already has — the
    tangent-batch partition of the quadratic-form Hessian
    (parallel/sharding.py) and the alpha-row partition of the
    string-grid kernels (row_sharded_sector_fns) — into one mesh:
    device (i, j) holds tangent rows i of the Jacobian restricted to
    alpha-string rows j of the grid.  This is the Hessian regime BEYOND
    what either axis reaches alone: per-device memory for the dominant
    (nt, n2, D) tangent intermediates shrinks by n_tp * n_row, so a
    second-order OO-VQE step exists at (14e,14o)+ sectors where even one
    (n2, D) buffer overflows a single chip's HBM.

    Layout / collective budget per grad+Hessian call:
      * state + Jacobian: GSPMD through the grid gate program, J rows
        landing P(t_axis, r_axis) — XLA inserts the row exchanges of the
        alpha gates.
      * per tangent row: ONE all_gather of that row's D amplitudes over
        r_axis (the alpha gathers read global rows) and ONE
        psum_scatter of a D-sized accumulator — identical to the
        row-sharded H-apply, vmapped over the LOCAL tangent block only.
      * grams: the (nt, nt) circuit-circuit block needs cross-tangent
        products, paid as ONE all_gather of the local HJ slab over
        t_axis (nt * D / n_row elements); the transition-RDM grams
        contract against the tangent-replicated phi slab and reduce with
        psums of (n2, n2)-sized partials — no big-object traffic.

    Returns jitted ``grad_hess(theta, oao)``, ``energy(theta, kappa,
    oao)`` and a host-driven ``nr_step(theta, oao)`` mirroring the
    staged single-device update (same Armijo trial sequence, same
    augmentation), bit-compatible with OO_pqc._nr_iteration_jit to
    solver precision.  Exactness is pinned on the virtual mesh
    (tests/test_parallel.py); requires a string-grid sector circuit with
    a grid gate program.  No reference counterpart (SURVEY §2.3)."""
    from ..ops import transforms as _tr
    from ..ops import fock as _fock
    from ..ops import kappa as _kappa
    from ..ops import hamiltonian as _ham
    from ..ops.linalg import expm
    from ..utils.newton_raphson import newton_step_pure

    pqc = oo.pqc
    gm = getattr(pqc, "sector_maps", None)
    if not isinstance(gm, GridMaps) or pqc.grid_program is None:
        raise ValueError("grid2d_nr_fns needs a string-grid sector "
                         "circuit with a grid gate program "
                         "(sector=True)")
    n_tp = int(mesh.shape[t_axis])
    n_row = int(mesh.shape[r_axis])
    tabs, Na_pad = _padded_tables(gm, n_row, dtype)
    ncas = pqc.ncas
    n2, Na, Nb = gm.n2, gm.Na, gm.Nb
    nt = int(pqc.theta_shape)
    nt_pad = -(-nt // n_tp) * n_tp
    rows_loc = Na_pad // n_row
    itemsize = jnp.dtype(dtype).itemsize
    row_chunk = _local_row_chunk(n2, rows_loc, Nb, itemsize)
    occ, act = oo._occ, oo._act
    nao = oo.nao
    params_idx = tuple(int(i) for i in oo.params_idx)
    params_idx_dev = jnp.asarray(np.asarray(params_idx, dtype=np.int32))
    n_kappa = len(params_idx)
    tril_size = nao * (nao - 1) // 2
    newton_method = getattr(oo, "newton_method", None)

    repl = NamedSharding(mesh, P())
    grid_sh = NamedSharding(mesh, P(r_axis, None))
    sh_flat = NamedSharding(mesh, P(r_axis))
    sharded_keys = ("srcA", "sgnA", "tA", "dstA", "dsgnA")
    t_dev = {k: jax.device_put(
        v, NamedSharding(mesh, P(None, r_axis))
        if k in sharded_keys else repl) for k, v in tabs.items()}
    t_specs = {k: (P(None, r_axis) if k in sharded_keys else P())
               for k in tabs}
    gates_dev = jax.device_put(pqc.grid_program.device_tables(), repl)
    mol_dev = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl),
        (oo.int1e_ao, oo.int2e_ao, oo.oao_coeff, jnp.asarray(oo.nuc)))

    # line-search energy transforms integrals in the occ+act sub-basis
    # (same O(nao^4 ns) trick as the single-device core)
    sub = np.asarray(tuple(occ) + tuple(act), dtype=int)
    occ_rel = tuple(range(len(occ)))
    act_rel = tuple(range(len(occ), len(sub)))

    def _pad_grid(xg):
        return jnp.pad(xg.astype(dtype), ((0, Na_pad - Na), (0, 0)))

    def k2m(kappa):
        total = jnp.zeros(tril_size, dtype=kappa.dtype)
        total = total.at[params_idx_dev].set(kappa)
        return _kappa.vector_to_skew_symmetric(total, nao)

    def _state_grid(theta, gates):
        psi0 = jax.lax.with_sharding_constraint(
            pqc.grid_program.initial_state(jnp.float64), sh_flat)
        out = pqc.grid_program.apply(
            pqc._expand_theta(jnp.ravel(theta)), psi0, tables=gates)
        return jax.lax.with_sharding_constraint(out, sh_flat)

    def _hpsi_local(c1f, C2, x_loc, t):
        """One row-sharded H-apply (the _ham_local pattern, standalone
        so both the line-search energy and grad_hess reuse it)."""
        x_full = jax.lax.all_gather(x_loc, r_axis, tiled=True)
        beta_parts = []
        acc = jnp.zeros((Na_pad, Nb), dtype)
        for r0 in range(0, rows_loc, row_chunk):
            r1 = min(rows_loc, r0 + row_chunk)
            ts = _slice_rows(t, r0, r1)
            phi_c = _local_phi(x_full, x_loc[r0:r1], ts)
            Y_c = (jnp.einsum("pr,rij->pij", C2, phi_c)
                   + c1f[:, None, None] * x_loc[None, r0:r1])
            beta_parts.append(_beta_reduce(Y_c, ts))
            acc = _alpha_scatter(acc, Y_c, ts)
        out_loc = (beta_parts[0] if len(beta_parts) == 1
                   else jnp.concatenate(beta_parts, axis=0))
        return out_loc + jax.lax.psum_scatter(
            acc, r_axis, scatter_dimension=0, tiled=True)

    def _hpsi_pad(c1f, C2, x_pad, t):
        return jax.shard_map(
            lambda xl, tl: _hpsi_local(c1f, C2, xl, tl),
            mesh=mesh, in_specs=(P(r_axis, None), t_specs),
            out_specs=P(r_axis, None))(x_pad, t)

    def _coeffs(int1e_ao, int2e_ao, oao_coeff, nuc, oao):
        mo = oao_coeff @ oao
        h1 = _tr.int1e_transform(int1e_ao, mo)
        g2 = _tr.int2e_transform(int2e_ao, mo)
        c0, c1, c2 = _tr.molecular_hamiltonian_coefficients(
            nuc, h1, g2, occ, act)
        c1f = _ham.c1_effective(c1, c2).reshape(n2).astype(dtype)
        C2 = c2.reshape(n2, n2).astype(dtype)
        return h1, g2, c0, c1f, C2

    def _pack(h1, g2, g1, G2):
        grad4 = _fock.analytic_gradient_from_integrals(
            h1, g2, g1, G2, occ, act)
        return _kappa.skew_symmetric_to_vector(grad4)[params_idx_dev]

    def grad_hess(theta, oao, int1e_ao, int2e_ao, oao_coeff, nuc,
                  gates, t):
        h1, g2, c0, c1f, C2 = _coeffs(int1e_ao, int2e_ao, oao_coeff,
                                      nuc, oao)
        psi_g = _state_grid(theta, gates)
        Jg = jax.jacfwd(lambda th: _state_grid(th, gates))(theta).T
        x_pad = jax.lax.with_sharding_constraint(
            _pad_grid(psi_g.reshape(Na, Nb)), grid_sh)
        J3 = jnp.pad(Jg.reshape(nt, Na, Nb).astype(dtype),
                     ((0, nt_pad - nt), (0, Na_pad - Na), (0, 0)))
        J3 = jax.lax.with_sharding_constraint(
            J3, NamedSharding(mesh, P(t_axis, r_axis, None)))

        h_pad = _hpsi_pad(c1f, C2, x_pad, t)
        hpsi = h_pad[:Na].reshape(-1)
        e0 = c0 + jnp.real(jnp.conj(psi_g) @ hpsi)
        w = 2.0 * hpsi
        w_pad = jax.lax.with_sharding_constraint(
            _pad_grid(w.reshape(Na, Nb)), grid_sh)
        # hess_cc re-differentiation term (GSPMD; nt x nt output)
        term2 = jax.jacfwd(jax.grad(
            lambda th: jnp.real(_state_grid(th, gates)
                                @ jnp.conj(w))))(theta)

        def tangent_local(J_loc, x_loc, w_loc, t):
            # phi slab for THIS row shard (tangent-replicated): built
            # once, reused by every local tangent's transition RDMs
            x_full = jax.lax.all_gather(x_loc, r_axis, tiled=True)
            phi_loc = _local_phi(x_full, x_loc, t)   # (n2, rows, Nb)
            phiF = phi_loc.reshape(n2, -1)
            xf = x_loc.reshape(-1)
            gamma_p = jax.lax.psum(jnp.real(phiF @ jnp.conj(xf)),
                                   r_axis)
            corr_p = jax.lax.psum(
                jnp.real(jnp.conj(phiF) @ phiF.T), r_axis)

            def body(J_i):                           # (rows_loc, Nb)
                Ji_full = jax.lax.all_gather(J_i, r_axis, tiled=True)
                acc = jnp.zeros((Na_pad, Nb), dtype)
                beta_parts = []
                dgram_i = jnp.zeros((n2, n2), dtype)
                dgamma_i = jnp.zeros((n2,), dtype)
                for r0 in range(0, rows_loc, row_chunk):
                    r1 = min(rows_loc, r0 + row_chunk)
                    ts = _slice_rows(t, r0, r1)
                    phiJ_c = _local_phi(Ji_full, J_i[r0:r1], ts)
                    Y_c = (jnp.einsum("pr,rij->pij", C2, phiJ_c)
                           + c1f[:, None, None] * J_i[None, r0:r1])
                    beta_parts.append(_beta_reduce(Y_c, ts))
                    acc = _alpha_scatter(acc, Y_c, ts)
                    phiJf = phiJ_c.reshape(n2, -1)
                    phiFc = phi_loc[:, r0:r1].reshape(n2, -1)
                    dgram_i = dgram_i + jnp.real(
                        jnp.conj(phiJf) @ phiFc.T
                        + jnp.conj(phiFc) @ phiJf.T)
                    dgamma_i = dgamma_i + jnp.real(
                        phiJf @ jnp.conj(x_loc[r0:r1].reshape(-1))
                        + phiFc @ jnp.conj(J_i[r0:r1].reshape(-1)))
                HJ_i = ((beta_parts[0] if len(beta_parts) == 1
                         else jnp.concatenate(beta_parts, axis=0))
                        + jax.lax.psum_scatter(
                            acc, r_axis, scatter_dimension=0,
                            tiled=True))
                gc_i = jnp.real(jnp.conj(J_i.reshape(-1))
                                @ w_loc.reshape(-1))
                return HJ_i, dgram_i, dgamma_i, gc_i

            HJ_loc, dgram_l, dgamma_l, gc_l = jax.lax.map(body, J_loc)
            grad_c_p = jax.lax.psum(gc_l, r_axis)
            dgram = jax.lax.psum(dgram_l, r_axis)
            dgamma = jax.lax.psum(dgamma_l, r_axis)
            # cross-tangent gram: ONE all_gather of the HJ slab over the
            # tangent axis, then an MXU contraction over local rows
            HJ_all = jax.lax.all_gather(HJ_loc, t_axis, tiled=True)
            G_rows = jax.lax.psum(
                jnp.einsum("ikl,jkl->ij", jnp.conj(J_loc), HJ_all),
                r_axis)
            return grad_c_p, G_rows, dgram, dgamma, gamma_p, corr_p

        (grad_c_pad, G_rows, dgram, dgamma, gamma_f,
         corr_f) = jax.shard_map(
            tangent_local, mesh=mesh,
            in_specs=(P(t_axis, r_axis, None), P(r_axis, None),
                      P(r_axis, None), t_specs),
            out_specs=(P(t_axis), P(t_axis, None),
                       P(t_axis, None, None), P(t_axis, None),
                       P(), P()))(J3, x_pad, w_pad, t)

        grad_c = jnp.real(grad_c_pad[:nt])
        hess_cc = 2.0 * jnp.real(G_rows[:nt, :nt]) + term2
        gamma = gamma_f.reshape(ncas, ncas)
        corr = corr_f.reshape(ncas, ncas, ncas, ncas)
        delta = jnp.eye(ncas, dtype=gamma.dtype)
        Gamma = (jnp.transpose(corr, (1, 0, 2, 3))
                 - jnp.einsum("qr,ps->pqrs", delta, gamma))
        grad_o = _pack(h1, g2, gamma, Gamma)
        if n_kappa:
            G0 = _pack(h1, g2, jnp.zeros_like(gamma),
                       jnp.zeros_like(Gamma))
            dgamma2 = dgamma[:nt].reshape(nt, ncas, ncas)
            dcorr = dgram[:nt].reshape(nt, ncas, ncas, ncas, ncas)
            dGamma = (jnp.transpose(dcorr, (0, 2, 1, 3, 4))
                      - jnp.einsum("qr,ips->ipqrs", delta, dgamma2))
            oc = jax.vmap(lambda g1, G2: _pack(h1, g2, g1, G2))(
                dgamma2, dGamma) - G0[None, :]
            hess_oc = oc.T.reshape(n_kappa, nt)
        else:
            hess_oc = jnp.zeros((0, nt), dtype=jnp.float64)
        hess4 = _fock.analytic_hessian_from_integrals(
            h1, g2, gamma, Gamma, occ, act)
        hess_oo = _fock.full_hessian_to_matrix(hess4, params_idx, nao)
        grad = jnp.concatenate([grad_c, grad_o])
        hess = jnp.block([[hess_cc.reshape(nt, nt), hess_oc.T],
                          [hess_oc, hess_oo]])
        return e0, grad, hess.astype(jnp.float64)

    def energy(theta, kappa, oao, int1e_ao, int2e_ao, oao_coeff, nuc,
               gates, t):
        mo = oao_coeff @ oao @ expm(-k2m(kappa))
        mo_sub = mo[:, sub]
        h1s = _tr.int1e_transform(int1e_ao, mo_sub)
        g2s = _tr.int2e_transform(int2e_ao, mo_sub)
        c0, c1, c2 = _tr.molecular_hamiltonian_coefficients(
            nuc, h1s, g2s, occ_rel, act_rel)
        c1f = _ham.c1_effective(c1, c2).reshape(n2).astype(dtype)
        C2 = c2.reshape(n2, n2).astype(dtype)
        psi_g = _state_grid(theta, gates)
        x_pad = jax.lax.with_sharding_constraint(
            _pad_grid(psi_g.reshape(Na, Nb)), grid_sh)
        hpsi = _hpsi_pad(c1f, C2, x_pad, t)[:Na].reshape(-1)
        return c0 + jnp.real(jnp.conj(psi_g) @ hpsi)

    gh_jit = jax.jit(grad_hess, out_shardings=(repl, repl, repl))
    e_jit = jax.jit(energy, out_shardings=repl)
    solve_jit = jax.jit(lambda g, h, mu, rho, lm: newton_step_pure(
        g, h, mu=mu, rho=rho, lambda_min=lm, method=newton_method))
    fold_jit = jax.jit(lambda oao, kp: oao @ expm(-k2m(kp)))

    def nr_step(theta, oao, alpha=1e-4, beta=0.5, mu=1e-6, rho=1.1,
                lambda_min=1e-6, lmax=20):
        """Host-driven damped Newton update (the newton_update_staged
        pattern: grad+Hessian and each Armijo trial are separate
        modest-peak device programs — right for the large-D regime this
        engine exists for)."""
        theta = jnp.ravel(jnp.asarray(theta))
        e0, grad, hess = gh_jit(theta, oao, *mol_dev, gates_dev, t_dev)
        dp, lowest = solve_jit(grad, hess, mu, rho, lambda_min)
        flat0 = jnp.concatenate(
            [theta, jnp.zeros(n_kappa, dtype=theta.dtype)])
        e0_f = float(e0)
        gdp = float(grad @ dp)
        slack = 64.0 * np.finfo(np.float64).eps * max(1.0, abs(e0_f))
        t_step, e_t = 1.0, None
        for _ in range(lmax):
            trial = flat0 + t_step * dp
            e_t = float(e_jit(trial[:nt], trial[nt:], oao, *mol_dev,
                              gates_dev, t_dev))
            if e_t <= e0_f + alpha * t_step * gdp + slack:
                break
            t_step *= beta
        else:
            t_step, e_t = 0.0, e0_f
        new_flat = flat0 + t_step * dp
        new_theta, new_kappa = new_flat[:nt], new_flat[nt:]
        new_oao = fold_jit(oao, new_kappa)
        return new_theta, new_kappa, new_oao, jnp.asarray(e_t), lowest

    return {
        "grad_hess": lambda theta, oao: gh_jit(
            jnp.ravel(jnp.asarray(theta)), oao, *mol_dev, gates_dev,
            t_dev),
        "energy": lambda theta, kappa, oao: e_jit(
            jnp.ravel(jnp.asarray(theta)), kappa, oao, *mol_dev,
            gates_dev, t_dev),
        "nr_step": nr_step,
    }


def row_sharded_gradient_optimization(oo, mesh, axis="tp",
                                      theta_init=None, **kwargs):
    """OO_pqc.gradient_optimization with every large-D stage on the
    mesh: the state build, the Hamiltonian apply, the circuit-gradient
    VJP and the RDM extraction run row-sharded (row_sharded_sector_fns);
    the optimizer loop itself IS OO_pqc.gradient_optimization, driven
    through its eval_fn hook — one loop, two execution backends.  The
    orbital-relaxation RDMs reuse the grid-order state computed with the
    gradient (no second gate-program pass).  Accepts the same kwargs as
    gradient_optimization; returns (energy_l, theta)."""
    from ..ops import hamiltonian as _ham

    eng = row_sharded_sector_fns(oo.pqc, mesh, axis)
    if "energy_gradient_psi" not in eng:
        raise ValueError("row-sharded gradient optimization needs a "
                         "grid gate program (sector=True circuit)")

    def eval_fn(theta):
        c0, c1, c2 = oo.get_active_integrals(oo.mo_coeff)
        c1eff = _ham.c1_effective(c1, c2)
        e, grad_c, psi_g = eng["energy_gradient_psi"](c0, c1eff, c2,
                                                      theta)
        return e, grad_c, (lambda: eng["rdms_grid"](psi_g))

    theta0 = (oo.pqc.init_zeros() if theta_init is None
              else jnp.asarray(theta_init))
    return oo.gradient_optimization(theta0, eval_fn=eval_fn, **kwargs)
