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

from ..ops.grid import GridMaps


def inverse_alpha_maps(gm):
    """Host inverse of the alpha E_pq row maps: dst[k, m] = the output
    row that reads source row m for pair k (with its sign), 0/0 where no
    output row does.  Exists because each pair's row map is a partial
    injection (an excitation bijects occupation subsets)."""
    srcA = np.asarray(gm.srcA)
    sgnA = np.asarray(gm.sgnA)
    dst = np.zeros_like(srcA)
    dsg = np.zeros_like(sgnA)
    ks, iis = np.nonzero(sgnA != 0)
    dst[ks, srcA[ks, iis]] = iis
    dsg[ks, srcA[ks, iis]] = sgnA[ks, iis]
    return dst, dsg


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
    def _rdms_local(x_pad, t):
        x_full = jax.lax.all_gather(x_pad, axis, tiled=True)
        gamma_p = jnp.zeros((n2,), dtype)
        corr_p = jnp.zeros((n2, n2), dtype)
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

    fns = {
        "rdms": lambda psi: rdms_jit(psi, g2s, t_dev),
        "rdms_grid": lambda psi_g: rdms_grid_jit(psi_g, t_dev),
        "ham_apply": lambda c1eff, c2, psi: ham_jit(
            c1eff, c2, psi, g2s, s2g, t_dev),
        "energy": lambda c0, c1eff, c2, psi: energy_jit(
            c0, c1eff, c2, psi, g2s, s2g, t_dev),
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
            # the state never needs one device's full HBM
            psi0 = jax.lax.with_sharding_constraint(
                pqc.grid_program.initial_state(jnp.float64), sh_flat)
            out = pqc.grid_program.apply(
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
