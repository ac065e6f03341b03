"""Multi-chip scale-out: device meshes, sharded Hessians, geometry batches.

The reference is strictly single-process/single-device (SURVEY.md section
2.3) — parallelism here is new TPU-native capability, not a port:

* **Hessian-column sharding ("tp")**: the dominant cost of a Newton step
  is the dense (n_theta + n_kappa)^2 Hessian, built from
  Hessian-vector products through the statevector simulator.  HVPs for
  different basis vectors are independent, so the basis is sharded over
  the mesh and XLA partitions the vmapped forward-over-reverse pass; the
  result rows come back sharded and concatenate into the full matrix.

* **Geometry batching ("dp")**: potential-energy-surface scans and
  Berry-phase loops evaluate the same functional over many geometries;
  stacked integral tensors are vmapped and sharded over a data axis.

Everything uses jax.sharding.Mesh + NamedSharding (GSPMD); collectives
are inserted by XLA and ride ICI on real hardware.
"""


import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=None, names=("dp", "tp"), devices=None):
    """Create a Mesh over available devices.  shape=None puts all devices
    on the last axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1,) * (len(names) - 1) + (n,)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, names)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _replicated_mol_args(oo, mesh, flat_sector_maps=False):
    """The molecule runtime-argument bundle (AO integrals, OAO coeffs,
    nuclear repulsion, gate tables) replicated over the mesh.  These
    always travel as ARGUMENTS of the sharded programs — closure capture
    would re-embed them as program constants, the compile-service failure
    mode the single-device core was redesigned to avoid
    (models/oo_pqc.py:25-30).

    ``flat_sector_maps`` swaps the string-grid sector maps for the flat
    (2, n2, D) gather tables — required when the STATE dimension itself
    is sharded (the mesh cores then shard the flat determinant axis,
    which the grid kernels' permutations/reshapes would turn into
    unprofiled collectives).  With tangent-only sharding the string-grid
    kernels partition cleanly over the batch axis and stay the default:
    they are 4-22x faster on chip and their (n2, Na)+(n2, Nb) tables stay
    kilobytes where the flat (2, n2, D) tables reach GBs (18.5 GB at
    (14e,14o) — memory-infeasible)."""
    repl = NamedSharding(mesh, P())
    mol_args = oo._mol_args
    if flat_sector_maps and getattr(oo.pqc, "sector", False):
        mol_args = mol_args[:4] + (
            oo.pqc._tables(flat_sector_maps=True),)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), mol_args)


def _want_flat_maps(oo, state_axis, sector_maps):
    """Resolve the ``sector_maps`` choice ('auto' | 'grid' | 'flat') to
    the flat_sector_maps flag of _replicated_mol_args.  'auto' keeps the
    string-grid kernels whenever the pqc carries grid maps and the state
    dimension is not sharded; explicit 'grid' asserts availability."""
    from ..ops.grid import GridMaps

    if sector_maps not in ("auto", "grid", "flat"):
        raise ValueError(f"sector_maps must be 'auto', 'grid' or 'flat', "
                         f"got {sector_maps!r}")
    has_grid = isinstance(getattr(oo.pqc, "sector_maps", None), GridMaps)
    if sector_maps == "grid":
        if not has_grid:
            raise ValueError("sector_maps='grid' but the circuit has no "
                             "string-grid sector maps")
        if state_axis is not None:
            raise ValueError("sector_maps='grid' requires state_axis=None "
                             "(the grid kernels shard the tangent batch, "
                             "not the determinant axis)")
        return False
    if sector_maps == "flat":
        return True
    return not (has_grid and state_axis is None)


def sharded_full_hessian_fn(oo, mesh, axis="tp"):
    """Build a jitted function (theta, oao_mo_coeff) -> full AD Hessian of
    the hybrid energy, with HVP columns sharded over `axis` of `mesh`.

    This is the INDEPENDENT cross-check formulation (pure AD through the
    energy); the production multi-chip path is sharded_nr_step_fn's
    quadratic-form core.  Rows are padded to a multiple of the axis size;
    the returned function slices the padding off again.  Molecule arrays
    travel as runtime arguments."""
    nt = int(oo.pqc.theta_shape)
    nk = int(oo.n_kappa)
    n = nt + nk
    n_dev = mesh.shape[axis]
    n_pad = _round_up(n, n_dev)
    core_energy = oo._core["energy"]
    mol_args = _replicated_mol_args(oo, mesh)

    def hess_rows(basis, flat0, oao, *margs):
        # margs (incl. integer gate tables) are runtime args of the JIT
        # but non-differentiated: the closure below captures their
        # TRACERS, so nothing is baked into the program as a constant
        def energy_flat(flat):
            return core_energy(flat[:nt], flat[nt:], oao, *margs)

        def hvp(v):
            return jax.jvp(jax.grad(energy_flat), (flat0,), (v,))[1]
        return jax.vmap(hvp)(basis)

    basis = jnp.eye(n_pad, n, dtype=jnp.float64)
    basis_sharding = NamedSharding(mesh, P(axis, None))
    repl = NamedSharding(mesh, P())

    hess_rows_jit = jax.jit(
        hess_rows,
        in_shardings=(basis_sharding, repl, repl) + (repl,) * 5,
        out_shardings=NamedSharding(mesh, P(axis, None)))

    def full_hessian(theta, oao_mo_coeff):
        flat0 = jnp.concatenate(
            [jnp.ravel(theta), jnp.zeros(nk, dtype=jnp.float64)])
        b = jax.device_put(basis, basis_sharding)
        rows = hess_rows_jit(b, flat0, oao_mo_coeff, *mol_args)
        return rows[:n]

    return full_hessian


def sharded_grad_hess_fn(oo, mesh, axis="tp", state_axis=None,
                         sector_maps="auto"):
    """(theta, oao) -> (energy, gradient, Hessian) — THE fast
    quadratic-form formulation (models/oo_pqc.py grad_hess: batched
    Hamiltonian-apply + transition RDMs, the 167x-vs-torch path) with the
    tangent batch sharded over `axis` and the statevector dimension
    optionally sharded over `state_axis`.  Molecule arrays and gate
    tables are runtime arguments replicated over the mesh.

    ``sector_maps``: 'auto' (string-grid kernels when available and
    state_axis is None — the fast, memory-light path that scales to
    (14e,14o) sectors where flat tables cannot exist), 'grid', 'flat'."""
    from ..models.oo_pqc import _nr_core_for

    core = _nr_core_for(oo.pqc, oo.nao, oo._occ, oo._act, oo.params_idx,
                        mesh=mesh, tangent_axis=axis,
                        state_axis=state_axis)
    mol_args = _replicated_mol_args(
        oo, mesh,
        flat_sector_maps=_want_flat_maps(oo, state_axis, sector_maps))

    def run(theta, oao):
        return core["grad_hess_jit"](jnp.ravel(theta), oao, *mol_args)

    return run


def sharded_nr_step_fn(oo, mesh, axis="tp", state_axis=None, alpha=1e-4,
                       beta=0.5, mu=1e-6, rho=1.1, lambda_min=1e-6,
                       sector_maps="auto"):
    """Jitted multi-device Newton-Raphson step running the FAST
    quadratic-form core (not the pure-AD HVP formulation): sharded
    grad+Hessian, then the replicated augmented solve + Armijo line
    search + MO update.  Returns
    (theta, oao) -> (new_theta, new_kappa, new_oao, energy, lowest_eig),
    bit-matching the single-device OO_pqc._nr_iteration_jit.

    ``sector_maps`` as in sharded_grad_hess_fn: 'auto' keeps the
    string-grid kernels under tangent-only sharding."""
    from ..models.oo_pqc import _nr_core_for

    core = _nr_core_for(oo.pqc, oo.nao, oo._occ, oo._act, oo.params_idx,
                        mesh=mesh, tangent_axis=axis,
                        state_axis=state_axis)
    mol_args = _replicated_mol_args(
        oo, mesh,
        flat_sector_maps=_want_flat_maps(oo, state_axis, sector_maps))

    def run(theta, oao):
        return core["nr_iteration_jit"](
            jnp.ravel(theta), oao, *mol_args, alpha, beta, mu, rho,
            lambda_min)

    return run


class GeometryBatch:
    """Stacked-geometry evaluation (dp axis): one functional, many
    molecules — the scaling axis for PES scans / Berry-phase loops
    (BASELINE.json config 5)."""

    def __init__(self, mols, ncas, nelecas, pqc, mesh=None, axis="dp",
                 freeze_active=True):
        from ..models.oo_pqc import OO_pqc
        self.oo_list = [OO_pqc(pqc, m, ncas, nelecas,
                               freeze_active=freeze_active) for m in mols]
        self.pqc = pqc
        oo0 = self.oo_list[0]
        self.oo0 = oo0
        self.mesh = mesh
        self.axis = axis
        self.int1e = jnp.stack([oo.int1e_ao for oo in self.oo_list])
        self.int2e = jnp.stack([oo.int2e_ao for oo in self.oo_list])
        self.oao_c = jnp.stack([oo.oao_coeff for oo in self.oo_list])
        self.nuc = jnp.array([oo.nuc for oo in self.oo_list])
        if mesh is not None:
            sh = NamedSharding(mesh, P(axis))
            self.int1e = jax.device_put(self.int1e, sh)
            self.int2e = jax.device_put(self.int2e, sh)
            self.oao_c = jax.device_put(self.oao_c, sh)

        from ..ops import transforms as _tr
        from ..ops.linalg import expm

        def energy_one(int1e, int2e, oao_c, nuc, theta, kappa, oao_mo):
            mo = (oao_c @ oao_mo) @ expm(
                -oo0.kappa_vector_to_matrix(kappa))
            one_rdm, two_rdm = pqc._rdms_impl(theta)
            h1 = _tr.int1e_transform(int1e, mo)
            g2 = _tr.int2e_transform(int2e, mo)
            c0, c1, c2 = _tr.molecular_hamiltonian_coefficients(
                nuc, h1, g2, oo0._occ, oo0._act)
            return _tr.energy_from_rdms(c0, c1, c2, one_rdm, two_rdm)

        self._energy_batch = jax.jit(jax.vmap(
            energy_one, in_axes=(0, 0, 0, 0, 0, 0, 0)))
        self._grad_batch = jax.jit(jax.vmap(
            jax.grad(energy_one, argnums=(4, 5)),
            in_axes=(0, 0, 0, 0, 0, 0, 0)))

    def energies(self, thetas, kappas, oao_mos):
        """Batched E(theta_i, kappa_i) over all geometries at once."""
        return self._energy_batch(self.int1e, self.int2e, self.oao_c,
                                  self.nuc, thetas, kappas, oao_mos)

    def gradients(self, thetas, kappas, oao_mos):
        """Batched (dE/dtheta, dE/dkappa)."""
        return self._grad_batch(self.int1e, self.int2e, self.oao_c,
                                self.nuc, thetas, kappas, oao_mos)

    # -- batched damped-Newton optimization (the dp axis as an actual
    # optimizer, not just forward/gradient evaluation) -------------------

    def _newton_step_batch(self, alpha, beta, mu, rho, lambda_min):
        key = (alpha, beta, mu, rho, lambda_min)
        cache = getattr(self, "_step_cache", None)
        if cache is None:
            cache = self._step_cache = {}
        if key in cache:
            return cache[key]
        from ..models.oo_pqc import _nr_core_for

        oo0 = self.oo0
        core = _nr_core_for(self.pqc, oo0.nao, oo0._occ, oo0._act,
                            oo0.params_idx)
        tables = self.pqc._tables()
        gh = core["grad_hess_fused"]
        upd = core["newton_update_fused"]

        def one(theta, oao_mo, int1e, int2e, oao_c, nuc):
            e0, g, h = gh(theta, oao_mo, int1e, int2e, oao_c, nuc,
                          tables)
            return upd(theta, oao_mo, int1e, int2e, oao_c, nuc, tables,
                       e0, g, h, alpha, beta, mu, rho, lambda_min)

        raw = jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0))
        cache[key] = (jax.jit(raw), raw)
        return cache[key]

    def newton_steps(self, thetas, oao_mos, alpha=1e-4, beta=0.5,
                     mu=1e-6, rho=1.1, lambda_min=1e-6):
        """ONE damped Newton step on EVERY geometry concurrently (the
        same grad+Hessian+augmented-solve+Armijo update the sequential
        OO_pqc._nr_iteration_jit runs, vmapped over the dp axis — the
        line-search while_loop batches to lockstep trials).  Returns
        (new_thetas, new_kappas, new_oao_mos, energies, lowest_eigs),
        each with a leading geometry axis.  Under a mesh the stacked
        integral tensors are dp-sharded, so XLA partitions the whole
        batched step across devices."""
        step, _raw = self._newton_step_batch(alpha, beta, mu, rho,
                                             lambda_min)
        return step(jnp.asarray(thetas), jnp.asarray(oao_mos),
                    self.int1e, self.int2e, self.oao_c, self.nuc)

    def optimize(self, theta0, oao_mo0=None, n_steps=10, **nr_kwargs):
        """Run `n_steps` batched Newton steps from a shared or
        per-geometry start; returns the trajectory of batched energies
        plus the final (thetas, oao_mos, lowest_eigs).  This is the PES
        scan / Berry-loop tracking driver: all geometries advance in one
        device program per step."""
        B = len(self.oo_list)
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (B,) + theta0.shape)
        if oao_mo0 is None:
            oao_mo0 = jnp.stack([oo.oao_mo_coeff for oo in self.oo_list])
        else:
            oao_mo0 = jnp.asarray(oao_mo0)
            if oao_mo0.ndim == 2:
                oao_mo0 = jnp.broadcast_to(
                    oao_mo0, (B,) + oao_mo0.shape)
        thetas, oaos = theta0, oao_mo0
        energy_hist = []
        lowest = None
        for _ in range(n_steps):
            thetas, _kappas, oaos, energies, lowest = self.newton_steps(
                thetas, oaos, **nr_kwargs)
            energy_hist.append(energies)
        return energy_hist, thetas, oaos, lowest

    def optimize_device_loop(self, theta0, oao_mo0=None, max_steps=50,
                             conv_tol=1e-10, alpha=1e-4, beta=0.5,
                             mu=1e-6, rho=1.1, lambda_min=1e-6):
        """Batched optimization to CONVERGENCE as ONE device program:
        lax.while_loop over vmapped Newton steps, stopping when every
        geometry's |dE| < conv_tol (or at max_steps).  One dispatch and
        one trajectory fetch for the whole PES scan / Berry loop —
        `optimize` dispatches once per step and has no convergence test.
        Returns (energy_hist [n_done, B], thetas, oao_mos, lowest_eigs)
        with energy_hist truncated to the executed steps."""
        B = len(self.oo_list)
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (B,) + theta0.shape)
        if oao_mo0 is None:
            oao_mo0 = jnp.stack([oo.oao_mo_coeff for oo in self.oo_list])
        else:
            oao_mo0 = jnp.asarray(oao_mo0)
            if oao_mo0.ndim == 2:
                oao_mo0 = jnp.broadcast_to(oao_mo0, (B,) + oao_mo0.shape)
        _step, raw = self._newton_step_batch(alpha, beta, mu, rho,
                                             lambda_min)

        def loop(thetas, oaos, int1e, int2e, oao_c, nuc, tol):
            dt = thetas.dtype
            hist0 = jnp.zeros((max_steps, B), dtype=dt)
            low0 = jnp.zeros((B,), dtype=dt)
            inf = jnp.full((B,), jnp.inf, dtype=dt)

            def cond(c):
                n, _th, _oa, e1, e2, _hist, _low = c
                done = jnp.logical_and(
                    n >= 3, jnp.all(jnp.abs(e1 - e2) < tol))
                return jnp.logical_and(n < max_steps,
                                       jnp.logical_not(done))

            def body(c):
                n, th, oa, e1, _e2, hist, _low = c
                th2, _kap, oa2, e_t, low = raw(th, oa, int1e, int2e,
                                               oao_c, nuc)
                return (n + 1, th2, oa2, e_t, e1,
                        hist.at[n].set(e_t), low)

            return jax.lax.while_loop(
                cond, body,
                (jnp.asarray(0), thetas, oaos, inf, inf, hist0, low0))

        key = ("opt_loop", alpha, beta, mu, rho, lambda_min, max_steps)
        if key not in self._step_cache:
            self._step_cache[key] = jax.jit(loop)
        n, thetas, oaos, _e1, _e2, hist, lowest = jax.device_get(
            self._step_cache[key](theta0, oao_mo0, self.int1e,
                                  self.int2e, self.oao_c, self.nuc,
                                  conv_tol))
        n = int(n)
        return hist[:n], jnp.asarray(thetas), jnp.asarray(oaos), \
            jnp.asarray(lowest)
