"""String-grid gate program: sector circuits as row-block Givens updates.

Every compiled gate (simulator/gates.py) pairs determinants via a FIXED
bit flip: ib = ia ^ mask.  On the (Na, Nb) string grid of a particle
sector (ops/grid.py), the alpha and beta parts of that flip act on the
two grid axes independently, and the Jordan-Wigner sign of each pair
factorizes exactly as sign(i, j) = sA(i) * sB(j) (parities count alpha
and beta occupations independently — same argument as the grid E_pq
maps).  So one gate is a rotation between two SUBGRIDS:

    Psi[A_src x B_src]  <-cos/sin->  Psi[A_dst x B_dst]

applied as row gathers + small column ops + row scatter-adds — replacing
the flat per-determinant pair gathers of program.py, which run at
element-gather speed (~1 GB/s effective on chip) against the row ops'
contiguous-access speed.

``factorize_program`` converts an existing sector GateProgram (built and
golden-calibrated by simulator/ansatze.py) into this form, ASSERTING the
product structure and exact rank-1 sign split of every gate — any gate
violating the factorization (none of the current families do) fails
loudly at construction rather than silently simulating wrong.

Layout contract: statevectors are GRID-ordered flat (Na * Nb,) vectors,
matching ops/grid.py; simulator/circuit.py converts to the canonical
sorted-determinant order only at public API boundaries.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import fermion


class _GridGate:
    __slots__ = ("Ai_src", "Ai_dst", "sA", "Bj_src", "Bj_dst", "sB",
                 "alpha_identity", "beta_identity", "half", "param",
                 "empty")


def _spin_mask(ncas, spin, up_then_down=False):
    nm = 2 * ncas
    m = 0
    for p in range(ncas):
        m |= 1 << (nm - 1 - fermion.mode_of(p, spin, ncas, up_then_down))
    return m


def _factorize_gate(ia_det, ib_det, sign, A, B, amask, bmask):
    """Split one gate's determinant pairs into alpha x beta structure.

    Returns a _GridGate with indices into the A / B string lists, or
    None for an empty gate."""
    g = _GridGate()
    if ia_det.size == 0:
        g.empty = True
        return g
    g.empty = False
    fa = int((ia_det[0] ^ ib_det[0]) & amask)
    fb = int((ia_det[0] ^ ib_det[0]) & bmask)
    assert np.all((ia_det ^ ib_det) == (fa | fb)), \
        "gate flip mask is not constant"
    a_src = ia_det & amask
    b_src = ia_det & bmask
    A_list = np.unique(a_src)
    B_list = np.unique(b_src)
    ka, kb = A_list.size, B_list.size
    assert ia_det.size == ka * kb, "gate pairs are not a product grid"
    i = np.searchsorted(A_list, a_src)
    j = np.searchsorted(B_list, b_src)
    S = np.zeros((ka, kb), dtype=np.int64)
    S[i, j] = np.rint(sign).astype(np.int64)
    assert np.all(S != 0), "product grid has holes"
    # exact rank-1 split of the +-1 sign matrix
    sA = S[:, 0]
    sB = S[0, :] * S[0, 0]      # so that sA[0] * sB[0] = S[0, 0]
    assert np.array_equal(np.outer(sA, sB), S), \
        "gate sign does not factorize alpha x beta"
    g.Ai_src = np.searchsorted(A, A_list).astype(np.int32)
    g.Ai_dst = np.searchsorted(A, A_list ^ fa).astype(np.int32)
    g.Bj_src = np.searchsorted(B, B_list).astype(np.int32)
    g.Bj_dst = np.searchsorted(B, B_list ^ fb).astype(np.int32)
    assert np.array_equal(A[g.Ai_src], A_list) \
        and np.array_equal(A[g.Ai_dst], A_list ^ fa) \
        and np.array_equal(B[g.Bj_src], B_list) \
        and np.array_equal(B[g.Bj_dst], B_list ^ fb), \
        "gate strings left the sector string lists"
    g.sA = sA.astype(np.int8)
    g.sB = sB.astype(np.int8)
    g.alpha_identity = (fa == 0 and ka == A.size)
    g.beta_identity = (fb == 0 and kb == B.size)
    return g


def factorize_program(program, basis_dets, ncas, up_then_down=False):
    """GridGateProgram from a sector GateProgram whose (ia, ib) are ranks
    into ``basis_dets`` (the canonical sorted sector basis)."""
    from ..ops.grid import grid_perms

    basis_dets = np.asarray(basis_dets, dtype=np.int64)
    amask = _spin_mask(ncas, 0, up_then_down)
    bmask = _spin_mask(ncas, 1, up_then_down)
    # infer (na, nb) from any basis determinant
    na = int(fermion.popcount(np.asarray([basis_dets[0] & amask]))[0])
    nb = int(fermion.popcount(np.asarray([basis_dets[0] & bmask]))[0])
    A, B, g2s, s2g = grid_perms(ncas, (na, nb), up_then_down)
    gates = []
    n = program.half.shape[0]
    for gi in range(n):
        k = int(program.n_real_pairs[gi])
        ia = basis_dets[program.ia[gi, :k]]
        ib = basis_dets[program.ib[gi, :k]]
        sg = program.sign[gi, :k]
        g = _factorize_gate(ia, ib, sg, A, B, amask, bmask)
        g.half = float(program.half[gi])
        g.param = int(program.param[gi])
        gates.append(g)
    init_grid = int(s2g[program.init_idx])
    return GridGateProgram(gates, program.n_params, init_grid,
                           A.size, B.size)


class GridGateProgram:
    """Unrolled grid-space circuit application.

    The gate tables are O(Na + Nb) integers per gate (KBs total even at
    (12e,12o), vs ~1 GB of flat pair tables), so the trace is unrolled
    per gate with exact shapes — no padding, no scan carry, and XLA
    schedules the row ops of consecutive gates freely."""

    def __init__(self, gates, n_params, init_idx, Na, Nb):
        self.gates = [g for g in gates if not g.empty]
        self.n_params = int(n_params)
        self.init_idx = int(init_idx)
        self.Na = int(Na)
        self.Nb = int(Nb)
        self.dim = self.Na * self.Nb
        # concatenate every gate's tables into SIX flat host buffers with
        # static per-gate offsets: per-gate device conversion was
        # hundreds of tiny transfers (~0.75 s EACH over the tunneled
        # device link — 300 s of setup at (12e,12o)); six bulk uploads
        # are milliseconds, and static slicing at trace time is free
        self._a_off, self._b_off = [], []
        a_parts, b_parts = [], []
        ao = bo = 0
        for g in self.gates:
            ka, kb = g.Ai_src.size, g.Bj_src.size
            self._a_off.append((ao, ka))
            self._b_off.append((bo, kb))
            a_parts.append(np.stack([g.Ai_src.astype(np.int32),
                                     g.Ai_dst.astype(np.int32),
                                     g.sA.astype(np.int32)]))
            b_parts.append(np.stack([g.Bj_src.astype(np.int32),
                                     g.Bj_dst.astype(np.int32),
                                     g.sB.astype(np.int32)]))
            ao += ka
            bo += kb
        self._a_cat = (np.concatenate(a_parts, axis=1) if a_parts
                       else np.zeros((3, 0), dtype=np.int32))
        self._b_cat = (np.concatenate(b_parts, axis=1) if b_parts
                       else np.zeros((3, 0), dtype=np.int32))
        self._half = np.array([g.half for g in self.gates])
        self._param = np.array([g.param for g in self.gates],
                               dtype=np.int32)
        self._dev = None
        self.device_tables()

    def device_tables(self):
        """(a_cat, b_cat) concatenated device tables, converted eagerly
        (same tracer-safety discipline as GateProgram.device_arrays)."""
        if self._dev is None:
            self._dev = (jnp.asarray(self._a_cat),
                         jnp.asarray(self._b_cat))
        return self._dev

    def _gate_tables(self, tabs, gi):
        a_cat, b_cat = tabs
        ao, ka = self._a_off[gi]
        bo, kb = self._b_off[gi]
        a = a_cat[:, ao:ao + ka]
        b = b_cat[:, bo:bo + kb]
        return a[0], a[1], a[2], b[0], b[1], b[2]

    def initial_state(self, dtype=jnp.float64):
        psi = jnp.zeros(self.dim, dtype=dtype)
        return psi.at[self.init_idx].set(1.0)

    def _trig(self, theta):
        # batched trig outside the gate sequence: single-element f64
        # transcendentals take an f32-accuracy path on this backend
        # (see program.py)
        from ..ops.linalg import trig_f64

        angles = (jnp.asarray(self._half).astype(theta.dtype)
                  * theta[jnp.asarray(self._param)])
        return trig_f64(jnp.cos, angles), trig_f64(jnp.sin, angles)

    def _gate_step(self, Psi, gi, g, c, s, tabs):
        """Apply gate ``gi`` with rotation (c, s) to the (Na, Nb) grid;
        (c, -s) applies the INVERSE (the rotations are orthogonal)."""
        Ai_src, Ai_dst, sA, Bj_src, Bj_dst, sB = \
            self._gate_tables(tabs, gi)
        dt = Psi.dtype
        sgn = sA.astype(dt)[:, None] * sB.astype(dt)[None, :]
        if g.beta_identity:
            # pure row rotation: sB is a full-width column sign
            va = Psi[Ai_src]                       # (ka, Nb)
            vb = Psi[Ai_dst]
            Psi = Psi.at[Ai_src].set(c * va - sgn * s * vb)
            Psi = Psi.at[Ai_dst].set(sgn * s * va + c * vb)
        elif g.alpha_identity:
            # pure column rotation (full rows, disjoint column sets);
            # sA is a full-height row-sign vector here
            va = Psi[:, Bj_src]                    # (Na, kb)
            vb = Psi[:, Bj_dst]
            Psi = Psi.at[:, Bj_src].set(c * va - sgn * s * vb)
            Psi = Psi.at[:, Bj_dst].set(sgn * s * va + c * vb)
        else:
            # subgrid rotation: row gathers, small column ops,
            # row scatter-adds (A_src/A_dst disjoint, or columns
            # disjoint — delta-add is safe in every case)
            ra = Psi[Ai_src]                       # (ka, Nb)
            rb = Psi[Ai_dst]
            va = ra[:, Bj_src]                     # (ka, kb)
            vb = rb[:, Bj_dst]
            da = (c - 1.0) * va - sgn * s * vb
            db = sgn * s * va + (c - 1.0) * vb
            DA = jnp.zeros_like(ra).at[:, Bj_src].set(da)
            DB = jnp.zeros_like(rb).at[:, Bj_dst].set(db)
            Psi = Psi.at[Ai_src].add(DA)
            Psi = Psi.at[Ai_dst].add(DB)
        return Psi

    def _gate_blocks(self, Psi, gi, g, tabs):
        """The (va, vb, sgn) blocks gate ``gi`` acts on — the only
        elements its theta-derivative touches."""
        Ai_src, Ai_dst, sA, Bj_src, Bj_dst, sB = \
            self._gate_tables(tabs, gi)
        dt = Psi.dtype
        sgn = sA.astype(dt)[:, None] * sB.astype(dt)[None, :]
        if g.beta_identity:
            return Psi[Ai_src], Psi[Ai_dst], sgn
        if g.alpha_identity:
            return Psi[:, Bj_src], Psi[:, Bj_dst], sgn
        return (Psi[Ai_src][:, Bj_src], Psi[Ai_dst][:, Bj_dst], sgn)

    def _apply_core(self, theta, psi, tabs):
        cos_t, sin_t = self._trig(theta)
        Psi = psi.reshape(self.Na, self.Nb)
        for gi, g in enumerate(self.gates):
            Psi = self._gate_step(Psi, gi, g, cos_t[gi], sin_t[gi],
                                  tabs)
        return Psi.reshape(-1)

    def _g_add(self, Dst, Src, gi, g, coef, tabs):
        """Dst += coef * G Src on gate ``gi``'s blocks, where G is the
        gate's rotation GENERATOR (per pair: (va, vb) -> (-sgn*vb,
        sgn*va), zero elsewhere; dR/da = G R = R G)."""
        Ai_src, Ai_dst, sA, Bj_src, Bj_dst, sB = \
            self._gate_tables(tabs, gi)
        dt = Src.dtype
        sgn = sA.astype(dt)[:, None] * sB.astype(dt)[None, :]
        if g.beta_identity:
            va = Src[Ai_src]
            vb = Src[Ai_dst]
            Dst = Dst.at[Ai_src].add(-coef * sgn * vb)
            Dst = Dst.at[Ai_dst].add(coef * sgn * va)
        elif g.alpha_identity:
            va = Src[:, Bj_src]
            vb = Src[:, Bj_dst]
            Dst = Dst.at[:, Bj_src].add(-coef * sgn * vb)
            Dst = Dst.at[:, Bj_dst].add(coef * sgn * va)
        else:
            ra = Src[Ai_src]
            rb = Src[Ai_dst]
            va = ra[:, Bj_src]
            vb = rb[:, Bj_dst]
            DA = jnp.zeros_like(ra).at[:, Bj_src].set(-coef * sgn * vb)
            DB = jnp.zeros_like(rb).at[:, Bj_dst].set(coef * sgn * va)
            Dst = Dst.at[Ai_src].add(DA)
            Dst = Dst.at[Ai_dst].add(DB)
        return Dst

    def _g_dot(self, Ct, Y, gi, g, tabs):
        """<Ct, G Y> restricted to gate ``gi``'s blocks (the only
        nonzeros of G Y)."""
        cta, ctb, _ = self._gate_blocks(Ct, gi, g, tabs)
        ya, yb, sgn = self._gate_blocks(Y, gi, g, tabs)
        return (jnp.sum(cta * (-sgn * yb)) + jnp.sum(ctb * (sgn * ya)))

    def _pair_core(self, theta, v, psi, tabs):
        """(|psi(theta)>, J(theta) v): state and one Jacobian column,
        propagated together.  Per gate (angle a = half * theta_p,
        da = half * v_p): Psi' = R Psi, Delta' = R Delta + da * G R Psi
        — exactly jax.jvp of _apply_core, written out so the adjoint
        custom_vjp below can reverse it without residuals.

        An optimization_barrier pins the per-gate order: left free, the
        XLA scheduler overlaps gates and keeps several row-block temps
        live at once (3.5 GB at (16e,16o), where the hosted gram route
        builds nt columns next to a ~10 GB working set)."""
        cos_t, sin_t = self._trig(theta)
        half_dev = jnp.asarray(self._half).astype(theta.dtype)
        da = half_dev * v[jnp.asarray(self._param)]
        Psi = psi.reshape(self.Na, self.Nb)
        Delta = jnp.zeros_like(Psi)
        for gi, g in enumerate(self.gates):
            c, s = cos_t[gi], sin_t[gi]
            Delta = self._g_add(Delta, Psi, gi, g, da[gi], tabs)
            Delta = self._gate_step(Delta, gi, g, c, s, tabs)
            Psi = self._gate_step(Psi, gi, g, c, s, tabs)
            Psi, Delta = jax.lax.optimization_barrier((Psi, Delta))
        return Psi.reshape(-1), Delta.reshape(-1)

    def apply_pair(self, theta, v, psi=None, tables=None):
        """(|psi(theta)>, J(theta) @ v) over the GRID-ordered sector
        basis — one forward sweep carrying the state and one tangent
        column together (equals jax.jvp of ``apply``)."""
        if psi is None:
            psi = self.initial_state(
                theta.dtype if jnp.issubdtype(theta.dtype, jnp.floating)
                else jnp.float64)
        if not self.gates:
            return psi, jnp.zeros_like(psi)
        tabs = tables if tables is not None else self.device_tables()
        return self._pair_core(theta, v, psi, tabs)

    def apply_pair_adjoint(self, theta, v, psi=None, tables=None):
        """``apply_pair`` with ADJOINT (reversible) reverse-mode.

        Under jax.grad/vjp of either output, the backward pass
        reconstructs each intermediate (Psi, Delta) pair by applying the
        INVERSE rotations in reverse order instead of storing them —
        residual memory O(D) instead of O(n_gates * D).  This is what
        makes a quadratic-form Hessian ROW computable at (16e,16o)
        (D = 165.6M, where even the f32 residuals of plain AD over the
        tangent pair would be ~60 GB): one row of
        2 Re<J_j|H J_i> + 2 Re<d2psi/dth_i dth_j|H psi> is the gradient
        of Re<psi(th)|2 H J_i> + Re<(J(th) e_i)|2 H psi>, a single
        reverse pass over this function with both cotangent seeds.
        Reference capability this serves at scale: the AD circuit
        Hessian of /root/reference/src/auto_oo/oo_pqc.py:103-125.

        Reverse-mode only (like apply_adjoint); forward-over-it is not
        defined.  Real-dtype statevectors only."""
        if psi is None:
            psi = self.initial_state(
                theta.dtype if jnp.issubdtype(theta.dtype, jnp.floating)
                else jnp.float64)
        if not self.gates:
            return psi, jnp.zeros_like(psi)
        tabs = tables if tables is not None else self.device_tables()
        return self._pair_adjoint_fn()(theta, v, psi, tabs[0], tabs[1])

    def _pair_adjoint_fn(self):
        if getattr(self, "_pair_adjoint", None) is not None:
            return self._pair_adjoint
        import jax
        from jax import dtypes as _dtypes

        param_static = [int(p) for p in self._param]

        @jax.custom_vjp
        def fn(theta, v, psi, a_cat, b_cat):
            return self._pair_core(theta, v, psi, (a_cat, b_cat))

        def fwd(theta, v, psi, a_cat, b_cat):
            out = self._pair_core(theta, v, psi, (a_cat, b_cat))
            return out, (theta, v, out[0], out[1], a_cat, b_cat)

        def bwd(res, cts):
            theta, v, psi_out, delta_out, a_cat, b_cat = res
            ct_psi, ct_delta = cts
            tabs = (a_cat, b_cat)
            cos_t, sin_t = self._trig(theta)
            half_dev = jnp.asarray(self._half).astype(theta.dtype)
            da = half_dev * v[jnp.asarray(self._param)]
            Psi = psi_out.reshape(self.Na, self.Nb)
            Delta = delta_out.reshape(self.Na, self.Nb)
            CtP = ct_psi.reshape(self.Na, self.Nb)
            CtD = ct_delta.reshape(self.Na, self.Nb)
            dth = jnp.zeros(theta.shape, theta.dtype)
            dv = jnp.zeros(v.shape, v.dtype)
            for gi in reversed(range(len(self.gates))):
                g = self.gates[gi]
                c, s = cos_t[gi], sin_t[gi]
                # d/d theta_p at POST-gate states: both outputs respond
                # with their own G-image (dPsi'/da = G Psi',
                # dDelta'/da = G Delta' — G commutes with R)
                d = half_dev[gi] * (self._g_dot(CtP, Psi, gi, g, tabs)
                                    + self._g_dot(CtD, Delta, gi, g,
                                                  tabs))
                dth = dth.at[param_static[gi]].add(d)
                # d/d v_p: dDelta'/d(da) = G R Psi_pre = G Psi_post
                dv = dv.at[param_static[gi]].add(
                    half_dev[gi] * self._g_dot(CtD, Psi, gi, g, tabs))
                # reconstruct the pre-gate pair (reversibility)
                Psi = self._gate_step(Psi, gi, g, c, -s, tabs)
                Delta = self._gate_step(Delta, gi, g, c, -s, tabs)
                Delta = self._g_add(Delta, Psi, gi, g, -da[gi], tabs)
                # transport the cotangents: J^T = [[R^T, -da G R^T],
                # [0, R^T]] on (CtP, CtD)
                CtP = self._gate_step(CtP, gi, g, c, -s, tabs)
                CtD = self._gate_step(CtD, gi, g, c, -s, tabs)
                CtP = self._g_add(CtP, CtD, gi, g, -da[gi], tabs)
            # the transported CtP is the psi0 cotangent (it accumulated
            # the -da G CtD couplings of every gate on the way down);
            # the Delta0 slot is internal zeros, so CtD is discarded
            f0 = lambda x: np.zeros(x.shape, dtype=_dtypes.float0)
            return dth, dv, CtP.reshape(-1), f0(a_cat), f0(b_cat)

        fn.defvjp(fwd, bwd)
        self._pair_adjoint = fn
        return fn

    def apply(self, theta, psi=None, tables=None):
        """|psi(theta)> over the GRID-ordered sector basis."""
        if psi is None:
            psi = self.initial_state(
                theta.dtype if jnp.issubdtype(theta.dtype, jnp.floating)
                else jnp.float64)
        if not self.gates:
            return psi
        tabs = tables if tables is not None else self.device_tables()
        return self._apply_core(theta, psi, tabs)

    def apply_adjoint(self, theta, psi=None, tables=None):
        """``apply`` with ADJOINT (reversible) reverse-mode derivatives.

        Same forward values; under jax.grad/vjp the backward pass
        reconstructs each intermediate state by applying the INVERSE
        rotations in reverse order instead of storing them — the gates
        are orthogonal, so residual memory drops from O(n_gates * D)
        (plain AD through apply) to O(D): at (14e,14o), ~94 MB per
        intermediate times hundreds of gates vs three live grid buffers.
        This is the statevector-simulator adjoint-differentiation method
        expressed as a jax.custom_vjp; backward reconstruction roundoff
        is O(sqrt(n_gates))*eps — negligible in f64.

        Reverse-mode only (the gradient pipelines): jacfwd paths (the
        quadratic-form Hessian) must keep plain ``apply``.  Real-dtype
        statevectors only (the built-in ansatze — complex custom states
        never run through grid programs)."""
        if psi is None:
            psi = self.initial_state(
                theta.dtype if jnp.issubdtype(theta.dtype, jnp.floating)
                else jnp.float64)
        if not self.gates:
            return psi
        tabs = tables if tables is not None else self.device_tables()
        return self._adjoint_fn()(theta, psi, tabs[0], tabs[1])

    def _adjoint_fn(self):
        if getattr(self, "_adjoint", None) is not None:
            return self._adjoint
        import jax
        from jax import dtypes as _dtypes

        param_static = [int(p) for p in self._param]

        @jax.custom_vjp
        def fn(theta, psi, a_cat, b_cat):
            return self._apply_core(theta, psi, (a_cat, b_cat))

        def fwd(theta, psi, a_cat, b_cat):
            out = self._apply_core(theta, psi, (a_cat, b_cat))
            return out, (theta, out, a_cat, b_cat)

        def bwd(res, ct):
            theta, out, a_cat, b_cat = res
            tabs = (a_cat, b_cat)
            cos_t, sin_t = self._trig(theta)
            half_dev = jnp.asarray(self._half).astype(theta.dtype)
            Psi = out.reshape(self.Na, self.Nb)
            Ct = ct.reshape(self.Na, self.Nb)
            dth = jnp.zeros(theta.shape, theta.dtype)
            for gi in reversed(range(len(self.gates))):
                g = self.gates[gi]
                c, s = cos_t[gi], sin_t[gi]
                # pre-gate state by inverse rotation (reversibility)
                Psi = self._gate_step(Psi, gi, g, c, -s, tabs)
                va, vb, sgn = self._gate_blocks(Psi, gi, g, tabs)
                cta, ctb, _ = self._gate_blocks(Ct, gi, g, tabs)
                # d(out)/d(theta_p) dotted with the cotangent: only the
                # gate's own blocks contribute (angle = half * theta_p)
                d = half_dev[gi] * (
                    jnp.sum(cta * (-s * va - sgn * c * vb))
                    + jnp.sum(ctb * (sgn * c * va - s * vb)))
                dth = dth.at[param_static[gi]].add(d)
                # transport the cotangent: R^T = R(-theta)
                Ct = self._gate_step(Ct, gi, g, c, -s, tabs)
            f0 = lambda x: np.zeros(x.shape, dtype=_dtypes.float0)
            return dth, Ct.reshape(-1), f0(a_cat), f0(b_cat)

        fn.defvjp(fwd, bwd)
        self._adjoint = fn
        return fn
