"""Parameterized_circuit: the user-facing circuit/RDM interface.

API mirror of reference pqc.py:86-235 on top of the in-house compiled-gate
simulator: produces the ansatz statevector and spin-summed RDMs.  The
reference's PennyLane device argument is accepted and ignored (we own the
simulator); `interface`/`diff_method` likewise (there is only JAX, and
gradients flow through the simulator natively).

The statevector is REAL float64 for the built-in ansatze: every supported
ansatz (UCC(S)D, GateFabric, k-UpCCD) is an orthogonal circuit acting on
a real initial state — this halves memory/compute vs the reference's
complex128 states.  Custom callable ansatze (any theta -> statevector
function, the reference's "any QNode" capability, pqc.py:163) may return
COMPLEX states: the RDM kernels and the OO_pqc Newton core conjugate the
bra side natively, so complex custom circuits optimize end-to-end.
`state_complex` is provided for workflows that need a complex dtype.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import rdms as _rdms
from . import ansatze as A
from .program import GateProgram


class Parameterized_circuit:
    """Active-space PQC: state(theta) and RDMs, differentiable end-to-end.

    Args mirror the reference (pqc.py:91-109); `ansatz` may be 'ucc',
    'np_fabric', 'kupccd', or a prebuilt GateProgram / callable
    theta -> statevector."""

    def __init__(self, ncas, nelecas, dev=None, ansatz="ucc", n_layers=3,
                 add_singles=False, interface=None, diff_method=None,
                 k=None, up_then_down=False, sector=False,
                 theta_shape=None):
        self.ncas = ncas
        self.nelecas = nelecas
        self.n_qubits = 2 * ncas
        self.dev = dev
        self.add_singles = add_singles
        self.interface = "jax"
        if up_then_down and ansatz in ("ucc", "np_fabric", "kupccd"):
            # the built-in ansatz programs lay out qubits interleaved
            # (like the reference, pqc.py:121,137 hard-code
            # up_then_down=False); the ordering toggle applies to RDM
            # extraction for custom states
            raise ValueError(
                "built-in ansatze use interleaved ordering; up_then_down "
                "RDMs are supported for custom states / GatePrograms")
        if up_then_down and sector:
            # The sector machinery (fermion.sector_basis enumeration,
            # string-grid factorization, S^- maps, the pair-annihilation
            # maps) is built on the interleaved convention, and the two
            # conventions select DIFFERENT determinant sets for the same
            # (n_a, n_b) sector — mixing them would be silently wrong,
            # not merely reordered.  Sector mode therefore fixes the
            # interleaved convention at the API level; utd-ordered
            # unrestricted RDMs of a sector state are an exact mode
            # permutation away (ops/fermion.reorder_unrestricted_rdms).
            # The reference supports both orderings only through its
            # dense-4^ncas operators (utils/active_space.py:29-57) and
            # has no sector mode at all.
            raise ValueError(
                "sector=True fixes the interleaved JW ordering (the "
                "sector basis convention); extract RDMs interleaved and "
                "permute with ops.fermion.reorder_unrestricted_rdms for "
                "up_then_down ordering")
        self.up_then_down = bool(up_then_down)
        self.ansatz = ansatz
        self._custom_state_fn = None
        self._program = None
        self._program_builder = None

        # sector mode: built-in ansatz programs are constructed DIRECTLY
        # on the (n_alpha, n_beta) determinant basis — O(D_sector) host
        # work, no 4^ncas table ever materialized (the projection route
        # stays for prebuilt full-space GatePrograms)
        self.sector = bool(sector)
        sector_dets = None
        builtin = ansatz in ("ucc", "np_fabric", "kupccd")
        # direct grid mode: the circuit is constructed straight on the
        # alpha/beta string lists (simulator/grid_gates.py,
        # O(n_gates * (Na + Nb)) host work); the flat per-determinant
        # pair program — O(n_gates * D) to build and GBs at (14e,14o) —
        # becomes LAZY, built only if a consumer explicitly needs it
        # (sharded paths, draw_circuit, _flat_maps)
        direct_grid = self.sector and not up_then_down and builtin
        if self.sector:
            from ..ops import fermion as _fermion
            sector_dets = _fermion.sector_basis(ncas, nelecas)

        self._build_ansatz_program(ansatz, ncas, nelecas, n_layers,
                                   add_singles, k, theta_shape,
                                   sector_dets, defer=direct_grid)

        self.sector_maps = None
        self.grid_program = None
        if self.sector:
            # run in the conserved (n_alpha, n_beta) determinant basis:
            # C(n,na)*C(n,nb) amplitudes instead of 4^ncas (16x at
            # (10e,10o), 20x at (12e,12o); see simulator/sector.py)
            if self._program is None and self._program_builder is None:
                raise ValueError("sector=True needs a compiled GateProgram")
            from . import sector as _sector
            from ..ops import grid as _grid
            if direct_grid:
                self.sector_basis = sector_dets
                self.sector_maps = _grid.build_grid_maps(
                    ncas, nelecas, self.up_then_down)
                from . import grid_gates as _gg
                self.grid_program = _gg.build_direct(
                    ncas, nelecas, ansatz, n_layers=n_layers,
                    add_singles=add_singles,
                    k=(k if k is not None else n_layers),
                    up_then_down=self.up_then_down)
            else:
                if self.program.dim == (1 << self.n_qubits):
                    # prebuilt full-space GateProgram: project it
                    self.program, self.sector_basis = \
                        _sector.project_program(self.program, ncas,
                                                nelecas)
                else:
                    self.sector_basis = sector_dets
                if self.up_then_down:
                    # the sector basis convention is interleaved; keep
                    # the historical flat-map behavior (which rejects
                    # utd) rather than silently mixing conventions
                    self.sector_maps = _sector.sector_epq_maps(
                        ncas, nelecas, self.up_then_down)
                else:
                    # string-factorized grid maps + a grid program
                    # FACTORIZED from the prebuilt flat program (its
                    # golden-calibrated tables are the input here)
                    self.sector_maps = _grid.build_grid_maps(
                        ncas, nelecas, self.up_then_down)
                    from . import grid_program as _gp
                    self.grid_program = _gp.factorize_program(
                        self.program, self.sector_basis, ncas,
                        self.up_then_down)

        _rdms.warm_tables(ncas, self.up_then_down)  # eager (see ops/rdms.py)
        self._state_jit = jax.jit(self._state_impl)
        self._state_grid_jit = jax.jit(self._state_impl_grid)
        self._rdms_jit = jax.jit(self._rdms_impl)
        self._rdms_u_jit = jax.jit(self._rdms_unrestricted_impl)

    @property
    def program(self):
        """The flat pair-table GateProgram — LAZY in direct grid mode
        (sector + built-in ansatz), where the string-grid program serves
        every hot path and this one costs O(n_gates * D) to build."""
        if self._program is None and self._program_builder is not None:
            self._program = self._program_builder()
            self._program_builder = None
        return self._program

    @program.setter
    def program(self, value):
        self._program = value
        self._program_builder = None

    @property
    def state_dim(self):
        """Statevector dimension WITHOUT touching the lazy flat program:
        C(n,na)*C(n,nb) in sector mode, else 4^ncas."""
        if self.grid_program is not None:
            return self.grid_program.dim
        if self.sector:
            return len(self.sector_basis)
        if self._program is not None:
            return self._program.dim
        return 1 << self.n_qubits

    def _build_ansatz_program(self, ansatz, ncas, nelecas, n_layers,
                              add_singles, k, theta_shape, sector_dets,
                              defer=False):
        def emit(builder):
            if defer:
                self._program_builder = builder
            else:
                self.program = builder()

        if ansatz == "ucc":
            self.singles, self.doubles = A.excitations(nelecas,
                                                       self.n_qubits)
            self.theta_shape = (len(self.doubles)
                                + (len(self.singles) if add_singles else 0))
            self.hfstate = A.hf_state(nelecas, self.n_qubits)
            emit(lambda: A.uccd_program(ncas, nelecas,
                                        add_singles=add_singles,
                                        dets=sector_dets))
        elif ansatz == "np_fabric":
            self.n_layers = n_layers
            self.hfstate = A.hf_state(nelecas, self.n_qubits)
            self.full_theta_shape = A.gatefabric_full_shape(
                n_layers, self.n_qubits)
            self.redundant_idx = A.gatefabric_redundant_idx(ncas, nelecas)
            nfull = int(np.prod(self.full_theta_shape))
            self.params_idx = np.array(
                [x for x in range(nfull) if x not in self.redundant_idx])
            self.theta_shape = len(self.params_idx)
            emit(lambda: A.gatefabric_program(ncas, nelecas, n_layers,
                                              dets=sector_dets))
        elif ansatz == "kupccd":
            self.k = k if k is not None else n_layers
            self.hfstate = A.hf_state(nelecas, self.n_qubits)
            self.d_wires = A.generalized_pair_doubles(
                list(range(self.n_qubits)))
            self.theta_shape = self.k * len(self.d_wires)
            emit(lambda: A.kupccd_program(ncas, nelecas, k=self.k,
                                          dets=sector_dets))
        elif isinstance(ansatz, GateProgram):
            self.program = ansatz
            self.theta_shape = ansatz.n_params
            self.hfstate = None
        elif callable(ansatz):
            # any theta -> statevector callable (real OR complex), the
            # reference's arbitrary-QNode capability (pqc.py:163).  The
            # parameter count cannot be introspected from a black box, so
            # it is passed explicitly (or probed from a `theta_shape`
            # attribute on the callable); init_zeros and the OO_pqc
            # Newton core need it.
            self._custom_state_fn = ansatz
            if theta_shape is None:
                theta_shape = getattr(ansatz, "theta_shape", None)
            if theta_shape is None:
                raise ValueError(
                    "a callable ansatz needs theta_shape=<n_params> "
                    "(or a .theta_shape attribute on the callable)")
            self.theta_shape = int(np.prod(theta_shape))
            self.hfstate = None
        else:
            raise ValueError(f"unknown ansatz {ansatz!r}")

    # -- state ------------------------------------------------------------

    def _expand_theta(self, theta):
        if self.ansatz == "np_fabric":
            nfull = int(np.prod(self.full_theta_shape))
            full = jnp.zeros(nfull, dtype=theta.dtype)
            return full.at[jnp.asarray(self.params_idx)].set(theta)
        return theta

    def _state_impl(self, theta, tables=None):
        if self._custom_state_fn is not None:
            return self._custom_state_fn(theta)
        from ..ops.grid import GridMaps, from_grid
        maps = self._maps_from(tables)
        if (getattr(self, "grid_program", None) is not None
                and isinstance(maps, GridMaps)):
            # grid-space circuit + one permutation back to the canonical
            # sorted-determinant order (the public contract); hot paths
            # that can consume grid order directly use _state_impl_grid.
            # The maps MUST come from the tables argument, not
            # self.sector_maps: a closure-captured s2g permutation is a
            # jit constant — 662 MB of HLO literal at (16e,16o), which
            # stalls the remote compile service for tens of minutes.
            return from_grid(self._state_impl_grid(theta, tables), maps)
        gates = tables["gates"] if isinstance(tables, dict) else tables
        return self.program.apply(self._expand_theta(jnp.ravel(theta)),
                                  tables=gates)

    def _state_impl_grid(self, theta, tables=None, adjoint=False):
        """|psi(theta)> in GRID order (ops/grid.py layout contract).

        ``adjoint=True`` routes through the reversible-backward program
        (O(D) VJP residuals, grid_program.apply_adjoint) — for
        reverse-mode gradient pipelines only; jacfwd paths must keep the
        plain apply."""
        gates = (tables.get("gates_grid")
                 if isinstance(tables, dict) else None)
        f = (self.grid_program.apply_adjoint if adjoint
             else self.grid_program.apply)
        return f(self._expand_theta(jnp.ravel(theta)), tables=gates)

    def _pair_state_impl_grid(self, theta, v, tables=None):
        """(|psi(theta)>, J(theta) @ v) in GRID order through the
        tangent-pair ADJOINT program (grid_program.apply_pair_adjoint):
        reverse-mode over either output reconstructs intermediates by
        inverse rotation — O(D) residuals, the (16e,16o)-scale Hessian
        row path.  ``_expand_theta`` is linear, so the tangent expands
        through it identically."""
        gates = (tables.get("gates_grid")
                 if isinstance(tables, dict) else None)
        return self.grid_program.apply_pair_adjoint(
            self._expand_theta(jnp.ravel(theta)),
            self._expand_theta(jnp.ravel(v)), tables=gates)

    def _flat_maps(self):
        """Flat (2, n2, D) sector E_pq gather maps, built lazily: the
        GSPMD-sharded paths shard the flat determinant axis and cannot
        (yet) use the string-grid kernels, so they request these
        explicitly via _tables(flat_sector_maps=True)."""
        if not self.sector:
            return None
        from ..ops.grid import GridMaps

        if not isinstance(self.sector_maps, GridMaps):
            return self.sector_maps
        if getattr(self, "_sector_flat_maps", None) is None:
            from . import sector as _sector
            self._sector_flat_maps = _sector.sector_epq_maps(
                self.ncas, self.nelecas, self.up_then_down)
        return self._sector_flat_maps

    def _tables(self, flat_sector_maps=False):
        """Runtime-argument bundle: gate tables + (sector) E_pq maps —
        passed through jit boundaries instead of closure-captured (large
        arrays embedded as constants overflow the compile service).

        ``flat_sector_maps`` substitutes the flat gather tables for the
        string-grid maps (sharded-path consumers)."""
        has_grid = getattr(self, "grid_program", None) is not None
        # grid mode skips the flat pair tables entirely (the grid
        # program covers every state build); only the sharded consumers
        # that explicitly ask for flat maps trigger the LAZY build +
        # upload (order matters: touching self.program builds it)
        want_flat_gates = ((not has_grid or flat_sector_maps)
                           and (self._program is not None
                                or self._program_builder is not None))
        return {
            "gates": (self.program.device_arrays()
                      if want_flat_gates else None),
            "maps": (self._flat_maps() if flat_sector_maps
                     else self.sector_maps),
            "gates_grid": (self.grid_program.device_tables()
                           if has_grid else None),
        }

    def state(self, theta):
        """|psi(theta)> as a real float64 vector — dim 4^ncas in the full
        space, or C(ncas,na)*C(ncas,nb) over ``self.sector_basis`` when
        sector=True."""
        return self._state_jit(jnp.asarray(theta), self._tables())

    def state_complex(self, theta):
        return self.state(theta).astype(jnp.complex128)

    def qnode(self, theta):
        """Reference-compatible alias (pqc.py:133)."""
        return self.state(theta)

    def init_zeros(self):
        """All-zero parameter init (reference pqc.py:188)."""
        return jnp.zeros(self.theta_shape, dtype=jnp.float64)

    # -- RDMs -------------------------------------------------------------

    def _maps_from(self, tables):
        if isinstance(tables, dict) and tables.get("maps") is not None:
            return tables["maps"]
        return self.sector_maps

    def _rdms_impl(self, theta, tables=None):
        maps = self._maps_from(tables)
        from ..ops.grid import GridMaps
        if (getattr(self, "grid_program", None) is not None
                and isinstance(maps, GridMaps)):
            # stay in grid order end to end (no boundary permutations)
            psi = self._state_impl_grid(theta, tables)
            return _rdms.rdms_from_state(psi, self.ncas,
                                         self.up_then_down, maps=maps,
                                         grid_order=True)
        psi = self._state_impl(theta, tables)
        return _rdms.rdms_from_state(psi, self.ncas, self.up_then_down,
                                     maps=maps)

    def _umaps(self):
        """Cross-sector pair-annihilation maps for unrestricted RDMs,
        built lazily (they cost as much as the E_pq maps and most sector
        workflows never need them)."""
        if not self.sector:
            return None
        if getattr(self, "_sector_umaps", None) is None:
            from . import sector as _sector
            if self.up_then_down:
                raise NotImplementedError(
                    "sector unrestricted RDMs assume interleaved mode "
                    "ordering (the sector basis convention)")
            self._sector_umaps = _sector.sector_pair_annihilation_maps(
                self.ncas, self.nelecas)
        return self._sector_umaps

    def _rdms_unrestricted_impl(self, theta, tables=None, umaps=None):
        psi = self._state_impl(theta, tables)
        if self.sector:
            from . import sector as _sector
            maps = self._maps_from(tables)
            return _sector.rdms_from_sector_state_unrestricted(
                psi, maps, umaps if umaps is not None else self._umaps(),
                self.ncas)
        return _rdms.rdms_from_state_unrestricted(psi, self.ncas)

    def get_rdms_from_state(self, state, restricted=True):
        """gamma_pq = <E_pq>, Gamma_pqrs = <e_pqrs> (reference
        pqc.py:192-218) — computed as one gather + one MXU matmul.

        restricted=False returns spin-resolved RDMs over 2*ncas
        spin-orbitals: gamma_pq = <a^dag_p a_q>, Gamma_pqrs =
        <a^dag_p a^dag_q a_r a_s> (reference pqc.py:192-218 with
        restricted=False)."""
        state = jnp.asarray(state)
        expected = (len(self.sector_basis) if self.sector
                    else 1 << self.n_qubits)
        if state.shape[-1] != expected:
            where = ("the (n_alpha, n_beta) sector basis" if self.sector
                     else f"the full 4^{self.ncas} space")
            hint = (" — project a full-space vector with "
                    "state[self.sector_basis]" if self.sector else "")
            raise ValueError(
                f"state has dim {state.shape[-1]}, but this circuit works "
                f"over {where} (dim {expected}){hint}")
        # complex states are handled natively inside the kernels (the bra
        # side is conjugated, real part taken — reference pqc.py:214-216)
        if restricted:
            if self._rdms_hosted_needed(jnp.dtype(state.dtype).itemsize):
                from ..ops import grid_hosted as _gh
                return _gh.rdms_hosted(state, self.sector_maps, self.ncas,
                                       grid_order=False)
            return _rdms.rdms_from_state(state, self.ncas,
                                         self.up_then_down,
                                         maps=self.sector_maps)
        if self.sector:
            from . import sector as _sector
            return _sector.rdms_from_sector_state_unrestricted(
                state, self.sector_maps, self._umaps(), self.ncas)
        return _rdms.rdms_from_state_unrestricted(state, self.ncas)

    def _rdms_hosted_needed(self, itemsize=8):
        """(16e,16o)-scale routing: True when one full-Phi pass over the
        grid maps exceeds the single-program budget, so restricted RDMs
        must run through the host-segmented driver (ops/grid_hosted) —
        a single fused state+RDM program at that scale exceeds the
        device worker's execution window (BASELINE.md ninth phase)."""
        from ..ops.grid import GridMaps
        if not isinstance(getattr(self, "sector_maps", None), GridMaps):
            return False
        from ..ops import grid_hosted as _gh
        return _gh.needs_hosting(self.sector_maps, itemsize)

    def get_rdms(self, theta, restricted=True):
        if not restricted:
            return self._rdms_u_jit(jnp.asarray(theta), self._tables(),
                                    self._umaps())
        if (self._rdms_hosted_needed()
                and getattr(self, "grid_program", None) is not None):
            from ..ops import grid_hosted as _gh
            psi_g = self._state_grid_jit(jnp.asarray(theta),
                                         self._tables())
            return _gh.rdms_hosted(psi_g, self.sector_maps, self.ncas)
        return self._rdms_jit(jnp.asarray(theta), self._tables())

    # -- spin diagnostics -------------------------------------------------

    def _s2maps(self):
        """Lazy S^- maps (sector mode only).  Grid-mode circuits get the
        string-factorized maps (ops/grid.sminus_grid_maps, O(Na'+Nb')
        host / ncas grid gathers device); flat sector circuits keep the
        cross-sector element tables — those are O(D_target) and stop
        fitting around (16e,16o) (~10 GB host)."""
        if getattr(self, "_sector_s2maps", ()) == ():
            from ..ops import grid as _grid
            if isinstance(self.sector_maps, _grid.GridMaps):
                self._sector_s2maps = _grid.sminus_grid_maps(
                    self.ncas, self.nelecas, self.up_then_down)
            else:
                from . import sector as _sector
                self._sector_s2maps = _sector.sector_sminus_maps(
                    self.ncas, self.nelecas)
        return self._sector_s2maps

    def s2_expectation(self, theta):
        """<psi(theta)|S^2|psi(theta)> — the spin-purity diagnostic
        (reference utils/active_space.py:243-253 via a dense matrix).

        Works at SECTOR scale: in sector mode the expectation is computed
        from the O(ncas * D_sector) S^- gather maps (||S^- psi||^2 +
        Sz^2 - Sz), never materializing a 4^ncas operator; dense mode
        uses the s2_matrix quadratic form."""
        theta = jnp.asarray(theta)
        from ..ops import grid as _grid
        if (self.sector and getattr(self, "grid_program", None) is not None
                and isinstance(self.sector_maps, _grid.GridMaps)):
            # one jitted program, grid order end to end — skips the two
            # D-sized boundary permutations of state() + to_grid()
            if getattr(self, "_s2_grid_jit", None) is None:
                self._s2_grid_jit = jax.jit(self._s2_grid_impl)
            return self._s2_grid_jit(theta, self._tables(),
                                     self._s2maps())
        psi = self.state(theta)
        return self.s2_expectation_of_state(psi)

    def _s2_grid_impl(self, theta, tables, sm):
        from ..ops import grid as _grid
        maps = self._maps_from(tables)
        psi_g = self._state_impl_grid(theta, tables)
        return _grid.s2_expectation_grid(
            psi_g.reshape(maps.Na, maps.Nb), maps, sm, self.nelecas)

    def s2_expectation_of_state(self, state):
        """<S^2> of an explicit (full-space or sector) statevector."""
        from . import sector as _sector
        state = jnp.asarray(state)
        if self.sector:
            from ..ops import grid as _grid
            if isinstance(self.sector_maps, _grid.GridMaps):
                return _grid.s2_expectation_grid(
                    state, self.sector_maps, self._s2maps(),
                    self.nelecas)
            return _sector.s2_expectation_sector(
                state, self._s2maps(), self.nelecas)
        s2 = _rdms.s2_matrix(self.ncas).astype(
            jnp.float64 if not jnp.iscomplexobj(state) else state.dtype)
        return jnp.real(jnp.conj(state) @ (s2 @ state))

    def sz_value(self):
        """Exact S_z of the simulated sector, (n_a - n_b)/2."""
        from .sector import _nelec_split
        na, nb = _nelec_split(self.nelecas)
        return 0.5 * (na - nb)

    # -- misc -------------------------------------------------------------

    def draw_circuit(self, theta):
        """Wire-diagram rendering of the compiled program, in the style of
        qml.draw (reference pqc.py:223): one row per qubit, one column per
        gate, multi-wire gates joined by box connectors.  Falls back to a
        flat gate table when the program carries no display metadata."""
        if self.program is None:
            return "<custom state function>"
        theta = np.ravel(np.asarray(theta))
        full = np.asarray(self._expand_theta(jnp.asarray(theta)))
        meta = getattr(self.program, "gate_meta", None)
        header = (f"GateProgram: {self.program.half.shape[0]} "
                  f"pair-rotation gates, {self.program.n_params} "
                  f"parameters, dim {self.program.dim}")
        if not meta or any(m[0] is None for m in meta):
            lines = [header]
            for i in range(self.program.half.shape[0]):
                ang = self.program.half[i] * full[self.program.param[i]]
                npairs = int(getattr(self.program, "n_real_pairs",
                                     self.program.mask.sum(axis=1))[i])
                lines.append(
                    f"  gate {i:3d}: param {self.program.param[i]:3d} "
                    f"angle {ang:+.4f} pairs {npairs}")
            return "\n".join(lines)

        abbrev = {"FermionicDouble": "G2", "FermionicSingle": "G1",
                  "DoubleExcitation": "G2", "SingleExcitation": "G",
                  "OrbitalRotation": "OR"}
        # merge consecutive PairGates sharing (name, wires, param) — e.g.
        # OrbitalRotation compiles to two pair gates with one parameter
        merged = []
        for name, wires, param in meta:
            if merged and merged[-1] == (name, wires, param):
                continue
            merged.append((name, wires, param))
        nq = self.n_qubits
        rows = [[] for _ in range(nq)]
        for name, wires, param in merged:
            label = f"{abbrev.get(name, name)}({full[param]:+.2f})"
            lo, hi = min(wires), max(wires)
            width = len(label) + 1
            for q in range(nq):
                if q in wires:
                    conn = ("╭" if q == lo else
                            "╰" if q == hi else "├")
                    cell = conn + label
                elif lo < q < hi:
                    cell = "│"
                else:
                    cell = ""
                rows[q].append(cell.ljust(width, "─"))
        out = [header]
        for q in range(nq):
            out.append(f"q{q:02d}: ─" + "─".join(rows[q])
                       + "─")
        return "\n".join(out)


def dirac_notation(state, decimals=2, atol=1e-8):
    """Pretty-print a statevector as a Dirac-notation sum — the
    cirq.dirac_notation capability the reference tutorials use to display
    PQC states (reference examples/Tutorial_auto_oo.ipynb, cells printing
    `cirq.dirac_notation(state)`).  Qubit 0 is the leftmost bit label,
    matching the simulator's statevector layout."""
    state = np.asarray(state).ravel()
    nq = int(round(np.log2(state.size)))
    if 1 << nq != state.size:
        raise ValueError(f"statevector length {state.size} is not 2^n")
    terms = []
    for idx in np.flatnonzero(np.abs(state) > atol):
        amp = state[idx]
        label = format(idx, f"0{nq}b")
        if abs(np.imag(amp)) < atol:
            a = float(np.real(amp))
            mag = f"{abs(a):.{decimals}f}"
            sign = "-" if a < 0 else "+"
        else:
            mag = (f"({np.real(amp):.{decimals}f}"
                   f"{np.imag(amp):+.{decimals}f}j)")
            sign = "+"
        if not terms and sign == "+":
            terms.append(f"{mag}|{label}⟩")
        else:
            terms.append(f"{sign} {mag}|{label}⟩" if terms
                         else f"-{mag}|{label}⟩")
    return " ".join(terms) if terms else "0"
