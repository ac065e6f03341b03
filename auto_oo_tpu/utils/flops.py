"""Static FLOP accounting for the NR-iteration programs (device-efficiency
/ MFU reporting).

Every hot contraction in the grad+Hessian and update programs has a
statically known shape (models/oo_pqc.py), so the algorithmic f64 FLOP
count per NR iteration is computable without instrumentation.  bench.py
divides these counts by measured wall-clock to report achieved FLOP/s and
MFU.

Counting conventions (documented so the numbers are comparable across
rounds):

* a dot of contraction length K counts 2K FLOPs per output element
  (multiply + add);
* gather-multiply pair-rotation updates count 8 FLOPs per (padded) pair
  (4 mul + 2 add + 2 sign mul) per statevector application;
* forward-mode tangents count 2x a primal application per tangent
  (value + tangent arithmetic), reverse-mode ~3x;
* counts are ALGORITHMIC f64 FLOPs.  On TPU, f64 is emulated in f32
  pairs (double-double): one algorithmic f64 MXU FLOP costs roughly an
  order of magnitude more hardware f32 work, which is exactly why the
  mixed-precision path exists.  MFU is reported against the chip's bf16
  peak — it measures how far the workload sits from the hardware
  ceiling, not a claim that f64 could reach it.

Peak numbers: one TPU v5e chip = 197 TFLOP/s bf16 (public spec).
"""

TPU_V5E_BF16_PEAK = 197e12


def _pairs_per_apply(program):
    """Padded pair count summed over gates — the work one statevector
    application actually does (padding pairs compute too)."""
    if program is None or program.half.shape[0] == 0:
        return 0
    return int(program.ia.shape[0] * program.ia.shape[1])


def _pairs_per_apply_grid(grid_program):
    """Rotated-pair count of a string-grid program: sum over gates of
    ka * kb (no padding in the grid representation).  Used instead of
    the flat count so FLOP accounting never triggers the LAZY flat
    pair-table build (simulator/circuit.py program property)."""
    return int(sum(ka * kb for (_, ka), (_, kb)
                   in zip(grid_program._a_off, grid_program._b_off)))


def grad_hess_flops(ncas, D, nt, nk, nao, ns, pairs_per_apply):
    """Algorithmic f64 FLOPs of one fused grad+Hessian program
    (models/oo_pqc.py grad_hess; identical math for the staged path)."""
    n2 = ncas * ncas
    P = pairs_per_apply
    f = 0.0
    # psi + jacfwd J (nt tangents, ~2x primal each)
    f += 8.0 * P * (1 + 2 * nt)
    # ham_apply on psi and the nt tangent rows:
    #   phi gathers 4 n2 D + C2 matmul 2 n2^2 D + c1 bcast 2 n2 D
    #   + scatter-sum 4 n2 D
    ham = 2.0 * n2 * n2 * D + 10.0 * n2 * D
    f += ham * (1 + nt)
    # grad_c = J @ w and e0
    f += 2.0 * nt * D + 2.0 * D
    # hess_cc gram: J (nt, D) x HJ (nt, D)
    f += 2.0 * nt * nt * D
    # term2: jacfwd-of-grad through the simulator (~3x primal per tangent)
    f += 24.0 * P * nt
    # phi = E_pq psi (4 n2 D) and the corr gram (2 n2^2 D)
    f += 4.0 * n2 * D + 2.0 * n2 * n2 * D
    # transition RDMs: phiJ gathers (4 n2 D nt) + two grams vs phi
    # (2 x 2 nt n2^2 D) + dgamma (4 nt n2 D)
    f += 4.0 * n2 * D * nt + 4.0 * nt * n2 * n2 * D + 4.0 * nt * n2 * D
    # AO->MO 4-index transform (full nao, once per call)
    f += 8.0 * nao ** 5
    # analytic orbital Hessian: blocked generalized-Fock contractions,
    # O(ns^4 nao^2) leading term (ops/fock.py)
    f += 2.0 * (ns ** 4) * (nao ** 2)
    # hess_oc pack: affine map per tangent, O(ns^2 nao^2) each
    f += 2.0 * nt * (ns ** 2) * (nao ** 2)
    return f


def update_flops(ncas, D, nt, nk, nao, ns, pairs_per_apply,
                 newton_method="iterative", n_trials=1):
    """Algorithmic f64 FLOPs of one solve + line-search + update program.

    newton_method: 'iterative' (~300 dense (nt+nk)^2 matmuls: Lanczos,
    two Newton-Schulz inverses, refinement) or 'eigh' (~30 Jacobi sweeps
    of 2(n-1) rotations applied as dense matmuls).  n_trials: Armijo
    trials actually run (1 in the common accept-at-t=1 case).
    """
    n = nt + nk
    if newton_method == "eigh" or (newton_method is None and n < 128):
        solve = 30.0 * 2 * n * 2 * n ** 2  # sweeps * rounds * matmul
    else:
        solve = 300.0 * 2.0 * n ** 3
    n2 = ncas * ncas
    # per Armijo trial: expm (~20 nao^3 matmuls) + sub-space 4-index
    # (2 nao^4 ns + 3 smaller steps ~ 8 nao^4 ns upper envelope) + state
    # rebuild + RDM grams + energy contraction
    trial = (40.0 * nao ** 3 + 8.0 * (nao ** 4) * ns
             + 8.0 * pairs_per_apply
             + 2.0 * n2 * n2 * D + 6.0 * n2 * D)
    return solve + n_trials * trial


def nr_iteration_flops(pqc, oo, n_trials=1):
    """Total algorithmic f64 FLOPs of one NR iteration for an OO_pqc
    problem instance (grad_hess + update programs)."""
    ncas = pqc.ncas
    D = pqc.state_dim
    nt = int(pqc.theta_shape)
    nk = int(oo.n_kappa)
    nao = int(oo.nao)
    ns = len(oo._occ) + len(oo._act)
    if getattr(pqc, "grid_program", None) is not None:
        P = _pairs_per_apply_grid(pqc.grid_program)
    else:
        P = _pairs_per_apply(pqc.program)
    method = getattr(oo, "newton_method", None) or "iterative"
    g = grad_hess_flops(ncas, D, nt, nk, nao, ns, P)
    u = update_flops(ncas, D, nt, nk, nao, ns, P,
                     newton_method=method, n_trials=n_trials)
    return {"grad_hess": g, "update": u, "total": g + u}


def mfu(flops_per_iter, seconds_per_iter, peak=TPU_V5E_BF16_PEAK):
    """(achieved FLOP/s, fraction of peak)."""
    achieved = flops_per_iter / seconds_per_iter
    return achieved, achieved / peak
