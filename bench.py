"""Benchmark: wall-clock per Newton-Raphson iteration (E + gradient + full
Hessian + damped step) for formaldimine OO-PQC — the BASELINE.json metric.

Runs on whatever jax platform the environment provides (the real TPU chip
under the driver).  Prints the result as a JSON line on stdout:
  {"metric": ..., "value": ..., "unit": "s", "vs_baseline": ...}
(progress goes to stderr).

EVIDENCE-FIRST STRUCTURE (round-5 redesign after BENCH_r04's rc=124 /
parsed=null): the cumulative JSON line is (re)printed after EVERY
completed tier, a SIGTERM/SIGINT handler prints it one final time when
an external `timeout` kills the run, and a wall-clock budget
(AUTO_OO_BENCH_BUDGET_S, default 1500 s) sheds tiers when exceeded —
duplicate-variant/optional tiers at 60% of the budget, core tiers (the
north-star and production set) only at the full budget — so the run
normally finishes well inside the driver's window with the
highest-value tiers intact.  Tiers
are ordered headline-first; one slow tier can no longer forfeit the
whole round's perf evidence.  The LAST JSON line on stdout is always
the most complete result.

Default tiers (all formaldimine, sto-3g unless noted):
  (6e,6o)   full space        — the headline BASELINE.json metric
  (3e,3o)   doublet (cation)  — the literal BASELINE.json north-star config
  (4e,3o)   full space
  (8e,8o)   SECTOR basis      — D = C(8,4)^2 = 4,900 (the production config)
  (10e,10o) SECTOR, mixed     — string-grid kernels, f32 Hessian blocks
  (12e,12o) SECTOR, mixed     — D = 853,776, staged pipeline
Extra tiers (--full, or leftover budget): (8e,8o) full space,
(10e,10o) f64 / synced / pallas A/B, (4e,4o) cc-pVDZ, device-loop runs.

Each tier reports median, p95 and the max/min iteration ratio — iteration
time of a fixed compiled program should be flat; the ratio quantifies
host-sync / service jitter instead of leaving it anecdotal.

The reference publishes no numbers (BASELINE.md); the driver-set target is
< 1 s per NR iteration on one TPU v5e chip — `vs_baseline` is reported as
target_seconds / measured_seconds against that 1 s target for the headline
(6e,6o) configuration, so > 1.0 beats the target.

A persistent XLA compilation cache under .jax_cache/ makes repeat runs
skip the (large) one-time compile of the NR-iteration programs.
"""

import json
import os
import signal
import sys
import time

import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")

_T_START = time.time()


def _budget_s():
    return float(os.environ.get("AUTO_OO_BENCH_BUDGET_S", 1500.0))


def _elapsed():
    return time.time() - _T_START


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# ---- incremental result emission -------------------------------------------

_RESULT = {
    "metric": "nr_iter_wall_s_formaldimine_6e6o_sto3g",
    "value": None,
    "unit": "s",
    "vs_baseline": None,
    "extra": {},
}


def _emit(note=None):
    """Print the cumulative result JSON line (the driver parses stdout;
    the LAST such line is the most complete)."""
    out = dict(_RESULT)
    if note is not None:
        out = dict(out, note=note)
    print(json.dumps(out), flush=True)


def _install_signal_emit():
    """On SIGTERM/SIGINT (the `timeout` kill path) print the cumulative
    JSON one final time so a timed-out run still yields parsed != null."""
    def handler(signum, frame):
        _emit(note=f"killed by signal {signum} at {_elapsed():.0f}s; "
                   "partial tier set")
        # restore + re-raise so the exit code still reflects the kill
        signal.signal(signum, signal.SIG_DFL)
        os.kill(os.getpid(), signum)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, handler)
        except (ValueError, OSError):  # non-main thread / platform quirk
            pass


def _stats(times):
    t = np.asarray(times)
    return {
        "median": float(np.median(t)),
        "p95": float(np.percentile(t, 95)),
        "min": float(t.min()),
        "max": float(t.max()),
        "ratio_max_min": float(t.max() / t.min()),
    }


def time_nr_iters(ncas, nelecas, n_layers, n_iters=6, sector=False,
                  basis="sto-3g", sync_per_program=False,
                  precision="f64", pallas=False, ansatz="np_fabric",
                  add_singles=False, charge=0, spin=0):
    """Time NR iterations; returns (stats, compile_s, energy, flop_info).

    sync_per_program=True inserts a block_until_ready between the two NR
    programs (grad_hess, then update) — the controlled experiment from
    BASELINE.md: back-to-back async dispatch through the remote-device
    link occasionally stalls 0.5-1 s, while synced dispatch is flat.

    pallas=True routes the f32 grid gathers through the DMA kernels
    (ops/pallas_grid.py) for the duration of this tier — the A/B against
    XLA's gather lowering; only meaningful with precision='mixed'.

    charge/spin select an ionized/open-shell molecule (the (3e,3o)
    doublet north-star tier runs the formaldimine cation)."""
    from auto_oo_tpu import config

    prev = config.pallas_enabled()
    if pallas:
        config.set_pallas(True)
    try:
        return _time_nr_iters_body(
            ncas, nelecas, n_layers, n_iters, sector, basis,
            sync_per_program, precision, ansatz, add_singles, charge,
            spin)
    finally:
        if pallas:
            config.set_pallas(prev)   # restore (honor AUTO_OO_TPU_PALLAS=1)


def _time_nr_iters_body(ncas, nelecas, n_layers, n_iters, sector, basis,
                        sync_per_program, precision, ansatz, add_singles,
                        charge, spin):
    import jax
    import jax.numpy as jnp

    from auto_oo_tpu import Moldata, get_formal_geo
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc

    t0 = time.time()
    # one trivial executable first: the first compile+load on a fresh
    # device session carries tens of seconds of one-time warmup that is
    # not this program's compile time
    jax.jit(lambda x: x + 1.0)(jnp.zeros(8)).block_until_ready()
    kw = {}
    if charge or spin:
        kw = {"charge": charge, "spin": spin}
    mol = Moldata(get_formal_geo(140, 80), basis, **kw)
    pqc = Parameterized_circuit(ncas, nelecas, ansatz=ansatz,
                                add_singles=add_singles,
                                n_layers=n_layers, sector=sector)
    oo = OO_pqc(pqc, mol, ncas, nelecas, freeze_active=True,
                precision=precision)
    theta = pqc.init_zeros()
    ne = (nelecas if isinstance(nelecas, int) else sum(nelecas))
    log(f"setup ({ne}e,{ncas}o) {basis}"
        f"{' sector' if sector else ''}: {time.time() - t0:.1f}s "
        f"(n_theta={pqc.theta_shape}, n_kappa={oo.n_kappa}, "
        f"D={pqc.state_dim})")

    t0 = time.time()
    out = oo._nr_iteration_jit(theta, oo.oao_mo_coeff, 1e-4, 0.5, 1e-6,
                               1.1, 1e-6)
    out[3].block_until_ready()
    compile_s = time.time() - t0
    log(f"first NR iteration (incl. compile): {compile_s:.1f}s")

    times = []
    th, oao = out[0], out[2]
    for i in range(n_iters):
        t0 = time.time()
        if sync_per_program:
            e0, grad, hess = oo._grad_hess_jit(th, oao)
            hess.block_until_ready()
            th, kp, oao, energy, low = oo._core["newton_update_jit"](
                th, oao, *oo._mol_args, e0, grad, hess,
                1e-4, 0.5, 1e-6, 1.1, 1e-6)
        else:
            th, kp, oao, energy, low = oo._nr_iteration_jit(
                th, oao, 1e-4, 0.5, 1e-6, 1.1, 1e-6)
        energy.block_until_ready()
        times.append(time.time() - t0)
        log(f"iter {i}: {times[-1]:.4f}s  E={float(energy):.10f}")
    st = _stats(times)
    # device-efficiency accounting: statically known algorithmic f64
    # FLOPs per iteration / measured median wall-clock
    from auto_oo_tpu.utils import flops as _flops
    fl = _flops.nr_iteration_flops(pqc, oo)
    achieved, frac = _flops.mfu(fl["total"], st["median"])
    flop_info = {
        "f64_gflop_per_iter": round(fl["total"] / 1e9, 3),
        "achieved_f64_gflops": round(achieved / 1e9, 2),
        "mfu_pct_vs_bf16_peak": round(100.0 * frac, 4),
    }
    if sector:
        # spin purity at the final iterate — the sector-scale S^2
        # diagnostic (O(ncas * D) gather maps, no 4^ncas operator)
        s2 = float(pqc.s2_expectation(th))
        flop_info["s2_final"] = round(s2, 10)
        s2_ref = 0.0 if spin == 0 else (spin / 2) * (spin / 2 + 1)
        assert abs(s2 - s2_ref) < 1e-6, f"spin contamination: <S^2> = {s2}"
    return st, compile_s, float(energy), flop_info


def time_device_loop(ncas, nelecas, n_layers, basis="sto-3g",
                     sector=False, precision="f64"):
    """Time a WHOLE OO-VQE optimization run as one device program
    (full_optimization(device_loop=True): lax.while_loop over NR
    iterations, convergence test on device).  Removes the per-iteration
    dispatch+sync round trips of the host loop — on the tunneled device
    those dominate small tiers, so s_per_iter_effective vs the host-loop
    median quantifies the dispatch overhead directly."""
    from auto_oo_tpu import Moldata, get_formal_geo
    from auto_oo_tpu.models import Parameterized_circuit, OO_pqc

    mol = Moldata(get_formal_geo(140, 80), basis)
    pqc = Parameterized_circuit(ncas, nelecas, ansatz="np_fabric",
                                n_layers=n_layers, sector=sector)
    oo = OO_pqc(pqc, mol, ncas, nelecas, freeze_active=True,
                precision=precision)
    theta = pqc.init_zeros()
    t0 = time.time()
    res = oo.full_optimization(theta, device_loop=True)
    compile_s = time.time() - t0
    log(f"device loop ({nelecas}e,{ncas}o): first run "
        f"{compile_s:.1f}s ({len(res[0])} iters, incl. compile)")
    # warm run from the same cold start (fresh MO state, compiled program)
    oo2 = OO_pqc(pqc, mol, ncas, nelecas, freeze_active=True,
                 precision=precision)
    t0 = time.time()
    res2 = oo2.full_optimization(theta, device_loop=True)
    wall = time.time() - t0
    n = len(res2[0])
    log(f"device loop warm: {wall:.3f}s / {n} iters "
        f"= {wall / max(n, 1):.4f}s per iter, E={res2[0][-1]:.10f}")
    return {"wall_s": round(wall, 4), "iters": n,
            "s_per_iter_effective": round(wall / max(n, 1), 5),
            "first_run_incl_compile_s": round(compile_s, 2),
            "energy": res2[0][-1]}


def _probe_backend(timeout_s=300):
    """Fail fast (with a parseable JSON line) when the device backend is
    hung: jax.devices() on a wedged remote tunnel blocks forever inside
    the plugin, which would otherwise turn a driver bench run into a
    silent multi-hour hang.  A subprocess is the only reliable timeout
    around a blocking C++ init."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); print('BACKEND-OK', len(d))"],
            capture_output=True, text=True, timeout=timeout_s)
        if "BACKEND-OK" in (r.stdout or ""):
            return True
        log(f"backend probe failed: {r.stdout!r} {r.stderr[-400:]!r}")
    except subprocess.TimeoutExpired:
        log(f"backend probe timed out after {timeout_s}s")
    _emit(note="device backend unreachable (probe timeout)")
    return False


def main():
    _install_signal_emit()
    os.makedirs(_CACHE, exist_ok=True)
    if not _probe_backend():
        return
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # cache is best-effort
        log(f"compilation cache unavailable: {exc}")

    full = "--full" in sys.argv[1:]
    extra = _RESULT["extra"]

    def tier(label, *args, **kwargs):
        try:
            s, c, e, f = time_nr_iters(*args, **kwargs)
            extra[f"nr_iter_wall_s_{label}"] = round(s["median"], 6)
            extra[f"stats_{label}"] = s
            extra[f"compile_s_{label}"] = round(c, 2)
            extra[f"flops_{label}"] = f
            extra[f"energy_{label}"] = e
        except Exception as exc:
            log(f"{label} tier skipped: {exc}")
            extra[f"tier_{label}_skipped"] = str(exc)[:200]
        _emit()

    def over_budget(label, core=False):
        """Budget gate.  CORE tiers (the headline-value set) get the
        full budget; optional/duplicate-variant tiers only 60% of it —
        so a slow-compile environment sheds the duplicates first and
        the north-star/production tiers last.  Thanks to the
        incremental JSON emission a run that exceeds its budget
        mid-tier still yields evidence; the budget exists to
        prioritize, not to protect parsing."""
        if full:
            return False
        limit = _budget_s() if core else 0.6 * _budget_s()
        if _elapsed() > limit:
            log(f"budget: {_elapsed():.0f}s > {limit:.0f}s — "
                f"skipping {'core' if core else 'optional'} tier {label}")
            extra.setdefault("tiers_skipped_for_budget", []).append(label)
            return True
        return False

    # ---- headline tier: always first, always runs --------------------
    try:
        st, compile_s, energy, fl = time_nr_iters(6, 6, 2)
        _RESULT["value"] = round(st["median"], 6)
        _RESULT["vs_baseline"] = round(1.0 / st["median"], 3)
        extra.update({"compile_s_6e6o": round(compile_s, 2),
                      "energy_6e6o": energy, "stats_6e6o": st,
                      "flops_6e6o": fl})
    except Exception as exc:
        log(f"headline 6e6o tier FAILED: {exc}")
        extra["tier_6e6o_skipped"] = str(exc)[:200]
    _emit()

    # ---- core tiers, headline-value first -----------------------------
    # the literal BASELINE.json north-star config: formaldimine cation,
    # (3e,3o) doublet active space, UCCSD ansatz (GateFabric needs an
    # even electron pair count); target < 1 s/NR-iter
    if not over_budget("3e3o_doublet", core=True):
        tier("3e3o_doublet", 3, (2, 1), 1, ansatz="ucc",
             add_singles=True, charge=1, spin=1)
    if not over_budget("4e3o", core=True):
        tier("4e3o", 3, 4, 1)
    # (8e,8o) sector basis: D = 4,900 vs 65,536 — the production config
    if not over_budget("8e8o_sector", core=True):
        tier("8e8o_sector", 8, 8, 2, n_iters=6, sector=True)
    # (10e,10o)/(12e,12o) sector tiers (D = 63,504 / 853,776), mixed
    # precision: Hessian blocks f32 on the MXU through the string-grid
    # kernels, energy/gradient f64 (converged energies agree with f64 to
    # ~1e-10 Ha, tests/test_mixed_precision.py)
    if not over_budget("10e10o_sector_mixed", core=True):
        tier("10e10o_sector_mixed", 10, 10, 2, n_iters=3, sector=True,
             precision="mixed")
    # (12e,12o) through the STAGED large-D pipeline + string-grid
    # kernels: warm mixed iterations ~2-3 s; one-time stage compiles
    # amortize through .jax_cache/.  n_layers=1 (nt = 12).
    if not over_budget("12e12o_sector_mixed", core=True):
        tier("12e12o_sector_mixed", 12, 12, 1, n_iters=3, sector=True,
             precision="mixed")

    # ---- optional tiers (leftover budget, or --full) ------------------
    # (8e,8o) full space: the reference architecture's practical ceiling
    if not over_budget("8e8o"):
        tier("8e8o", 8, 8, 2, n_iters=3)
    # f64 variant of the (10e,10o) sector tier (mixed speedup denominator)
    if not over_budget("10e10o_sector"):
        tier("10e10o_sector", 10, 10, 2, n_iters=3, sector=True)
    # synced-dispatch variant: per-program block_until_ready removes the
    # async-dispatch stalls of the remote link (BASELINE.md variance
    # diagnosis) — ratio_max_min here quantifies the flat compute floor
    if not over_budget("10e10o_sector_synced"):
        tier("10e10o_sector_synced", 10, 10, 2, n_iters=3, sector=True,
             sync_per_program=True)
    # pallas A/B: f32 grid gathers through the DMA kernels
    # (ops/pallas_grid.py) vs XLA's gather lowering (a documented tie)
    if not over_budget("10e10o_sector_mixed_pallas"):
        tier("10e10o_sector_mixed_pallas", 10, 10, 2, n_iters=3,
             sector=True, precision="mixed", pallas=True)
    # polarized-basis tier: nao = 43 stresses the nao^4 transform and
    # the native ERI engine
    if not over_budget("4e4o_ccpvdz"):
        tier("4e4o_ccpvdz", 4, 4, 2, n_iters=3, basis="cc-pvdz")
    # one-dispatch whole-optimization runs (device_loop=True)
    for label, args in (("6e6o", (6, 6, 2)),
                        ("8e8o_sector", (8, 8, 2))):
        if over_budget(f"device_loop_{label}"):
            break
        try:
            extra[f"device_loop_{label}"] = time_device_loop(
                *args, sector=label.endswith("sector"))
        except Exception as exc:
            log(f"device_loop {label} tier skipped: {exc}")
        _emit()

    # PyTorch-CPU reference-pattern baseline, measured on this host with
    # scripts/bench_torch_cpu.py (the reference's own deps are not
    # installable here; that script reimplements its default hot path —
    # complex128 backprop sim, ncas^4 sparse-matvec RDM loops, AD circuit
    # blocks + analytic orbital blocks, Armijo NR step — in torch):
    torch_cpu_6e6o = 35.823  # scripts/bench_torch_cpu.py on this host
    extra["torch_cpu_ref_nr_iter_s_6e6o"] = torch_cpu_6e6o
    if _RESULT["value"]:
        extra["speedup_vs_torch_cpu_6e6o"] = round(
            torch_cpu_6e6o / _RESULT["value"], 1)
    torch_cpu_44dz = 18.045  # same script, (4e,4o) cc-pVDZ tier
    if "nr_iter_wall_s_4e4o_ccpvdz" in extra:
        extra["torch_cpu_ref_nr_iter_s_4e4o_ccpvdz"] = torch_cpu_44dz
        extra["speedup_vs_torch_cpu_4e4o_ccpvdz"] = round(
            torch_cpu_44dz / extra["nr_iter_wall_s_4e4o_ccpvdz"], 1)
    extra["bench_wall_s"] = round(_elapsed(), 1)
    _emit()


if __name__ == "__main__":
    sys.exit(main())
