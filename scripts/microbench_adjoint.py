"""Microbenchmark: plain-AD VJP vs ADJOINT (reversible) VJP through the
grid gate program, on the current default device.

The adjoint backward (GridGateProgram.apply_adjoint, jax.custom_vjp)
reconstructs intermediate states by inverse rotation instead of storing
them: O(D) residuals vs O(n_gates * D).  This measures what that does to
the circuit-gradient wall time — the dominant stage of the gradient-only
OO-VQE step at (12e,12o)+ — plus the residual-memory estimate that
decides feasibility at (14e,14o).

Usage: python scripts/microbench_adjoint.py [ncas] [n_layers]
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
_CACHE = os.path.join(_ROOT, ".jax_cache")


def main():
    ncas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_layers = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    os.makedirs(_CACHE, exist_ok=True)
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    import jax.numpy as jnp
    import numpy as np

    from auto_oo_tpu.models import Parameterized_circuit

    pqc = Parameterized_circuit(ncas, ncas, ansatz="np_fabric",
                                n_layers=n_layers, sector=True)
    gp = pqc.grid_program
    n_gates = len(gp.gates)
    res_plain = n_gates * gp.dim * 8 / 1e9
    print(f"device={jax.devices()[0].platform} ncas={ncas} D={gp.dim} "
          f"n_gates={n_gates} nt={pqc.theta_shape} | plain-AD residuals "
          f"~{res_plain:.2f} GB, adjoint ~{3 * gp.dim * 8 / 1e9:.3f} GB",
          file=sys.stderr)

    theta = 0.01 * jnp.arange(pqc.theta_shape, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal(gp.dim))

    def timed(name, fn, *args, n=6):
        f = jax.jit(fn)
        t0 = time.time()
        out = f(*args)
        jax.device_get(jnp.ravel(out)[:1])
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(n):
            out = f(*args)
        jax.device_get(jnp.ravel(out)[:1])
        med = (time.time() - t0) / n
        print(f"{name:22s} {med * 1e3:9.2f} ms  (compile {compile_s:.1f} s)")
        return med

    t_fwd = timed("state forward", lambda th: gp.apply(
        pqc._expand_theta(th)), theta)
    t_plain = timed("grad plain-AD", jax.grad(
        lambda th: gp.apply(pqc._expand_theta(th)) @ w), theta)
    t_adj = timed("grad adjoint", jax.grad(
        lambda th: gp.apply_adjoint(pqc._expand_theta(th)) @ w), theta)
    print(f"adjoint/plain = {t_adj / t_plain:.2f}x   "
          f"grad/forward: plain {t_plain / t_fwd:.1f}x, "
          f"adjoint {t_adj / t_fwd:.1f}x")


if __name__ == "__main__":
    main()
