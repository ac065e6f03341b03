"""On-chip A/B: XLA row-gather vs matmul-form grid kernels (f32).

Times phi_all, epq_sum and a batched ham_apply at sector shapes.
Run: python scripts/microbench_gridmm.py [ncas] [nelec] [batch]

Measured (12e,12o) f32 on v5e (2026-08-19): at the 3-pass-bf16
"float32" matmul precision mixed mode requires, mm loses (phi 0.69x,
epq_sum 0.82x); single-pass bf16 ties (phi 1.02x, epq_sum 1.27x) at
1e-2-level error; batched ham_apply ties 1.00x either way.  Hence
config default AUTO_OO_TPU_GRID_MM=off (ops/grid.py block comment).
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ncas = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    nelec = int(sys.argv[2]) if len(sys.argv) > 2 else ncas
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np
    from auto_oo_tpu.ops import grid as G

    gm = G.build_grid_maps(ncas, nelec)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(gm.dim), dtype=jnp.float32)
    xb = jnp.asarray(rng.standard_normal((B, gm.dim)), dtype=jnp.float32)
    Y = jnp.asarray(rng.standard_normal((gm.n2, gm.dim)),
                    dtype=jnp.float32)
    print(f"ncas={ncas} nelec={nelec} D={gm.dim:,} n2={gm.n2} "
          f"Na={gm.Na} B={B}", flush=True)

    def timed(name, fn, *args, n=3):
        # n back-to-back dispatches, ONE device_get sync (the tunneled
        # block_until_ready does not round-trip — microbench_pallas.py)
        jf = jax.jit(fn)
        out = jf(*args)
        jax.device_get(jnp.ravel(out)[:1])
        t0 = time.time()
        for _ in range(n):
            out = jf(*args)
        jax.device_get(jnp.ravel(out)[:1])
        med = (time.time() - t0) / n
        print(f"{name:28s} {med * 1e3:9.2f} ms", flush=True)
        return out, med

    o1, t_g = timed("phi_all gather", G._phi_all_xla, x, gm)
    o2, t_m = timed("phi_all mm (bf16 mxu)", G._phi_all_mm, x, gm)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    print(f"  speedup {t_g / t_m:.2f}x   maxerr {err:.1e}", flush=True)

    def phi_mm_f32(v):
        with jax.default_matmul_precision("float32"):
            return G._phi_all_mm(v, gm)

    o2, t_m = timed("phi_all mm (f32 3-pass)", phi_mm_f32, x)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    print(f"  speedup {t_g / t_m:.2f}x   maxerr {err:.1e}", flush=True)

    o1, t_g = timed("epq_sum gather", G._epq_sum_xla, Y, gm)
    o2, t_m = timed("epq_sum mm (bf16 mxu)", G._epq_sum_mm, Y, gm)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    print(f"  speedup {t_g / t_m:.2f}x   maxerr {err:.1e}", flush=True)

    def epq_mm_f32(v):
        with jax.default_matmul_precision("float32"):
            return G._epq_sum_mm(v, gm)

    o2, t_m = timed("epq_sum mm (f32 3-pass)", epq_mm_f32, Y)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    print(f"  speedup {t_g / t_m:.2f}x   maxerr {err:.1e}", flush=True)

    # full H-apply on a tangent batch through the public dispatch
    from auto_oo_tpu.ops import hamiltonian as _ham
    from auto_oo_tpu import config
    c2 = jnp.asarray(rng.standard_normal((ncas,) * 4), dtype=jnp.float32)
    c2 = 0.5 * (c2 + jnp.transpose(
        c2.reshape(gm.n2, gm.n2)).reshape((ncas,) * 4))
    c1 = jnp.asarray(rng.standard_normal((ncas, ncas)),
                     dtype=jnp.float32)

    def happly(v):
        return _ham.ham_apply(c1, c2, v, ncas, False, gm)

    config.set_grid_mm("off")
    _, t_g = timed("ham_apply gather (batch)", happly, xb)
    config.set_grid_mm("on")
    o2, t_m = timed("ham_apply mm (batch)", happly, xb)
    print(f"  speedup {t_g / t_m:.2f}x", flush=True)
    config.set_grid_mm("auto")


if __name__ == "__main__":
    main()
