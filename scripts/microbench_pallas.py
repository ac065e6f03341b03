"""Microbenchmark: XLA grid gathers vs pallas DMA-gather kernels, on the
current default device, at sector shapes.

Decides whether the pallas kernels (ops/pallas_grid.py) become the
default f32 grid path: they replace XLA's row gathers (measured well
below HBM bandwidth at (10e,10o)-(12e,12o)) with explicit HBM->VMEM row
DMAs and fuse the sign scaling; gather_reduce additionally never
materializes the (n2, D) gathered intermediate.

Usage: python scripts/microbench_pallas.py [ncas] [B]
  ncas 10 -> (10e,10o) shapes, 12 -> (12e,12o); B = batch for phi.
"""

import os
import sys
import time

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")


def main():
    ncas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    os.makedirs(_CACHE, exist_ok=True)
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    import jax.numpy as jnp
    import numpy as np

    from auto_oo_tpu.ops import grid
    from auto_oo_tpu.ops import pallas_grid as pg

    gm = grid.build_grid_maps(ncas, ncas)
    print(f"device={jax.devices()[0].platform} ncas={ncas} "
          f"D={gm.dim} n2={gm.n2} Na={gm.Na} B={B} f32", file=sys.stderr)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, gm.dim)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((gm.n2, gm.dim)), jnp.float32)

    def timed(name, fn, *args, n=8, ref=None, moved_gb=None):
        """moved_gb: actual HBM traffic of the op (in + out); defaults
        to the OUTPUT size — correct for the phi probes (output
        dominates) but ~n2x low for the reduce probes, whose output is
        tiny against the Y read."""
        f = jax.jit(fn)
        out = f(*args)
        jax.device_get(jnp.ravel(out)[:1])
        t0 = time.time()
        for _ in range(n):
            out = f(*args)
        jax.device_get(jnp.ravel(out)[:1])
        med = (time.time() - t0) / n
        gb = (moved_gb if moved_gb is not None
              else out.size * out.dtype.itemsize / 1e9)
        line = (f"{name:26s} {med * 1e3:9.2f} ms   {gb:.3f} GB moved "
                f"-> {gb / med:7.1f} GB/s eff")
        if ref is not None:
            err = float(jnp.max(jnp.abs(out - ref)))
            line += f"   maxerr {err:.2e}"
        print(line, file=sys.stderr)
        return out, med

    # baselines call the XLA implementations DIRECTLY — grid.phi_all /
    # grid.epq_sum dispatch through the global pallas toggle, which
    # would silently time pallas against pallas under
    # AUTO_OO_TPU_PALLAS=1 (the very flag this script's verdict governs)
    ref_phi, t_x = timed("xla phi_all",
                         lambda v: grid._phi_all_xla(v, gm), x)
    _, t_p = timed("pallas phi_all",
                   lambda v: pg.phi_all_pallas(v, gm), x, ref=ref_phi)
    print(f"phi speedup: {t_x / t_p:.2f}x", file=sys.stderr)

    ref_s, t_xs = timed("xla epq_sum",
                        lambda y: grid._epq_sum_xla(y, gm), Y)
    _, t_ps = timed("pallas epq_sum",
                    lambda y: pg.epq_sum_pallas(y, gm), Y, ref=ref_s)
    print(f"epq_sum speedup: {t_xs / t_ps:.2f}x", file=sys.stderr)

    # raw row-gather bandwidth probes: XLA gather vs the serial pallas
    # kernel vs the double-buffered one (DMA-latency hiding); same for
    # the reduce.  These decide the kernels' default variants.
    xf = x[0].reshape(gm.Na, gm.Nb)
    sA = gm.sgnA.astype(jnp.float32)
    tB = gm.tB.astype(jnp.float32)
    timed("xla row gather (alpha)",
          lambda v: v[gm.srcA, :] * sA[:, :, None] * tB[:, None, :], xf)
    ref_g, _ = timed(
        "pallas row gather v1",
        lambda v: pg.gather_rows_scaled(v, gm.srcA, sA, tB,
                                        double_buffer=False), xf)
    timed("pallas row gather DB",
          lambda v: pg.gather_rows_scaled(v, gm.srcA, sA, tB), xf,
          ref=ref_g)
    Yf = Y.reshape(gm.n2, gm.Na, gm.Nb)
    y_gb = Yf.size * Yf.dtype.itemsize / 1e9   # the reduce READS all of Y
    ref_r, _ = timed(
        "pallas reduce v1",
        lambda v: pg.gather_reduce(v, gm.srcA, sA, tB,
                                   double_buffer=False), Yf,
        moved_gb=y_gb)
    timed("pallas reduce DB",
          lambda v: pg.gather_reduce(v, gm.srcA, sA, tB), Yf, ref=ref_r,
          moved_gb=y_gb)


if __name__ == "__main__":
    main()
