"""Which dynamic row-gather mechanism does Mosaic accept (and how fast)?

The round-4 DMA kernels (ops/pallas_grid.py) sliced single rows out of a
2-D tiled HBM memref — illegal at production shapes ("Slice shape along
dimension 0 must be aligned to tiling (8)"; the (B*Ns, Nb) flatten does
not help because dim 0 of a 2-D memref IS the sublane-tiled axis).  This
experiment measures the legal alternatives on the real chip before the
kernels are rewritten:

  A. 1-D flatten: x viewed (N*nb,), one DMA of nb lanes at dynamic
     offset i*nb (nb a multiple of 128, so every slice is lane-aligned).
  B. VMEM-resident x: the (Ns, nb) block lives in VMEM; rows are read
     with a dynamic sublane index (no DMA at all).  Only legal while x
     fits VMEM (~ncas <= 13 for the per-spin string grid).
  C. 8-row aligned DMA: copy rows [8*(i//8), 8*(i//8)+8) (tile-aligned
     shape) and select row i%8 in VMEM — 8x traffic control case.

Each variant computes out[k, i, :] = x[src[k, i], :] * s[k, i], checked
against the XLA take() result.  Timing runs K gathers inside ONE jitted
scan (the carry accumulates each materialized output) so the ~25 ms
remote-dispatch latency of the axon tunnel amortizes away — the first
run of this experiment timed every variant at exactly the dispatch
latency and could not distinguish them.

Usage: python scripts/experiment_gather_mechanisms.py [ncas] [K]
"""

import functools
import sys
import time

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8      # rows per program step
L = 128


def repeat_scan(gather_fn, K):
    """K dispatched-once repetitions: y_{k+1} = y_k + gather(x + c_k).

    The broadcast add of a fresh constant per step stops XLA hoisting
    the gather out of the scan; the carry add forces each (n2, na, nb)
    output to materialize, as the production Phi build does.
    """

    @jax.jit
    def run(x, src, s, cs):
        def body(y, c):
            return y + gather_fn(x + c, src, s), None

        n2, na = src.shape
        y0 = jnp.zeros((n2, na, x.shape[1]), x.dtype)
        return lax.scan(body, y0, cs)[0]

    return run


def timed(name, f, *args, ref=None, K=1, n=6, bytes_out=None):
    try:
        out = f(*args)
        out.block_until_ready()
    except Exception as exc:
        msg = str(exc).split("\n")[0][:160]
        print(f"{name:34s} FAILED: {msg}")
        return None
    if ref is not None:
        err = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
        tag = f"relerr {err:.1e}"
    else:
        tag = ""
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f(*args).block_until_ready()
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts)) / K
    gb = (bytes_out if bytes_out is not None
          else out.size * out.dtype.itemsize) / 1e9
    print(f"{name:34s} {t*1e3:8.3f} ms/op  {gb:.3f} GB out -> "
          f"{gb/t:7.1f} GB/s  {tag}")
    return t


# ---------------------------------------------------------------- A: 1-D
def _kern_a(src_ref, s_ref, xf_ref, o_ref, buf, sem, *, nb):
    r = pl.program_id(1)
    nr = pl.num_programs(1)

    def start(rb, slot):
        slot = jnp.int32(slot)
        for j in range(R):
            i = src_ref[0, 0, jnp.int32(rb * R + j)]
            pltpu.make_async_copy(
                xf_ref.at[pl.ds(i * jnp.int32(nb), nb)],
                buf.at[slot, jnp.int32(j)], sem.at[slot, jnp.int32(j)],
            ).start()

    @pl.when(r == 0)
    def _():
        start(0, 0)

    @pl.when(r + 1 < nr)
    def _():
        start(r + 1, lax.rem(r + 1, jnp.int32(2)))

    cur = lax.rem(r, jnp.int32(2))
    for j in range(R):
        jj = jnp.int32(j)
        pltpu.make_async_copy(xf_ref.at[pl.ds(jnp.int32(0), nb)],
                              buf.at[cur, jj], sem.at[cur, jj]).wait()
        o_ref[0, j, :] = buf[cur, jj, :] * s_ref[0, 0, r * R + j]


def gather_a(x, src, s):
    n2, na = src.shape
    ns, nb = x.shape
    nblk = na // R
    xf = x.reshape(ns * nb)
    return pl.pallas_call(
        functools.partial(_kern_a, nb=nb),
        grid=(n2, nblk),
        in_specs=[
            pl.BlockSpec((1, 1, na), lambda k, r: (k, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, na), lambda k, r: (k, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, R, nb), lambda k, r: (k, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n2, na, nb), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, R, nb), x.dtype),
            pltpu.SemaphoreType.DMA((2, R)),
        ],
    )(src[:, None], s[:, None], xf)


# ------------------------------------------------------------- B: VMEM x
def _kern_b(src_ref, s_ref, x_ref, o_ref):
    r = pl.program_id(1)
    for j in range(R):
        i = src_ref[0, 0, r * R + j]
        o_ref[0, j, :] = x_ref[i, :] * s_ref[0, 0, r * R + j]


def gather_b(x, src, s):
    n2, na = src.shape
    ns, nb = x.shape
    nblk = na // R
    return pl.pallas_call(
        _kern_b,
        grid=(n2, nblk),
        in_specs=[
            pl.BlockSpec((1, 1, na), lambda k, r: (k, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, na), lambda k, r: (k, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ns, nb), lambda k, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, nb), lambda k, r: (k, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n2, na, nb), x.dtype),
    )(src[:, None], s[:, None], x)


# -------------------------------------------- C: aligned 8-row block DMA
def _kern_c(src_ref, s_ref, x_ref, o_ref, buf, sem):
    r = pl.program_id(1)
    for j in range(R):
        jj = jnp.int32(j)
        i = src_ref[0, 0, r * R + j]
        blk = (i // jnp.int32(8)) * jnp.int32(8)
        pltpu.make_async_copy(x_ref.at[pl.ds(blk, 8)], buf.at[jj],
                              sem.at[jj]).start()
    for j in range(R):
        jj = jnp.int32(j)
        i = src_ref[0, 0, r * R + j]
        pltpu.make_async_copy(x_ref.at[pl.ds(jnp.int32(0), 8)],
                              buf.at[jj], sem.at[jj]).wait()
        o_ref[0, j, :] = buf[jj, lax.rem(i, jnp.int32(8)), :] * s_ref[0, 0, r * R + j]


def gather_c(x, src, s):
    n2, na = src.shape
    ns, nb = x.shape
    nblk = na // R
    return pl.pallas_call(
        _kern_c,
        grid=(n2, nblk),
        in_specs=[
            pl.BlockSpec((1, 1, na), lambda k, r: (k, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, na), lambda k, r: (k, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, R, nb), lambda k, r: (k, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n2, na, nb), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((R, 8, nb), x.dtype),
            pltpu.SemaphoreType.DMA((R,)),
        ],
    )(src[:, None], s[:, None], x)


def main():
    ncas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from math import comb

    na_str = comb(ncas, ncas // 2)      # alpha strings
    ns = ((na_str + 7) // 8) * 8        # row-padded
    nb = ((na_str + L - 1) // L) * L    # lane-padded row length
    n2 = ncas * ncas
    na = ((na_str + R - 1) // R) * R    # gather count per pair
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ns, nb)), jnp.float32)
    src = jnp.asarray(rng.integers(0, ns, (n2, na)), jnp.int32)
    s = jnp.asarray(rng.standard_normal((n2, na)), jnp.float32)
    cs = jnp.asarray(rng.standard_normal(K), jnp.float32)
    out_bytes = n2 * na * nb * 4
    print(f"device={jax.devices()[0].platform} ncas={ncas} K={K} "
          f"x=({ns},{nb}) out=({n2},{na},{nb}) f32 "
          f"({out_bytes/1e9:.3f} GB/op)")

    def xla_gather(x, src, s):
        return jnp.take(x, src, axis=0) * s[:, :, None]

    ref = repeat_scan(xla_gather, K)(x, src, s, cs)
    timed("xla take", repeat_scan(xla_gather, K), x, src, s, cs,
          ref=ref, K=K, bytes_out=out_bytes)
    timed("A: 1-D flat DMA (db)", repeat_scan(gather_a, K), x, src, s,
          cs, ref=ref, K=K, bytes_out=out_bytes)
    timed("B: VMEM-resident dyn-sublane", repeat_scan(gather_b, K), x,
          src, s, cs, ref=ref, K=K, bytes_out=out_bytes)
    timed("C: aligned 8-row DMA", repeat_scan(gather_c, K), x, src, s,
          cs, ref=ref, K=K, bytes_out=out_bytes)


if __name__ == "__main__":
    main()
