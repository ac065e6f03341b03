"""Compile-time of the primitive blocks at (6e,6o) on the real TPU."""
import sys
import time

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed_compile(name, fn, *args):
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    t0 = time.time()
    lowered = jitted.lower(*args)
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    log(f"{name:24s} lower {t1 - t0:7.2f}s   compile {t2 - t1:7.2f}s")


def main():
    from auto_oo_tpu import Moldata, get_formal_geo
    from auto_oo_tpu.models import Parameterized_circuit
    from auto_oo_tpu.ops import transforms as _tr
    from auto_oo_tpu.ops.linalg import expm, eigh

    mol = Moldata(get_formal_geo(140, 80), "sto-3g")
    pqc = Parameterized_circuit(6, 6, ansatz="np_fabric", n_layers=2)
    theta = pqc.init_zeros()
    log(f"n_gates={pqc.program.half.shape[0]} dim={pqc.program.dim}")

    # warm up device
    jnp.zeros(8).block_until_ready()

    timed_compile("sim apply", pqc._state_impl, theta)
    timed_compile("rdms", pqc._rdms_impl, theta)
    g2 = jnp.asarray(mol.int2e_ao)
    C = jnp.eye(mol.nao, dtype=jnp.float64)
    timed_compile("int2e_transform", _tr.int2e_transform, g2, C)
    timed_compile("expm13", expm, jnp.zeros((13, 13)))
    timed_compile("eigh66", eigh, jnp.eye(66))
    timed_compile("grad(rdm-energy)", jax.grad(
        lambda th: pqc._rdms_impl(th)[1].sum()), theta)
    timed_compile("jacfwd(grad(rdmsum))", jax.jacfwd(jax.grad(
        lambda th: pqc._rdms_impl(th)[1].sum())), theta)


if __name__ == "__main__":
    main()
