"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The session environment pins JAX_PLATFORMS=axon (real TPU through a
tunnel) and sitecustomize imports jax before any test code runs, so the
env-var route is dead — jax.config.update is the only way to select CPU
here.  Sharding tests use the 8 virtual CPU devices.

Setting AUTO_OO_TPU_TESTS=1 keeps the real backend instead, for the
@pytest.mark.tpu tier (eigh/expm/NR-step correctness ON the chip):

    AUTO_OO_TPU_TESTS=1 python -m pytest -m tpu tests/
"""

import os

import pytest

_ON_TPU = os.environ.get("AUTO_OO_TPU_TESTS", "") == "1"

if not _ON_TPU:
    # must happen before the first backend initialization.
    # single-threaded eigen: with 8 virtual devices on a small host, the
    # per-device intra-op thread pools multiply into dozens of runnable
    # threads whose scheduling jitter can starve the XLA CPU in-process
    # collective rendezvous past its hard 40 s deadline (observed as a
    # rare mid-suite SIGABRT); one thread per device keeps the laggard
    # spread minimal
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               + " --xla_cpu_multi_thread_eigen=false")

import jax

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_collection_modifyitems(config, items):
    if _ON_TPU:
        return
    skip_tpu = pytest.mark.skip(
        reason="needs the real TPU backend (AUTO_OO_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
