"""Multi-process (multi-host) runtime initialization.

On a TPU pod each host drives its local chips and JAX stitches them into
one global device mesh over ICI/DCN.  This module wraps the
jax.distributed contract with the framework's conventions so multi-host
OO-VQE runs are a one-call setup:

    from auto_oo_tpu.parallel import initialize_distributed, global_mesh
    initialize_distributed()            # env-driven on TPU pods
    mesh = global_mesh(names=("dp", "tp"))

Single-process runs (and the CPU virtual mesh used in tests) skip the
coordination service entirely — everything downstream only sees
jax.devices(), so the same code runs from 1 chip to a pod slice.
SURVEY.md section 5 "Distributed communication backend": the reference
has no distributed layer at all; collectives here are emitted by XLA
from the shardings in parallel/sharding.py / parallel/statevector.py.
"""

import os

import numpy as np
import jax
from jax.sharding import Mesh


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, local_device_ids=None):
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments on Cloud TPU, jax.distributed.initialize discovers
    the topology from the TPU environment; elsewhere the coordinator
    address / process count / process id can be passed explicitly or via
    the standard env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID).  Single-process (no coordinator info anywhere) is a
    no-op so laptops/tests need no special casing.
    """
    # idempotent: public API where available, private fallback for old jax
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None:
        if is_init():
            return False
    elif jax._src.distributed.global_state.client is not None:
        return False
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = (num_processes if num_processes is not None
                     else int(env_np) if env_np else None)
    on_tpu_pod = jax.default_backend() == "tpu" and num_processes is None \
        and coordinator_address is None and "TPU_WORKER_HOSTNAMES" in os.environ
    if coordinator_address is None and not on_tpu_pod:
        if num_processes in (None, 1):
            return False  # single-process: nothing to initialize
        raise ValueError(
            "multi-process run needs a coordinator_address "
            "(or JAX_COORDINATOR_ADDRESS)")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    return True


def global_mesh(names=("dp", "tp"), shape=None):
    """Mesh over ALL processes' devices (jax.devices() is global after
    initialize_distributed)."""
    devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1,) * (len(names) - 1) + (n,)
    return Mesh(np.array(devices).reshape(shape), names)
