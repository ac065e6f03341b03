"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The session environment pins JAX_PLATFORMS=axon (real TPU through a
tunnel) and sitecustomize imports jax before any test code runs, so the
env-var route is dead — jax.config.update is the only way to select CPU
here.  Sharding tests use the 8 virtual CPU devices.
"""

import os

# must happen before the first backend initialization
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
