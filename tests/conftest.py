"""Test harness config: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend (and pins
``JAX_PLATFORMS=axon``) in every interpreter, so jax is already imported by
the time pytest starts.  Forcing the platform through ``jax.config`` after
import still works as long as no backend has been initialized; XLA_FLAGS must
be set before the CPU client spins up.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.device_count() == 8, "expected 8 virtual CPU devices for tests"
