"""Test harness: run everything on CPU with 8 virtual devices.

The axon sitecustomize registers the TPU backend at interpreter start, so
the platform must be forced back to CPU via jax.config (JAX_PLATFORMS in the
environment is overridden by the site hook).  XLA_FLAGS must be set before
the CPU client is created (first jax.devices() call).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
