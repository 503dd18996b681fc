"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding paths compile and run without TPU hardware.

The session environment registers a real-TPU "axon" backend via
sitecustomize (which pre-imports jax and pins jax_platforms), so plain env
vars are not enough: we must override through jax.config before the backend
initializes."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
