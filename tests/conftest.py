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

# Persistent compilation cache: the test box has ONE cpu core and the
# suite's cost is dominated by XLA compiles, so warm-cache reruns matter.
# Harmless no-op on backends that don't support it.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: exhaustive/heavy variant, skipped unless RUN_SLOW=1 — the "
        "fast tier keeps at least one representative per subsystem",
    )


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: `pytest tests/` is the fast gate (every subsystem
    covered, single-core-friendly); RUN_SLOW=1 adds the exhaustive tier
    (multi-process multihost, long trajectories, redundant parameter
    combinations). Durations that motivated the split are recorded in the
    round-3 notes."""
    if os.environ.get("RUN_SLOW", "0") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier: set RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
