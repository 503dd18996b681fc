"""Multi-host (multi-process) execution wiring.

The reference has NO distributed backend at all — its only multi-device
strategy is a single-process layer split over visible GPUs
(deployment modeling_llama.py:2428-2453). TPU-native replacement: each host
runs one process, ``jax.distributed.initialize`` assembles the global
runtime, and the SAME (dp, tp) GSPMD mesh from parallel/mesh.py simply
spans all hosts' devices — data parallelism rides DCN (cheap: per-step
all-reduce of nothing during decode; logits stay host-local), tensor
parallelism stays inside each host's ICI domain.

Launch recipe (N processes, one per host):

  KVQ_COORDINATOR=host0:8476 KVQ_NUM_PROCESSES=N KVQ_PROCESS_ID=i \
      python -m kvquant_tpu.cli.deploy ... --distributed

CPU smoke-test of the same path (what tests/test_multihost.py runs):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      KVQ_COORDINATOR=localhost:<port> KVQ_NUM_PROCESSES=2 KVQ_PROCESS_ID=i ...
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the multi-process JAX runtime from args or KVQ_* env vars.
    Returns True if distributed mode was initialized, False for the
    single-process fallback (no env/args present)."""
    coordinator = coordinator or os.environ.get("KVQ_COORDINATOR")
    if coordinator is None:
        return False
    num_processes = int(
        num_processes
        if num_processes is not None
        else os.environ.get("KVQ_NUM_PROCESSES", "1")
    )
    process_id = int(
        process_id
        if process_id is not None
        else os.environ.get("KVQ_PROCESS_ID", "0")
    )
    # CPU multi-process collectives need the gloo transport. NOTE: must not
    # touch the backend here (jax.default_backend() would initialize XLA
    # before jax.distributed.initialize) — inspect config/env only.
    platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if "cpu" in str(platforms):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_multihost_mesh(tp: int | None = None) -> Mesh:
    """Global (dp, tp) mesh over every process's devices: tp stays within a
    process (ICI domain), dp spans processes over DCN. With ``tp=None``,
    tp = devices-per-process (pure tensor parallel within host, data
    parallel across hosts)."""
    devs = jax.devices()  # globally ordered: process-major
    per_proc = len(devs) // jax.process_count()
    if tp is None:
        tp = per_proc
    assert per_proc % tp == 0, (per_proc, tp)
    dp = len(devs) // tp
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
