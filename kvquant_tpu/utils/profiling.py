"""Profiling helpers.

The reference profiles with torch.profiler key_averages tables
(deployment/llama.py:205-214). On this TPU setup wall-clock microprofiling
is unreliable (remote execution, optimistic block_until_ready), so the
primary tools are:

  - traffic_report(fn, *args): compile and print XLA's own cost analysis
    (bytes accessed / flops / transcendentals) — how the +460MB/step
    outlier-padding regression was found.
  - device_timed(fn, *args, iters): on-device lax.scan loop + value fetch,
    the only wall-clock method that survives the remote tunnel.
  - trace(path): jax.profiler trace context. VERIFIED working through the
    axon remote-execution tunnel (device-side xplane/trace.json.gz with
    per-op durations) — this is how the batched-append regression was
    found: vmapped per-b dynamic_update_slice appends showed up as
    copy/copy_bitcast_fusion ops copying the full int4 plane arrays every
    layer (~14.6 ms/layer at B=4/32K). Workflow: trace a jitted loop, then
    sum "X"-phase event durations per op name on the /device:TPU pid.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def cost_analysis(fn, *args):
    """Dict of XLA cost analysis for jit(fn)(*args)."""
    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return dict(ca)


def traffic_report(fn, *args, label: str = "fn"):
    ca = cost_analysis(fn, *args)
    b = ca.get("bytes accessed", 0.0)
    f = ca.get("flops", 0.0)
    t = ca.get("transcendentals", 0.0)
    print(f"[{label}] bytes={b/1e6:.1f}MB flops={f/1e6:.1f}M "
          f"transcendentals={t/1e6:.1f}M")
    return ca


def device_timed(fn, *args, iters: int = 20):
    """Median-free simple wall clock of ``iters`` on-device iterations of
    fn(*args) (fn must return an array). Returns seconds per iteration."""

    @jax.jit
    def run(*a):
        def body(c, _):
            return c + fn(*a).reshape(-1)[0].astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return out

    _ = float(run(*args))  # compile + warm
    t0 = time.perf_counter()
    _ = float(run(*args))  # value fetch forces completion
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(path: str):
    """jax.profiler trace context; no-op fallback if unsupported."""
    try:
        jax.profiler.start_trace(path)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
