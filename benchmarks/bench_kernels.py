"""Kernel microbenchmarks: fused QK / PV Pallas kernels vs the XLA reference
datapath vs fp16 matvec baselines, on real or synthetic activations.

Reference: benchmarking/scripts/test_kernels_key.py / test_kernels_value.py
/ test_kernel_baselines.py / test_kernel_benchmark_K_plus_rope.py — per-
kernel profiler runs against fp16 baselines. TPU measurement note: the
decode loop is scanned on device and timing fetches a value, because
dispatch round-trips through the remote tunnel dominate and
block_until_ready is optimistic (see bench.py).

  python benchmarks/bench_kernels.py --ctx 32768 --bits 3 [--acts acts.npz]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from kvquant_tpu.cache import DeployConfig
from kvquant_tpu.models.config import ModelConfig
from kvquant_tpu.ops.pallas import qk_fused, pv_fused
from kvquant_tpu.ops import deployed
from kvquant_tpu.ops.packing import pack_codes
from kvquant_tpu.quant.nuq import nf_signposts


def timed_loop(fn, *args, iters=50):
    @jax.jit
    def run(*a):
        def body(c, _):
            return c + fn(*a).reshape(-1)[0], None
        out, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return out

    _ = float(run(*args))
    t0 = time.perf_counter()
    _ = float(run(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ctx", type=int, default=32768)
    ap.add_argument("--bits", type=int, default=3)
    ap.add_argument("--kv-heads", type=int, default=16)
    ap.add_argument("--d-head", type=int, default=128)
    ap.add_argument("--group", type=int, default=1, help="q heads per kv head")
    ap.add_argument("--acts", default=None,
                    help="npz from capture_activations.py (else synthetic)")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args(argv)

    Hkv, D, G, bits = args.kv_heads, args.d_head, args.group, args.bits
    mcfg = ModelConfig(n_kv_heads=Hkv, d_head=D, n_heads=Hkv * G)
    dcfg = DeployConfig.create(
        bits=bits, n_kv_heads=Hkv, d_head=D, max_len=args.ctx + 21, sink=5,
    )
    Tc = dcfg.cache_tokens
    J = dcfg.n_slots
    rng = np.random.default_rng(0)

    if args.acts:
        z = np.load(args.acts)
        k = z["k_acts"][0].reshape(-1, Hkv * D)  # layer 0
        reps = int(np.ceil(Tc / k.shape[0]))
        k = np.tile(k, (reps, 1))[:Tc]
        codes = np.clip(
            ((k - k.mean(0)) / (3 * k.std(0) + 1e-6) + 1) * (2**bits - 1) / 2,
            0, 2**bits - 1,
        ).astype(np.int32).reshape(Tc, Hkv, D).transpose(1, 0, 2)
    else:
        codes = rng.integers(0, 2**bits, size=(Hkv, Tc, D)).astype(np.int32)

    planes = pack_codes(jnp.asarray(codes), bits)
    lut = jnp.asarray(np.sort(nf_signposts(bits)))
    k_range = jnp.ones((Hkv, D), jnp.float32)
    k_offset = jnp.zeros((Hkv, D), jnp.float32)
    from kvquant_tpu.ops.packing import encode_outlier_words

    q = jnp.asarray(rng.normal(size=(Hkv, G, D)).astype(np.float32))
    kv_out = encode_outlier_words(
        jnp.asarray(rng.normal(size=(Hkv, J, Tc)).astype(np.float32) * 0.1),
        jnp.asarray(rng.integers(0, D, size=(Hkv, J, Tc)).astype(np.int32)),
    )
    probs = jnp.asarray(np.abs(rng.normal(size=(Hkv, G, Tc))).astype(np.float32))
    vs = jnp.ones((Tc,), jnp.float32)
    vo = jnp.zeros((Tc,), jnp.float32)

    # fp16 baselines: plain matvec over a bf16 cache of the same logical size
    kf = jnp.asarray(rng.normal(size=(Hkv, Tc, D)).astype(np.float32)).astype(jnp.bfloat16)

    results = {}
    results["qk_fused(sparse)"] = timed_loop(
        lambda: qk_fused(q, planes, kv_out, k_range, k_offset, lut, dcfg, mcfg),
        iters=args.iters)
    results["qk_fused(dense)"] = timed_loop(
        lambda: qk_fused(q, planes, None, k_range, k_offset, lut, dcfg, mcfg),
        iters=args.iters)
    results["pv_fused(sparse)"] = timed_loop(
        lambda: pv_fused(probs, planes, vs, vo, kv_out, lut, dcfg),
        iters=args.iters)
    results["fp16_qk_matvec"] = timed_loop(
        lambda: jnp.einsum("hgd,htd->hgt", q, kf.astype(jnp.float32)),
        iters=args.iters)
    results["fp16_pv_matvec"] = timed_loop(
        lambda: jnp.einsum("hgt,htd->hgd", probs, kf.astype(jnp.float32)),
        iters=args.iters)

    planes_mb = planes.size * 4 / 1e6
    fp16_mb = kf.size * 2 / 1e6
    print(f"ctx={args.ctx} Tc={Tc} bits={bits} Hkv={Hkv} D={D} G={G} J={J}")
    print(f"packed cache {planes_mb:.1f} MB/side, fp16 {fp16_mb:.1f} MB/side")
    for name, ms in results.items():
        print(f"  {name:18s} {ms:8.3f} ms")


if __name__ == "__main__":
    main()
