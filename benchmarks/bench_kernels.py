"""Kernel microbenchmarks — the per-kernel sweep surface mirroring the
reference's benchmarking/scripts/ suite (7 scripts), one flag-selected
section each:

  reference script                      here
  test_kernels_key.py                -> qk_fused sparse/dense
  test_kernels_value.py              -> pv_fused sparse
  test_kernel_baselines.py           -> fp16 matvec baselines
  test_kernel_benchmark_K_plus_rope  -> flash single-pass kernel (RoPE
                                        fused), nuq / int4 / channels /
                                        post-RoPE variants (--flash)
  test_kernels_key_packing.py        -> prefill_pack bulk packing (--pack)
  test_kernels_value_packing.py      -> append_token_flash one-token
                                        append (--pack)
  test_offload_topk.py               -> on-chip lax.top_k (the reference
                                        offloads topk to CPU on a side
                                        stream — GPU workaround) (--topk)

TPU measurement note: loops are scanned on device and timing fetches a
value, because dispatch round-trips through the remote tunnel dominate
and block_until_ready is optimistic (see bench.py). In-jit-created
caches are passed through jax.lax.optimization_barrier and the scan
carry so XLA cannot rematerialize them inside the timing loop (the
round-3 inflation artifact); absolute numbers are citable as of round 5.
NOTE: iterations here are INDEPENDENT (operands don't chain), so this
measures the overlapped/pipelined regime — benchmarks/
serial_kernel_bench.py measures the layer-serial regime real decode
runs in.

  python benchmarks/bench_kernels.py --ctx 32768 --bits 3 --flash --pack
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
    ap.add_argument("--bt", type=int, default=1024,
                    help="flash kernel token-block size")
    ap.add_argument("--flash", action="store_true",
                    help="single-pass flash kernel variants (nuq/int4/"
                         "channels/post-RoPE)")
    ap.add_argument("--pack", action="store_true",
                    help="prefill bulk packing + one-token append")
    ap.add_argument("--topk", action="store_true",
                    help="on-chip lax.top_k (reference CPU-offload "
                         "counterpart)")
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

    if args.flash:
        # the production single-pass kernel (dequant + RoPE + outliers +
        # online softmax + PV fused; reference counterpart is the fused
        # K+rope benchmark script) across storage/outlier modes. Caches are
        # created in-jit: content-independent, and int4 avals cannot cross
        # the remote-tunnel jit boundary.
        import functools

        from kvquant_tpu.cache import create_cache, deployed_from_quantizers
        from kvquant_tpu.ops.pallas.flash_decode import flash_decode
        from kvquant_tpu.quant.artifacts import (
            KQuantizer, VQuantizer, LayerQuantizers, QuantizerSet,
        )

        def make_dq(fbits, affine):
            flut = (np.linspace(-1, 1, 2 ** fbits, dtype=np.float32)
                    if affine else np.sort(nf_signposts(fbits)))
            u = (np.abs(rng.normal(size=Hkv * D)) * 2 + 1).astype(np.float32)
            qs = QuantizerSet(
                layers=[LayerQuantizers(
                    k=KQuantizer(upper=u, lower=(-0.9 * u).astype(np.float32),
                                 lut=flut.copy(),
                                 ressc=rng.random(Hkv * D).astype(np.float32)),
                    v=VQuantizer(lut=flut.copy()),
                )],
                bits=fbits, sparsity_threshold=0.99, cap_outliers=True,
                first_few_fp16=5,
            )
            return deployed_from_quantizers(qs, Hkv, D)

        from kvquant_tpu.ops.pallas.flash_serial import flash_serial_decode

        def flash_ms(fdcfg, dq):
            attn = (flash_serial_decode if fdcfg.kernel == "flash_serial"
                    else flash_decode)
            qq = jnp.asarray(
                rng.normal(size=(1, Hkv, G, D)).astype(np.float32)
            )
            pos = jnp.full((1,), Tc - 2, jnp.int32)

            @jax.jit
            def run(dq, qq, pos):
                # in-jit zeros are broadcast HLOs that XLA sinks INTO the
                # timing scan if merely closed over (NOTES_ROUND3
                # measurement artifact — a full write+read of the cache
                # per iteration inflated apparent bandwidth): barrier the
                # cache and thread it through the carry so it is
                # materialized exactly once
                c = jax.lax.optimization_barrier(create_cache(fdcfg, 1, 1))

                def body(carry, _):
                    acc, c = carry
                    o = attn(
                        qq, c.k_planes, c.v_planes, c.kv_out, dq.k_range,
                        dq.k_offset, c.v_scale, c.v_offset, c.k_sink,
                        c.v_sink, dq.k_lut_dec, dq.v_lut_dec,
                        jnp.int32(0), pos, fdcfg, mcfg,
                        block_tokens=args.bt, k_ressc=dq.k_ressc,
                    )
                    return (acc + o.reshape(-1)[0], c), None

                (out, _), _ = jax.lax.scan(
                    body, (0.0, c), None, length=args.iters
                )
                return out

            _ = float(run(dq, qq, pos))
            t0 = time.perf_counter()
            _ = float(run(dq, qq, pos))
            return (time.perf_counter() - t0) / args.iters * 1e3

        def mkd(**kw):
            kw.setdefault("kernel", "flash")
            kw.setdefault("head_group", 4)
            return DeployConfig.create(
                n_kv_heads=Hkv, d_head=D, max_len=args.ctx + 21, sink=5,
                **kw,
            )

        dq_nuq = make_dq(bits, affine=False)
        dq_int4 = make_dq(4, affine=True)
        results[f"flash_nuq{bits}_slots"] = flash_ms(
            mkd(bits=bits), dq_nuq)
        results[f"flash_nuq{bits}_kch"] = flash_ms(
            mkd(bits=bits, k_outliers="channels"), dq_nuq)
        results["flash_int4_postk_slots"] = flash_ms(
            mkd(bits=4, codes="int4", post_rope_k=True), dq_int4)
        results["flash_int4_postk_kch"] = flash_ms(
            mkd(bits=4, codes="int4", post_rope_k=True,
                k_outliers="channels"), dq_int4)
        # decomposition points: outliers fully off, and K-channels with the
        # per-token V slots disabled (cap 0) — the deltas isolate the V-slot
        # vs K-channel kernel cost
        results["flash_int4_postk_nosparse"] = flash_ms(
            mkd(bits=4, codes="int4", post_rope_k=True,
                include_sparse=False), dq_int4)
        results["flash_int4_postk_kch_cap0"] = flash_ms(
            mkd(bits=4, codes="int4", post_rope_k=True,
                k_outliers="channels", cap_per_side=0), dq_int4)
        # exact-density 2-bit pair container (the 512K-1M speed mode)
        dq_2 = make_dq(2, affine=True)
        results["flash_int4x2_postk_kch_cap0"] = flash_ms(
            mkd(bits=2, codes="int4x2", post_rope_k=True,
                k_outliers="channels", cap_per_side=0), dq_2)
        results["flash_int4x2_postk_slots"] = flash_ms(
            mkd(bits=2, codes="int4x2", post_rope_k=True), dq_2)
        # the manual-DMA serial kernel (headline decode config, round 5)
        results["serial_int4_postk_kch_cap0"] = flash_ms(
            mkd(bits=4, codes="int4", post_rope_k=True,
                k_outliers="channels", cap_per_side=0,
                kernel="flash_serial"), dq_int4)
        results["serial_int4x2_postk_kch_cap0"] = flash_ms(
            mkd(bits=2, codes="int4x2", post_rope_k=True,
                k_outliers="channels", cap_per_side=0,
                kernel="flash_serial"), dq_2)

    if args.pack:
        # bulk prompt packing + one-token append (reference counterparts:
        # the key/value packing benchmark scripts)
        from kvquant_tpu.cache import create_cache, deployed_from_quantizers

        pk_dcfg = DeployConfig.create(
            bits=bits, n_kv_heads=Hkv, d_head=D, max_len=args.ctx + 21,
            sink=5, head_group=4,
        )
        from kvquant_tpu.quant.artifacts import (
            KQuantizer, VQuantizer, LayerQuantizers, QuantizerSet,
        )
        u = (np.abs(rng.normal(size=Hkv * D)) * 2 + 1).astype(np.float32)
        qs = QuantizerSet(
            layers=[LayerQuantizers(
                k=KQuantizer(upper=u, lower=(-0.9 * u).astype(np.float32),
                             lut=np.sort(nf_signposts(bits))),
                v=VQuantizer(lut=np.sort(nf_signposts(bits))),
            )],
            bits=bits, sparsity_threshold=0.99, cap_outliers=True,
            first_few_fp16=5,
        )
        pdq = deployed_from_quantizers(qs, Hkv, D)
        Tpk = min(4096, pk_dcfg.cache_tokens)
        kv_new = jnp.asarray(
            rng.normal(size=(2, 1, Tpk + 5, Hkv * D)).astype(np.float32)
        )

        @jax.jit
        def pack_run(pdq, kv_new):
            c = create_cache(pk_dcfg, 1, 1).layer(0)
            c2 = deployed.prefill_pack(
                c, pdq.layer(0), pk_dcfg, mcfg, kv_new[0], kv_new[1]
            )
            return c2.v_scale.sum()

        _ = float(pack_run(pdq, kv_new))
        t0 = time.perf_counter()
        _ = float(pack_run(pdq, kv_new))
        results[f"prefill_pack_{Tpk}tok"] = (time.perf_counter() - t0) * 1e3

        tok_kv = jnp.asarray(
            rng.normal(size=(2, 1, Hkv * D)).astype(np.float32)
        )

        @jax.jit
        def append_run(pdq, tok_kv):
            c = create_cache(pk_dcfg, 1, 1)
            # barrier + carry: see flash_ms (in-jit zeros must not be
            # rematerialized inside the timing scan)
            arrs = jax.lax.optimization_barrier({
                f: getattr(c, f)
                for f in ("k_planes", "v_planes", "kv_out", "v_scale",
                          "v_offset", "k_sink", "v_sink")
            })

            def body(carry, i):
                acc, arrs = carry
                got = deployed.append_token_flash(
                    arrs, pdq.layer(0), pk_dcfg, mcfg, tok_kv[0], tok_kv[1],
                    jnp.full((1,), 100, jnp.int32), jnp.int32(0),
                )
                return (acc + got["v_scale"].reshape(-1)[0], arrs), None

            (out, _), _ = jax.lax.scan(
                body, (0.0, arrs), None, length=args.iters
            )
            return out

        _ = float(append_run(pdq, tok_kv))
        t0 = time.perf_counter()
        _ = float(append_run(pdq, tok_kv))
        results["append_token"] = (
            (time.perf_counter() - t0) / args.iters * 1e3
        )

    if args.topk:
        # reference test_offload_topk.py: decode-time top-k offloaded to
        # CPU over a side stream. On TPU lax.top_k runs on the VPU.
        logits = jnp.asarray(rng.normal(size=(1, 32000)).astype(np.float32))
        results["lax_top_k_50"] = timed_loop(
            lambda l: jax.lax.top_k(l, 50)[0], logits, iters=args.iters
        )

    planes_mb = planes.size * 4 / 1e6
    fp16_mb = kf.size * 2 / 1e6
    print(f"ctx={args.ctx} Tc={Tc} bits={bits} Hkv={Hkv} D={D} G={G} J={J}")
    print(f"packed cache {planes_mb:.1f} MB/side, fp16 {fp16_mb:.1f} MB/side")
    for name, ms in results.items():
        print(f"  {name:24s} {ms:8.3f} ms")


if __name__ == "__main__":
    main()
