"""Needle-in-haystack at 64K on the real chip: fp16-vs-quantized PARITY.

The reference's haystack claim is retrieval *parity with the fp16 base
model* at long context (lwm/README.md:5-9, figs/haystack.png) — not an
absolute accuracy number. With zero egress there is no long-context
checkpoint to score absolute retrieval on, so this demo measures exactly
the parity claim on the trained toy checkpoint: for every (ctx, depth)
cell, prefill the full haystack prompt through BOTH engines on the TPU and
compare the greedy continuations token-by-token. A 64K-token quantized
cache that changes ZERO greedy outputs vs the fp16 cache is the
deployment-relevant needle result available in this environment.

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/needle_demo.py \
      [--ctx 16384,65536] [--depths 0,50,100] [--new 8] [--bits 3]

Writes benchmarks/needle64k_results.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from kvquant_tpu import engine, baseline_fp16
    from kvquant_tpu.cache import DeployConfig, deployed_from_quantizers
    from kvquant_tpu.evals.needle import build_needle_prompt, ANSWERS
    from kvquant_tpu.quant.artifacts import load_quantizers
    from kvquant_tpu.utils.toymodel import cached_toy_model
    from kvquant_tpu.utils.toytokenizer import WordTokenizer

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ctx", default="16384,65536")
    ap.add_argument("--depths", default="0,50,100")
    ap.add_argument("--new", type=int, default=8)
    ap.add_argument("--bits", type=int, default=3)
    ap.add_argument("--out", default="benchmarks/needle64k_results.json")
    args = ap.parse_args()

    ctxs = [int(c) for c in args.ctx.split(",")]
    depths = [float(d) for d in args.depths.split(",")]
    max_ctx = max(ctxs)

    params, _, _ = cached_toy_model()
    qs = load_quantizers(f"artifacts/toy_quantizers_{args.bits}bit.npz")
    from kvquant_tpu.utils.toymodel import TOY_CFG
    cfg = dataclasses.replace(TOY_CFG, max_seq_len=max_ctx + 128)
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)
    dcfg = DeployConfig.create(
        bits=qs.bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
        max_len=max_ctx + args.new + 8, sink=qs.first_few_fp16,
        kernel="flash", head_group=4,
    )
    tok = WordTokenizer()
    gcfg = engine.GenerateConfig(max_new_tokens=args.new)

    results = []
    for ctx in ctxs:
        for depth in depths:
            answer = ANSWERS[(ctx + int(depth)) % len(ANSWERS)]
            ids = build_needle_prompt(tok, ctx, depth, answer)
            assert ids.max() < cfg.vocab_size, "toy vocab overflow"
            # pad the FRONT with extra filler to exactly ctx tokens so all
            # cells of a context length share one compiled program (the
            # builder's sentence packing varies the length by a few tokens
            # per depth/answer, which would recompile every cell)
            deficit = ctx - ids.shape[0]
            if deficit > 0:
                from kvquant_tpu.evals.needle import haystack_sentence
                fill, i = [], 10_000
                while len(fill) < deficit:
                    fill.extend(tok.encode(haystack_sentence(i)))
                    i += 1
                ids = np.concatenate(
                    [np.asarray(fill[:deficit], np.int32), ids])
            prompt = jnp.asarray(ids[None], jnp.int32)
            T0 = int(ids.shape[0])

            # quantized engine: chunked quantized prefill + scanned greedy
            # decode (one device dispatch — per-step host dispatch costs
            # seconds through the remote tunnel)
            from kvquant_tpu.cache import create_cache

            @jax.jit
            def run_quant(params, dq, prompt):
                c = create_cache(dcfg, cfg.n_layers, 1)
                # chunk=128: the folded kernel's per-head (Q, BT) stack
                # temporaries scale with Q = G*(chunk+sink); at G=2 (toy
                # GQA) chunk=256 exceeds the 16M scoped-vmem limit
                c, lg = engine.prefill_quantized(
                    params, cfg, dcfg, dq, c, prompt, chunk=128)
                def body(carry, i):
                    c, t = carry
                    c, lg = engine.decode_step(
                        params, cfg, dcfg, dq, c, t, T0 + i)
                    return (c, jnp.argmax(lg, -1).astype(jnp.int32)), t
                t0tok = jnp.argmax(lg, -1).astype(jnp.int32)
                (_, _), toks = jax.lax.scan(
                    body, (c, t0tok), jnp.arange(args.new))
                return lg, toks[:, 0]

            # prefill_quantized drives its own jit stages; calling it under
            # an outer jit is fine (it asserts static shapes only)
            t0 = time.perf_counter()
            lg_q, toks_q = run_quant(params, dq, prompt)
            toks_q = np.asarray(toks_q)
            lg_q = np.asarray(lg_q)
            tq = time.perf_counter() - t0

            # true fp16 engine: blockwise fp16 prefill + fp16-cache decode
            @jax.jit
            def run_fp16(params, prompt):
                fc = baseline_fp16.create_fp16_cache(
                    cfg, T0 + args.new + 2, 1)
                fc, lg = baseline_fp16.prefill(
                    params, cfg, fc, prompt, attn_chunk=512)
                def body(carry, i):
                    fc, t = carry
                    fc, lg = baseline_fp16.decode_step(
                        params, cfg, fc, t, T0 + i)
                    return (fc, jnp.argmax(lg, -1).astype(jnp.int32)), t
                t0tok = jnp.argmax(lg, -1).astype(jnp.int32)
                (_, _), toks = jax.lax.scan(
                    body, (fc, t0tok), jnp.arange(args.new))
                return lg, toks[:, 0]

            t0 = time.perf_counter()
            lg_f, toks_f = run_fp16(params, prompt)
            toks_f = np.asarray(toks_f)
            lg_f = np.asarray(lg_f)
            tf = time.perf_counter() - t0

            # parity metrics. Greedy trajectories diverge permanently at
            # the first argmax flip, and on this toy checkpoint the needle
            # text is OOD (near-uniform logits => near-ties), so the
            # honest signals are the prefill-logit agreement and how long
            # the trajectories stay identical — with a confident real
            # model these become exact-output parity.
            top1 = bool(np.argmax(lg_q[0]) == np.argmax(lg_f[0]))
            mae = float(np.abs(lg_q - lg_f).mean())
            mx = float(np.abs(lg_q - lg_f).max())
            div = int(np.argmax(toks_q != toks_f)) if (
                toks_q != toks_f).any() else args.new
            row = {
                "ctx": ctx, "depth": depth, "tokens": T0,
                "prefill_top1_agree": top1,
                "prefill_logit_mae": round(mae, 5),
                "prefill_logit_max": round(mx, 4),
                "greedy_agree_until": div, "of": args.new,
                "quant_out": tok.decode(toks_q.tolist()),
                "fp16_out": tok.decode(toks_f.tolist()),
                "quant_s": round(tq, 1), "fp16_s": round(tf, 1),
            }
            results.append(row)
            print(f"ctx={ctx:6d} depth={depth:5.1f} top1 "
                  f"{'OK' if top1 else 'X'} mae {mae:.4f} "
                  f"max {mx:.3f} greedy agrees {div}/{args.new} "
                  f"(quant {tq:.1f}s, fp16 {tf:.1f}s)", flush=True)
            with open(args.out, "w") as fh:
                json.dump(results, fh, indent=1)

    n_top1 = sum(r["prefill_top1_agree"] for r in results)
    print(json.dumps({
        "metric": "needle64k_fp16_parity", "cells": len(results),
        "prefill_top1_agree": n_top1,
        "mean_logit_mae": round(
            float(np.mean([r["prefill_logit_mae"] for r in results])), 5),
    }))


if __name__ == "__main__":
    main()
