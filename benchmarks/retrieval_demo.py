"""REAL retrieval accuracy at long context through the quantized cache.

The toy-bigram needle grid (benchmarks/needle_demo.py) can only measure
fp16 PARITY — the bigram model has no retrieval ability. This demo runs
the (ctx x depth) grid on the INDUCTION checkpoint
(kvquant_tpu/utils/induction.py: trained segment-copy retrieval with
position-jump length generalization to 128K), so each cell reports
retrieval ACCURACY — exact greedy emission of the planted segment's
continuation tokens from its 16-token prefix query (chance (1/500)^2) —
for BOTH the quantized engine and the fp16 engine. The deployment-relevant
number is the quant-vs-fp16 accuracy delta: the reference's own needle
claim (lwm/README.md:5-9, figs/haystack.png) is that KVQuant preserves
retrieval; here that claim is measured with a model that actually
retrieves.

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/retrieval_demo.py \
      [--ctx 16384,65536] [--depths 0,50,100] [--trials 2] [--bits 3]

Writes benchmarks/retrieval_results.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def get_quantizers(bits: int, params, cfg, log, sparsity=0.95,
                   cal_len=4096):
    """Load or fit (and save) quantizers calibrated on the induction
    model's own activations — same pipeline as cli/calibrate.py.

    Calibration prompts are LONG eval-style haystacks (build_copy_prompt
    at ``cal_len``), not short training batches: K/V activation ranges
    grow with real context depth, and ranges fit on 512-token samples
    CLIP at 16K+ — measured as quant retrieval degrading with ctx while
    fp16 improved (NOTES_ROUND5)."""
    from kvquant_tpu.quant.artifacts import load_quantizers, save_quantizers
    from kvquant_tpu.quant.calibration import (
        collect_kv_activations, fit_quantizers,
    )
    from kvquant_tpu.utils.induction import build_copy_prompt
    import numpy as np

    path = (f"artifacts/induction_quantizers_{bits}bit_s{sparsity}"
            f"_c{cal_len}.npz")
    if os.path.exists(path):
        return load_quantizers(path)
    log(f"calibrating {bits}-bit quantizers on induction activations "
        f"(sparsity {sparsity}, cal_len {cal_len}) ...")
    prompts = np.stack([
        build_retrieval_cal(cal_len, s) for s in range(4)
    ])
    k_acts, v_acts = collect_kv_activations(params, cfg, [prompts])
    qs = fit_quantizers(
        k_acts, v_acts, bits=bits, sparsity_threshold=sparsity,
        cap_outliers=True, first_few_fp16=5, sample_seqlen=cal_len,
        kmeans_iters=20,
    )
    save_quantizers(path, qs)
    return qs


def build_retrieval_cal(cal_len, seed):
    from kvquant_tpu.utils.induction import build_copy_prompt

    ids, _ = build_copy_prompt(cal_len, (seed % 4) / 4.0, seed=seed)
    return ids


def main():
    import jax
    import jax.numpy as jnp

    from kvquant_tpu import engine, baseline_fp16
    from kvquant_tpu.cache import (
        DeployConfig, create_cache, deployed_from_quantizers,
    )
    from kvquant_tpu.utils.induction import (
        IND_CFG, VL, build_copy_prompt, cached_induction_model,
    )

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ctx", default="16384,65536")
    ap.add_argument("--depths", default="0,50,100")
    ap.add_argument("--depth-tokens", action="store_true",
                    help="interpret --depths as ABSOLUTE source offsets in "
                         "tokens instead of percent of the haystack (the "
                         "trained checkpoint's source-side depth "
                         "generalization bound is ~T/2 real tokens — see "
                         "NOTES_ROUND5; the retrieval DISTANCE is still "
                         "ctx-long since the query sits at the end)")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--bits", type=int, default=3)
    ap.add_argument("--sparsity", type=float, default=0.95,
                    help="outlier threshold. The REFERENCE's 1%% is ~40 of "
                         "4096 channels on a 7B model; this model has 128 "
                         "KV channels, so 5%% (~6 channels) is the "
                         "scale-equivalent outlier budget")
    ap.add_argument("--kernel", default="flash", choices=["flash", "xla"])
    ap.add_argument("--dot-f32", action="store_true",
                    help="f32 score/PV contractions in the deployed kernels")
    ap.add_argument("--out", default="benchmarks/retrieval_results.json")
    args = ap.parse_args()

    def log(m):
        print(f"[retrieval] {m}", file=sys.stderr, flush=True)

    ctxs = [int(c) for c in args.ctx.split(",")]
    depths = [float(d) for d in args.depths.split(",")]
    max_ctx = max(ctxs)

    params, loss = cached_induction_model(log=log)
    log(f"induction checkpoint loaded (train masked loss {loss:.3f})")
    cfg = dataclasses.replace(IND_CFG, max_seq_len=max_ctx + 64)
    qs = get_quantizers(args.bits, params, cfg, log, sparsity=args.sparsity)
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)
    dcfg = DeployConfig.create(
        bits=qs.bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
        max_len=max_ctx + VL + 8, sink=qs.first_few_fp16,
        kernel=args.kernel, head_group=4, dot_bf16=not args.dot_f32,
        # MUST match the quantizers' calibration threshold: the deployed
        # V-outlier budget (v_range_exclude) derives from this
        sparsity_threshold=args.sparsity,
    )

    @jax.jit
    def run_quant(params, dq, prompt):
        T0 = prompt.shape[1]
        c = create_cache(dcfg, cfg.n_layers, 1)
        c, lg = engine.prefill_quantized(
            params, cfg, dcfg, dq, c, prompt, chunk=128)

        def body(carry, i):
            c, t = carry
            c, lg = engine.decode_step(params, cfg, dcfg, dq, c, t, T0 + i)
            return (c, jnp.argmax(lg, -1).astype(jnp.int32)), t

        t0tok = jnp.argmax(lg, -1).astype(jnp.int32)
        (_, _), toks = jax.lax.scan(body, (c, t0tok), jnp.arange(VL))
        return toks[:, 0]

    @jax.jit
    def run_fp16(params, prompt):
        T0 = prompt.shape[1]
        fc = baseline_fp16.create_fp16_cache(cfg, T0 + VL + 2, 1)
        fc, lg = baseline_fp16.prefill(params, cfg, fc, prompt,
                                       attn_chunk=512)

        def body(carry, i):
            fc, t = carry
            fc, lg = baseline_fp16.decode_step(params, cfg, fc, t, T0 + i)
            return (fc, jnp.argmax(lg, -1).astype(jnp.int32)), t

        t0tok = jnp.argmax(lg, -1).astype(jnp.int32)
        (_, _), toks = jax.lax.scan(body, (fc, t0tok), jnp.arange(VL))
        return toks[:, 0]

    results = []
    warmed = set()
    for ctx in ctxs:
        for depth in depths:
            nq = nf = 0
            sum_q = sum_f = 0.0
            for trial in range(args.trials):
                if args.depth_tokens:
                    frac = min(depth / max(ctx - 16 - 18, 1), 1.0)
                else:
                    frac = depth / 100.0
                ids, answer = build_copy_prompt(
                    ctx, frac, seed=ctx + int(depth) * 7 + trial)
                prompt = jnp.asarray(ids[None], jnp.int32)
                if ctx not in warmed:
                    # one untimed call per prompt shape so the first timed
                    # cell doesn't carry JIT compilation
                    log(f"warm-up compile for ctx={ctx} ...")
                    np.asarray(run_quant(params, dq, prompt))
                    np.asarray(run_fp16(params, prompt))
                    warmed.add(ctx)
                t0 = time.perf_counter()
                tq = np.asarray(run_quant(params, dq, prompt))
                sum_q += time.perf_counter() - t0
                t0 = time.perf_counter()
                tf = np.asarray(run_fp16(params, prompt))
                sum_f += time.perf_counter() - t0
                nq += bool((tq == answer).all())
                nf += bool((tf == answer).all())
            dt_q = sum_q / args.trials
            dt_f = sum_f / args.trials
            row = {
                "ctx": ctx, "depth": depth, "trials": args.trials,
                "quant_correct": nq, "fp16_correct": nf,
                "quant_s": round(dt_q, 1), "fp16_s": round(dt_f, 1),
            }
            results.append(row)
            log(f"ctx={ctx:6d} depth={depth:5.1f} quant {nq}/{args.trials} "
                f"fp16 {nf}/{args.trials} "
                f"(mean/trial: quant {dt_q:.1f}s, fp16 {dt_f:.1f}s)")
            with open(args.out, "w") as fh:
                json.dump(results, fh, indent=1)

    tot = args.trials * len(results)
    print(json.dumps({
        "metric": "retrieval_accuracy",
        "quant": sum(r["quant_correct"] for r in results) / tot,
        "fp16": sum(r["fp16_correct"] for r in results) / tot,
        "cells": len(results), "trials_per_cell": args.trials,
        "bits": args.bits,
    }))


if __name__ == "__main__":
    main()
