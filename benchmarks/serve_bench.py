"""Paged continuous-batching serving throughput on the real chip.

The reference has no serving stack at all (deployment is batch-1 CLI,
deployment/llama.py); serving is this framework's north-star extension.
This bench runs a mixed-length workload (random prompt lengths / budgets)
through PagedServer on the bench-model shape and reports aggregate decode
throughput, with and without device-side decode bursts (run() scans up to
``--burst`` greedy steps per host round trip — one dispatch through the
remote tunnel costs ~66 ms, which otherwise dominates single-digit-ms
decode steps).

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/serve_bench.py \
      [--slots 4] [--requests 12] [--new 128] [--burst 32] [--bits 3]

Prints one JSON line per configuration.
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
    import jax.numpy as jnp  # noqa: F401 (backend init)

    from kvquant_tpu import serve
    from kvquant_tpu.cache import DeployConfig, deployed_from_quantizers
    from kvquant_tpu.models.config import ModelConfig
    from kvquant_tpu.models.llama import init_params
    from kvquant_tpu.paged import PagedServer, paged_pool_bytes
    from kvquant_tpu.quant.artifacts import (
        KQuantizer, VQuantizer, LayerQuantizers, QuantizerSet,
    )
    from kvquant_tpu.quant.nuq import nf_signposts
    import jax

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--requests", type=int, default=12)
    ap.add_argument("--prompt-min", type=int, default=512)
    ap.add_argument("--prompt-max", type=int, default=3072)
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--bits", type=int, default=3)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--burst", default="0,32",
                    help="comma list of burst caps to measure (0 = per-step)")
    ap.add_argument("--page-tokens", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    # bench-model shape (same as bench.py); nuq codes — int4 arrays cannot
    # cross the jit boundary through the axon tunnel, and the server's pool
    # crosses it every dispatch
    cfg = ModelConfig(
        vocab_size=32000, d_model=2048, n_layers=args.layers, n_heads=16,
        n_kv_heads=16, d_head=128, d_ff=5632, max_seq_len=65536,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(args.seed)
    lut = nf_signposts(args.bits)
    layers = []
    for _ in range(cfg.n_layers):
        u = (np.abs(rng.normal(size=cfg.kv_hidden)) * 2 + 1).astype(np.float32)
        layers.append(LayerQuantizers(
            k=KQuantizer(upper=u, lower=(-u * 0.9).astype(np.float32),
                         lut=lut.copy()),
            v=VQuantizer(lut=lut.copy()),
        ))
    qs = QuantizerSet(layers=layers, bits=args.bits, sparsity_threshold=0.99,
                      cap_outliers=True, first_few_fp16=5)

    maxlen = args.prompt_max + args.new + 64
    dcfg = DeployConfig.create(
        bits=args.bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
        max_len=maxlen, sink=5, kernel="flash", head_group=4,
        post_rope_k=True, k_outliers="channels", n_kc=4, cap_per_side=0,
    )
    dcfg = dataclasses.replace(dcfg, page_tokens=args.page_tokens)
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)

    mp = max(1, -(-(maxlen - dcfg.sink) // args.page_tokens))
    n_pages = args.slots * mp + 4

    def workload():
        r = np.random.default_rng(args.seed)
        return [
            serve.Request(
                rid=i,
                prompt=r.integers(
                    0, cfg.vocab_size,
                    size=int(r.integers(args.prompt_min, args.prompt_max)),
                ).astype(np.int32),
                max_new_tokens=args.new,
            )
            for i in range(args.requests)
        ]

    pb = paged_pool_bytes(dcfg, cfg.n_layers, n_pages, args.slots)
    print(f"[serve_bench] pool {n_pages} pages x {args.page_tokens} tok = "
          f"{pb / 2**30:.2f} GiB "
          f"(slot-pool equivalent would reserve {args.slots}x{maxlen} tok)",
          file=sys.stderr, flush=True)

    baseline_tps = None
    for burst in [int(b) for b in args.burst.split(",")]:
        srv = PagedServer(
            params, cfg, dcfg, dq, n_pages=n_pages, n_slots=args.slots,
            max_pages_per_slot=mp, admit_mode="chunked", burst=burst,
        )
        reqs = workload()
        t0 = time.perf_counter()
        done = srv.run(reqs)
        dt = time.perf_counter() - t0
        total = sum(len(c.tokens) for c in done.values())
        assert len(done) == args.requests
        assert all(len(c.tokens) == r.max_new_tokens
                   for r, c in zip(reqs, [done[r.rid] for r in reqs]))
        tps = total / dt
        if burst == 0:
            baseline_tps = tps
        print(json.dumps({
            "metric": f"paged_serve_toks_per_s_burst{burst}",
            "value": round(tps, 2), "unit": "tok/s",
            # null until a burst=0 baseline has been measured in this run
            "vs_baseline": round(tps / baseline_tps, 3) if baseline_tps
            else None,
            "requests": args.requests, "slots": args.slots,
            "new_tokens_total": total, "wall_s": round(dt, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
