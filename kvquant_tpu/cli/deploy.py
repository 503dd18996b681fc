"""Deployed-inference benchmark + correctness check CLI (reference
deployment/llama.py: token-by-token benchmark with median latency, peak
memory, and --check online perplexity through the real packed-cache
datapath).

  python -m kvquant_tpu.cli.deploy --quantizers q.npz --benchmark 64 \
      --check --kernel pallas [--model hf_dir]
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from . import common
from .. import engine
from ..cache import DeployConfig, create_cache, cache_bytes, deployed_from_quantizers
from ..evals.ppl import perplexity
from ..models.llama import simquant_from_quantizers
from ..quant.artifacts import load_quantizers


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(ap)
    common.add_storage_args(ap)
    common.add_data_args(ap)
    common.add_parallel_args(ap)
    ap.add_argument("--quantizers", required=True)
    ap.add_argument("--kernel", default="flash",
                    choices=["flash", "flash_serial", "pallas", "xla"])
    ap.add_argument("--benchmark", type=int, default=64,
                    help="decode steps to time")
    ap.add_argument("--prefill", type=int, default=0,
                    help="prompt tokens to prefill before timing")
    ap.add_argument("--maxlen", type=int, default=None,
                    help="cache capacity (default prefill+benchmark+sink)")
    ap.add_argument("--check", action="store_true",
                    help="also compute deployed ppl vs simulated ppl")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the timed decode "
                         "loop into DIR (xprof/tensorboard format) and "
                         "print XLA cost analysis — the reference's "
                         "torch.profiler surface, deployment/llama.py:"
                         "205-214")
    args = ap.parse_args(argv)

    mesh = common.setup_parallel(args)  # before any other JAX use
    params, cfg = common.load_model(args)
    qs = load_quantizers(args.quantizers)
    maxlen = args.maxlen or (args.prefill + args.benchmark + 32)
    dcfg = DeployConfig.create(
        bits=qs.bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
        max_len=maxlen, sink=qs.first_few_fp16,
        head_group=getattr(args, 'head_group', 4),
        codes=getattr(args, 'codes', 'nuq'),
        post_rope_k=(getattr(args, 'post_rope_k', False)
                     or bool(qs.meta.get('post_rope_k', False))),
        k_outliers=getattr(args, 'k_outliers', 'slots'),
        n_kc=getattr(args, 'n_kc', 4),
        sparsity_threshold=qs.sparsity_threshold, kernel=args.kernel,
    )
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)

    acct = cache_bytes(dcfg, cfg.n_layers, 1)
    print(f"cache: {acct['total']/2**20:.1f} MiB "
          f"({acct['ratio']:.2f}x smaller than fp16)")

    _, test = common.load_data(args, cfg)
    tokens = jnp.asarray(test[:1, : max(args.prefill + args.benchmark, 16)])

    if args.check:
        sq = simquant_from_quantizers(qs, n_kv_heads=cfg.n_kv_heads,
                                      head_group=dcfg.head_group,
                                      k_outliers=dcfg.k_outliers,
                                      n_kc=dcfg.n_kc)
        sim = perplexity(params, cfg, tokens, simquant=sq)
        dep = engine.deployed_ppl(params, cfg, dcfg, dq, tokens,
                                  prefill_tokens=args.prefill)
        print(f"check: simulated ppl {sim:.4f}  deployed ppl {dep:.4f}")

    # timed decode (loop on device; see bench.py for why)
    steps = args.benchmark
    t0 = max(args.prefill, 1)
    cache = create_cache(dcfg, cfg.n_layers, 1)
    if mesh is not None:
        from ..parallel import shardings

        params = shardings.shard_params(mesh, params)
        dq = shardings.shard_quant(mesh, dq)
        cache = shardings.shard_cache(mesh, cache)
        print(f"mesh: {dict(mesh.shape)} over {len(mesh.devices.flat)} "
              f"devices / {jax.process_count()} process(es)")

    @jax.jit
    def decode_loop(params, dq, cache, tok):
        def body(carry, i):
            c, tok = carry
            c, logits = engine.decode_step(params, cfg, dcfg, dq, c, tok, i)
            return (c, jnp.argmax(logits, -1).astype(jnp.int32)), logits[0, 0]
        (_, _), outs = jax.lax.scan(
            body, (cache, tok), t0 + jnp.arange(steps, dtype=jnp.int32)
        )
        return outs

    if args.prefill > dcfg.sink:
        cache, logits = jax.jit(
            lambda p, d, c, t: engine.prefill(p, cfg, dcfg, d, c, t)
        )(params, dq, cache, tokens[:, : args.prefill])
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
    else:
        tok = tokens[:, 0]

    out = decode_loop(params, dq, cache, tok)
    _ = float(out.sum())
    if args.profile:
        from ..utils.profiling import trace

        comp = decode_loop.lower(params, dq, cache, tok).compile()
        ca = comp.cost_analysis()
        ca = (ca[0] if isinstance(ca, list) and ca else ca) or {}
        print(f"cost analysis ({steps} steps): "
              f"bytes={ca.get('bytes accessed', 0)/1e9:.2f}GB "
              f"flops={ca.get('flops', 0)/1e9:.2f}G "
              f"transcendentals={ca.get('transcendentals', 0)/1e6:.1f}M")
        with trace(args.profile):
            out = decode_loop(params, dq, cache, tok)
            _ = float(out.sum())
        print(f"trace written to {args.profile} (if supported by backend)")
    t = time.perf_counter()
    out = decode_loop(params, dq, cache, tok)
    _ = float(out.sum())
    dt = time.perf_counter() - t
    print(f"decode: {steps/dt:.2f} tok/s "
          f"({dt/steps*1e3:.2f} ms/token median-ish, kernel={args.kernel})")


if __name__ == "__main__":
    main()
