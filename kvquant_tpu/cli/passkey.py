"""Passkey-retrieval evaluation CLI (reference quant/eval_passkey_simquant.py).

  python -m kvquant_tpu.cli.passkey --quantizers q.npz --ctx 2048,4096 \
      --trials 50 [--model hf_dir]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from . import common
from .. import engine
from ..cache import DeployConfig, deployed_from_quantizers
from ..evals.passkey import eval_passkey
from ..quant.artifacts import load_quantizers


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(ap)
    common.add_storage_args(ap)
    ap.add_argument("--quantizers", default=None,
                    help="omit for the fp16 baseline (simulated forward)")
    ap.add_argument("--kernel", default="pallas", choices=["flash", "flash_serial", "pallas", "xla"])
    ap.add_argument("--ctx", default="2048,4096",
                    help="comma-separated context lengths")
    ap.add_argument("--trials", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    params, cfg = common.load_model(args)
    tok = common.load_tokenizer(args)
    ctxs = [int(c) for c in args.ctx.split(",")]

    if args.quantizers:
        qs = load_quantizers(args.quantizers)
        dcfg = DeployConfig.create(
            bits=qs.bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
            max_len=max(ctxs) + 64, sink=qs.first_few_fp16,
            head_group=getattr(args, 'head_group', 4),
        codes=getattr(args, 'codes', 'nuq'),
        post_rope_k=(getattr(args, 'post_rope_k', False)
                     or bool(qs.meta.get('post_rope_k', False))),
        k_outliers=getattr(args, 'k_outliers', 'slots'),
        n_kc=getattr(args, 'n_kc', 4),
            kernel=args.kernel,
        )
        dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)

        def generate_fn(ids, max_new_tokens):
            out, _ = engine.generate(
                params, cfg, dcfg, dq, jnp.asarray(ids),
                engine.GenerateConfig(max_new_tokens=max_new_tokens),
            )
            return np.asarray(out)[0]
    else:
        from .. import baseline_fp16

        def generate_fn(ids, max_new_tokens):
            cache = baseline_fp16.create_fp16_cache(
                cfg, ids.shape[1] + max_new_tokens + 1, 1
            )
            cache, logits = baseline_fp16.prefill(
                params, cfg, cache, jnp.asarray(ids)
            )
            toks = []
            pos = ids.shape[1]
            for _ in range(max_new_tokens):
                t = jnp.argmax(logits, -1).astype(jnp.int32)
                toks.append(int(t[0]))
                cache, logits = baseline_fp16.decode_step(
                    params, cfg, cache, t, pos
                )
                pos += 1
            return np.asarray(toks)

    results = eval_passkey(
        generate_fn, tok, ctx_lengths=ctxs, n_trials=args.trials,
        seed=args.seed,
    )
    for r in results:
        print(f"ctx {r.ctx_tokens}: accuracy {r.accuracy:.2%}")


if __name__ == "__main__":
    main()
