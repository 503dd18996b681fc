"""Simulated-quantization perplexity evaluation CLI (reference
quant/llama_simquant.py eval path, :48-146 / :499-530).

  python -m kvquant_tpu.cli.eval_ppl --quantizers quantizers_4bit.npz \
      [--model hf_dir] [--dataset synthetic]
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from . import common
from ..evals.ppl import perplexity
from ..models.llama import simquant_from_quantizers
from ..quant.artifacts import load_quantizers


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(ap)
    common.add_storage_args(ap)
    common.add_data_args(ap)
    ap.add_argument("--quantizers", default=None,
                    help="npz artifact; omit for the fp16 baseline ppl")
    ap.add_argument("--v-mode", default="topk",
                    choices=["topk", "percentile"])
    ap.add_argument("--max-windows", type=int, default=8)
    ap.add_argument("--deployed", action="store_true",
                    help="also run the real packed-cache decode ppl "
                         "(the reference's --check oracle)")
    ap.add_argument("--kernel", default="pallas", choices=["flash", "flash_serial", "pallas", "xla"])
    args = ap.parse_args(argv)

    params, cfg = common.load_model(args)
    _, test = common.load_data(args, cfg)
    test = test[: args.max_windows]

    sq = None
    if args.quantizers:
        qs = load_quantizers(args.quantizers)
        sq = simquant_from_quantizers(
            qs, v_mode=args.v_mode, n_kv_heads=cfg.n_kv_heads,
            k_outliers=getattr(args, 'k_outliers', 'slots'),
            n_kc=getattr(args, 'n_kc', 4),
        )
        print(f"quantizers: {qs.bits}-bit, sparsity "
              f"{qs.sparsity_threshold}, sink {qs.first_few_fp16}")

    ppl = perplexity(params, cfg, jnp.asarray(test), simquant=sq)
    tag = "quantized" if sq else "fp16"
    print(f"{tag} ppl over {test.shape[0]}x{test.shape[1]} tokens: {ppl:.4f}")

    if args.deployed and args.quantizers:
        from .. import engine
        from ..cache import DeployConfig, deployed_from_quantizers

        qs = load_quantizers(args.quantizers)
        dcfg = DeployConfig.create(
            bits=qs.bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
            max_len=test.shape[1] + 32, sink=qs.first_few_fp16,
            head_group=getattr(args, 'head_group', 4),
        codes=getattr(args, 'codes', 'nuq'),
        post_rope_k=(getattr(args, 'post_rope_k', False)
                     or bool(qs.meta.get('post_rope_k', False))),
        k_outliers=getattr(args, 'k_outliers', 'slots'),
        n_kc=getattr(args, 'n_kc', 4),
            kernel=args.kernel,
        )
        dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)
        dep = engine.deployed_ppl(params, cfg, dcfg, dq, jnp.asarray(test[:1]))
        print(f"deployed ppl (first window, kernel={args.kernel}): {dep:.4f}")
    return ppl


if __name__ == "__main__":
    main()
