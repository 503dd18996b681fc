"""Needle-in-haystack evaluation CLI (reference
lwm/eval_haystack_pytorch_quant.py).

  python -m kvquant_tpu.cli.needle --quantizers q.npz \
      --ctx 2048,4096 --depths 0,25,50,75,100 --results results.json
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from . import common
from .. import engine
from ..cache import DeployConfig, deployed_from_quantizers
from ..evals.needle import NeedleHaystackTester, accuracy_grid
from ..quant.artifacts import load_quantizers


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(ap)
    common.add_storage_args(ap)
    ap.add_argument("--quantizers", required=True)
    ap.add_argument("--kernel", default="pallas", choices=["flash", "flash_serial", "pallas", "xla"])
    ap.add_argument("--ctx", default="2048,4096")
    ap.add_argument("--depths", default="0,25,50,75,100")
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--results", default=None, help="resumable JSON path")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    params, cfg = common.load_model(args)
    tok = common.load_tokenizer(args)
    qs = load_quantizers(args.quantizers)
    ctxs = [int(c) for c in args.ctx.split(",")]
    depths = [float(d) for d in args.depths.split(",")]

    dcfg = DeployConfig.create(
        bits=qs.bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
        max_len=max(ctxs) + 64, sink=qs.first_few_fp16, kernel=args.kernel,
        head_group=getattr(args, 'head_group', 4),
        codes=getattr(args, 'codes', 'nuq'),
        post_rope_k=(getattr(args, 'post_rope_k', False)
                     or bool(qs.meta.get('post_rope_k', False))),
        k_outliers=getattr(args, 'k_outliers', 'slots'),
        n_kc=getattr(args, 'n_kc', 4),
    )
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)

    def generate_fn(ids, max_new_tokens):
        out, _ = engine.generate(
            params, cfg, dcfg, dq, jnp.asarray(ids),
            engine.GenerateConfig(max_new_tokens=max_new_tokens),
        )
        return np.asarray(out)[0]

    tester = NeedleHaystackTester(
        generate_fn, tok, context_lengths=ctxs, depth_percents=depths,
        rounds=args.rounds, results_path=args.results, seed=args.seed,
    )
    trials = tester.run()
    for (ctx, depth), acc in sorted(accuracy_grid(trials).items()):
        print(f"ctx {ctx} depth {depth:5.1f}%: {acc:.2%}")


if __name__ == "__main__":
    main()
