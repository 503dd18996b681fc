"""Long-context generation CLI (reference lwm/llama_inference.py: load
quantizer checkpoint, inject deployment config, model.generate()).

  python -m kvquant_tpu.cli.generate --quantizers q.npz --prompt "..." \
      --max-new-tokens 64 [--model hf_dir] [--temperature 0.7]
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from . import common
from .. import engine
from ..cache import DeployConfig, deployed_from_quantizers
from ..quant.artifacts import load_quantizers


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(ap)
    common.add_storage_args(ap)
    ap.add_argument("--quantizers", required=True)
    ap.add_argument("--kernel", default="pallas", choices=["flash", "flash_serial", "pallas", "xla"])
    ap.add_argument("--prompt", default="The quick brown fox")
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--maxlen", type=int, default=None)
    ap.add_argument("--prefill-mode", default="fp16",
                    choices=["fp16", "quantized"],
                    help="fp16: reference flash-then-pack semantics; "
                         "quantized: chunked quantized-trajectory prefill "
                         "(memory-bounded, decode-consistent)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    params, cfg = common.load_model(args)
    tok = common.load_tokenizer(args)
    qs = load_quantizers(args.quantizers)

    ids = np.asarray(tok.encode(args.prompt), np.int32)[None]
    maxlen = args.maxlen or (ids.shape[1] + args.max_new_tokens + 32)
    dcfg = DeployConfig.create(
        bits=qs.bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
        max_len=maxlen, sink=qs.first_few_fp16, kernel=args.kernel,
        head_group=getattr(args, 'head_group', 4),
        codes=getattr(args, 'codes', 'nuq'),
        post_rope_k=(getattr(args, 'post_rope_k', False)
                     or bool(qs.meta.get('post_rope_k', False))),
        k_outliers=getattr(args, 'k_outliers', 'slots'),
        n_kc=getattr(args, 'n_kc', 4),
    )
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)

    gcfg = engine.GenerateConfig(
        max_new_tokens=args.max_new_tokens, temperature=args.temperature,
        top_p=args.top_p,
    )
    out, _ = engine.generate(
        params, cfg, dcfg, dq, jnp.asarray(ids), gcfg,
        key=jax.random.PRNGKey(args.seed), prefill_mode=args.prefill_mode,
    )
    text = tok.decode([int(t) for t in np.asarray(out)[0]])
    print(text)


if __name__ == "__main__":
    main()
