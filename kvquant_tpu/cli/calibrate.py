"""Calibration + quantizer generation CLI (reference quant/llama_simquant.py
--quantize path: activation capture -> thresholds -> Fisher-weighted k-means
codebooks -> artifact).

  python -m kvquant_tpu.cli.calibrate --abits 4 --nsamples 16 \
      --fisher fisher.npz --output quantizers_4bit.npz [--model hf_dir]
"""

from __future__ import annotations

import argparse

import numpy as np
import jax.numpy as jnp

from . import common
from ..quant.artifacts import save_quantizers
from ..quant.calibration import collect_kv_activations, fit_quantizers


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(ap)
    common.add_quant_args(ap)
    common.add_data_args(ap)
    ap.add_argument("--fisher", default=None,
                    help=".npz from cli.fisher (sample-weights the k-means)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--kmeans-iters", type=int, default=50)
    ap.add_argument("--mode", default="nuq", choices=["nuq", "nf", "uniform"],
                    help="nuq: Fisher-weighted k-means codebooks; nf: "
                         "NormalFloat signposts (reference --nf); uniform: "
                         "evenly spaced integer grid (reference quant_fn_zp)")
    args = ap.parse_args(argv)

    params, cfg = common.load_model(args)
    train, _ = common.load_data(args, cfg)

    k_acts, v_acts = collect_kv_activations(
        params, cfg, [jnp.asarray(train)],
        rope_k=getattr(args, "post_rope_k", False),
    )
    fisher_k = fisher_v = None
    if args.fisher:
        z = np.load(args.fisher)
        fisher_k, fisher_v = z["fisher_k"], z["fisher_v"]
        assert fisher_k.shape == k_acts.shape, (
            fisher_k.shape, k_acts.shape,
            "fisher must be computed over the same calibration stream",
        )

    qs = fit_quantizers(
        k_acts, v_acts, bits=args.abits,
        sparsity_threshold=args.sparsity_threshold,
        include_sparse=args.include_sparse, cap_outliers=args.cap_outliers,
        first_few_fp16=args.first_few_fp16, sample_seqlen=args.seqlen,
        fisher_k=fisher_k, fisher_v=fisher_v, qnorm=args.qnorm,
        seed=args.seed, kmeans_iters=args.kmeans_iters, mode=args.mode,
        meta=dict(model=args.model or "toy", dataset=args.dataset,
                  post_rope_k=getattr(args, "post_rope_k", False)),
    )
    save_quantizers(args.output, qs)
    print(f"saved {len(qs)}-layer {args.abits}-bit quantizers -> {args.output}")


if __name__ == "__main__":
    main()
