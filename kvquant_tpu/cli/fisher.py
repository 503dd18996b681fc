"""Fisher-information calibration CLI (reference gradients/run-fisher.py).

Computes per-element squared activation gradients of the CLM loss for the
K/V projections over calibration samples and saves them as an .npz
(replacing the reference's overwrite-weights-and-save_pretrained hack,
run-fisher.py:297-306).

  python -m kvquant_tpu.cli.fisher --nsamples 16 --seqlen 2048 \
      --output fisher.npz [--model /path/to/hf_dir]
"""

from __future__ import annotations

import argparse

import numpy as np
import jax.numpy as jnp

from . import common
from ..fisher.fisher import fisher_info


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(ap)
    common.add_data_args(ap)
    ap.add_argument("--output", required=True, help=".npz output path")
    ap.add_argument("--batch", type=int, default=1,
                    help="samples per fwd+bwd step")
    args = ap.parse_args(argv)

    params, cfg = common.load_model(args)
    train, _ = common.load_data(args, cfg)

    batches = [
        jnp.asarray(train[i:i + args.batch])
        for i in range(0, len(train), args.batch)
    ]
    fk, fv = fisher_info(params, cfg, batches)
    np.savez(
        args.output,
        fisher_k=np.asarray(fk, np.float32),
        fisher_v=np.asarray(fv, np.float32),
        seqlen=np.int32(args.seqlen),
    )
    print(f"saved fisher info {fk.shape} -> {args.output}")


if __name__ == "__main__":
    main()
