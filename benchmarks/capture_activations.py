"""Capture real per-layer K/V activations for kernel benchmarking.

Reference: benchmarking/cache-llama-activations.py (:60-172 pickles true K/V
activations so kernel benchmarks replay realistic data, not random noise).

  python benchmarks/capture_activations.py --output acts.npz \
      [--model hf_dir] [--nsamples 1 --seqlen 2048]
"""

from __future__ import annotations

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from kvquant_tpu.cli import common
from kvquant_tpu.quant.calibration import collect_kv_activations


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(ap)
    common.add_data_args(ap)
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    params, cfg = common.load_model(args)
    train, _ = common.load_data(args, cfg)
    k_acts, v_acts = collect_kv_activations(
        params, cfg, [jnp.asarray(train[:1])]
    )
    np.savez(
        args.output,
        k_acts=np.asarray(k_acts, np.float32),
        v_acts=np.asarray(v_acts, np.float32),
        n_kv_heads=np.int32(cfg.n_kv_heads),
        d_head=np.int32(cfg.d_head),
    )
    print(f"saved activations {k_acts.shape} -> {args.output}")


if __name__ == "__main__":
    main()
