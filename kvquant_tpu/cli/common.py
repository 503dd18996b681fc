"""Shared CLI plumbing: model loading, data, tokenizer."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig, TINY_LLAMA
from ..models import llama


def add_model_args(ap: argparse.ArgumentParser):
    ap.add_argument("--model", default=None,
                    help="local HF checkpoint dir (safetensors); omit for a "
                         "random-init model (--toy-* flags)")
    ap.add_argument("--maxseqlen", type=int, default=None,
                    help="extend context via linear RoPE scaling "
                         "(quant/llama_simquant.py:35-38)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--toy-layers", type=int, default=2)
    ap.add_argument("--toy-dmodel", type=int, default=256)
    ap.add_argument("--toy-heads", type=int, default=8)
    ap.add_argument("--toy-kv-heads", type=int, default=None)
    ap.add_argument("--toy-vocab", type=int, default=32000)
    ap.add_argument("--moe", action="store_true",
                    help="toy model is a DBRX-style MoE (fused Wqkv + "
                         "top-k experts)")
    ap.add_argument("--toy-experts", type=int, default=4)
    ap.add_argument("--toy-top-k", type=int, default=2)


def add_quant_args(ap: argparse.ArgumentParser):
    ap.add_argument("--abits", type=int, default=4, choices=[2, 3, 4],
                    help="KV quantization bits")
    ap.add_argument("--include-sparse", action="store_true", default=True)
    ap.add_argument("--no-sparse", dest="include_sparse", action="store_false")
    ap.add_argument("--sparsity-threshold", type=float, default=0.99,
                    help="dense fraction for calibration thresholds and the "
                         "V range exclusion (e.g. 0.99 => 1%% beyond "
                         "threshold). The STORED outlier budget is the fixed "
                         "per-(token, kv-head) cap_per_side of DeployConfig, "
                         "not this flag")
    ap.add_argument("--first-few-fp16", type=int, default=5,
                    help="attention-sink tokens kept exact")
    ap.add_argument("--cap-outliers", action="store_true", default=True)
    ap.add_argument("--qnorm", action="store_true", default=False)


def add_data_args(ap: argparse.ArgumentParser):
    ap.add_argument("--dataset", default="synthetic",
                    help="synthetic | text (with --dataset-path)")
    ap.add_argument("--dataset-path", default=None)
    ap.add_argument("--nsamples", type=int, default=16)
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)


def load_model(args):
    """(params, cfg) from a local HF dir or random init."""
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.model:
        from ..models.hf_loader import load_hf_checkpoint

        return load_hf_checkpoint(args.model, dtype=dtype,
                                  max_seq_len=args.maxseqlen)
    common_kw = dict(
        vocab_size=args.toy_vocab, d_model=args.toy_dmodel,
        n_layers=args.toy_layers, n_heads=args.toy_heads,
        n_kv_heads=args.toy_kv_heads or args.toy_heads,
        d_head=args.toy_dmodel // args.toy_heads,
        d_ff=args.toy_dmodel * 3,
    )
    if getattr(args, "moe", False):
        from ..models import moe

        cfg = moe.MoEConfig(
            n_experts=args.toy_experts, top_k=args.toy_top_k, **common_kw
        )
        init = moe.init_params
    else:
        cfg = ModelConfig(**common_kw)
        init = llama.init_params
    if args.maxseqlen:
        cfg = cfg.scaled(args.maxseqlen)
    params = init(jax.random.PRNGKey(0), cfg, dtype=dtype)
    return params, cfg


def load_data(args, cfg):
    from ..data import get_loaders

    return get_loaders(
        args.dataset, nsamples=args.nsamples, seed=args.seed,
        seqlen=args.seqlen, vocab_size=cfg.vocab_size,
        tokenizer=load_tokenizer(args) if args.dataset_path else None,
        path=args.dataset_path,
    )


def load_tokenizer(args):
    if args.model:
        try:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(args.model)
        except Exception:
            pass
    from ..utils.toytokenizer import WordTokenizer

    return WordTokenizer()
