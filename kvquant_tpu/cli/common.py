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
    add_storage_args(ap)


def add_storage_args(ap: argparse.ArgumentParser):
    """Deployed-cache storage knobs, shared by the calibration CLI and every
    deployment-side CLI (deploy/eval_ppl/generate/needle/passkey/serve)."""
    ap.add_argument("--head-group", type=int, default=4,
                    help="kv heads sharing one outlier slot tile (1/2/4; "
                         "auto-clamped to divide the kv-head count). 4 => "
                         "4.9x cache compression at 3-bit, ppl-neutral")
    ap.add_argument("--codes", default="nuq", choices=["nuq", "int4", "int8"],
                    help="code STORAGE: 'nuq' bit-planes + LUT mux (any "
                         "codebook), 'int4'/'int8' hardware intN + affine "
                         "dequant — the v5e fast path; requires --mode "
                         "uniform calibration (affine codebook)")
    ap.add_argument("--post-rope-k", action="store_true", default=False,
                    help="store keys POST-rotary: the deployed kernel skips "
                         "all rotation work (zero-rotation speed mode). "
                         "Calibration then fits roped activations; the "
                         "reference scheme (and default) is pre-RoPE")
    ap.add_argument("--k-outliers", default="slots",
                    choices=["slots", "channels"],
                    help="K outlier storage: 'slots' per-token fixed-budget "
                         "encoded words (reference-faithful); 'channels' "
                         "n-kc STATIC channels per head group stored as "
                         "dense fp residual rows — exact there, zero "
                         "per-token densification work in the kernel "
                         "(TPU speed mode; V outliers stay per-token)")
    ap.add_argument("--n-kc", type=int, default=4,
                    help="static K outlier channels per head group "
                         "(--k-outliers channels)")


def add_parallel_args(ap: argparse.ArgumentParser):
    """Mesh / multi-host flags (parallel/mesh.py + parallel/distributed.py).
    The reference's only multi-device story is a single-process GPU layer
    split (modeling_llama.py:2428-2453) — here dp spans hosts over DCN and
    tp shards heads/experts inside each host's ICI domain."""
    ap.add_argument("--dp", type=int, default=1, help="data-parallel size")
    ap.add_argument("--tp", type=int, default=None,
                    help="tensor-parallel size (default: devices/dp; must "
                         "divide the kv-head count)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: call jax.distributed.initialize from "
                         "KVQ_COORDINATOR/KVQ_NUM_PROCESSES/KVQ_PROCESS_ID "
                         "or the flags below")
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)


def setup_parallel(args):
    """Initialize distributed mode (if requested) and return a Mesh or None
    (single device). Call BEFORE any other JAX use."""
    from ..parallel.distributed import init_distributed, make_multihost_mesh
    from ..parallel.mesh import make_mesh
    import jax
    import os

    # the axon sitecustomize pins jax_platforms at import time; an explicit
    # JAX_PLATFORMS in the environment should still win for CLI runs
    env_plat = os.environ.get("JAX_PLATFORMS")
    if env_plat and str(jax.config.jax_platforms) != env_plat:
        jax.config.update("jax_platforms", env_plat)

    if getattr(args, "distributed", False):
        init_distributed(args.coordinator, args.num_processes, args.process_id)
        return make_multihost_mesh(tp=args.tp)
    # mesh only when explicitly requested — head counts must divide tp, so
    # silently meshing over all visible devices would break small models
    if args.dp > 1 or args.tp is not None:
        return make_mesh(dp=args.dp, tp=args.tp)
    return None


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
