"""fp16/bf16 KV-cache decode baseline.

The comparison surface for the quantized engine (the reference benchmarks
its kernels against fp16 matvec baselines, benchmarking/scripts/
test_kernel_baselines.py): a preallocated full-precision KV cache with the
same static-shape decode structure, so throughput ratios isolate the cost /
benefit of KV quantization rather than engine differences.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from .models.config import ModelConfig
from .models import llama


@jax.tree_util.register_dataclass
@dataclass
class Fp16Cache:
    k: Any  # (L, B, Hkv, T, Dh) post-RoPE keys
    v: Any  # (L, B, Hkv, T, Dh)
    length: Any  # (B,) int32


def create_fp16_cache(cfg: ModelConfig, max_len: int, batch: int,
                      dtype=jnp.bfloat16) -> Fp16Cache:
    L, H, Dh = cfg.n_layers, cfg.n_kv_heads, cfg.d_head
    return Fp16Cache(
        k=jnp.zeros((L, batch, H, max_len, Dh), dtype),
        v=jnp.zeros((L, batch, H, max_len, Dh), dtype),
        length=jnp.zeros((batch,), jnp.int32),
    )


def prefill(params, cfg: ModelConfig, cache: Fp16Cache, tokens,
            attn_chunk: int | None = None):
    """Full forward over the prompt; store post-RoPE K and V.
    ``attn_chunk`` forwards to llama._attention's blockwise mode — required
    for long prompts where (T, T) score tensors would not fit."""
    B, T0 = tokens.shape
    logits, aux = llama.forward(
        params, cfg, tokens, capture_kv=True, attn_chunk=attn_chunk
    )
    cos, sin = llama.rope_cos_sin(jnp.arange(T0, dtype=jnp.int32), cfg)

    k = aux["k_acts"].reshape(-1, B, T0, cfg.n_kv_heads, cfg.d_head)
    v = aux["v_acts"].reshape(-1, B, T0, cfg.n_kv_heads, cfg.d_head)
    k = llama.apply_rope(k, cos, sin)
    kc = jax.lax.dynamic_update_slice_in_dim(
        cache.k, k.transpose(0, 1, 3, 2, 4).astype(cache.k.dtype), 0, axis=3
    )
    vc = jax.lax.dynamic_update_slice_in_dim(
        cache.v, v.transpose(0, 1, 3, 2, 4).astype(cache.v.dtype), 0, axis=3
    )
    return (
        Fp16Cache(k=kc, v=vc, length=jnp.full_like(cache.length, T0)),
        logits[:, -1].astype(jnp.float32),
    )


def decode_step(params, cfg: ModelConfig, cache: Fp16Cache, token, pos):
    """Single-token decode against the fp16 cache.

    Layers run as a PYTHON loop with STATIC layer indices, the cache riding
    through as full (L, ...) arrays: each append is a one-row
    dynamic_update_slice and each attention reads a static slice view that
    XLA fuses into the einsum — the cache is read once and written one row
    per layer. (A scan with the cache as xs/ys — the obvious formulation —
    allocates and rewrites the ENTIRE cache every step: +100% memory, which
    OOMs fp16 at 128K, and +~2x traffic, which would handicap the baseline
    the quantized engine is judged against.)
    """
    from .models.moe import MoEConfig, split_qkv, moe_ffn

    is_moe = isinstance(cfg, MoEConfig)
    B = token.shape[0]
    H, Hkv, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.d_head
    G = H // Hkv
    T = cache.k.shape[3]

    x = jnp.take(params["embed"], token, axis=0)
    pos = jnp.asarray(pos, jnp.int32)
    cos, sin = llama.rope_cos_sin(pos[None], cfg)
    valid = jnp.arange(T, dtype=jnp.int32) <= pos

    kall, vall = cache.k, cache.v
    layers = params["layers"]
    for li in range(cfg.n_layers):
        lp = {k: v[li] for k, v in layers.items()}  # static views
        h = llama.norm(x, lp["ln_attn"], cfg)
        if is_moe:
            q, k, v = split_qkv(h @ lp["w_qkv"], cfg)
            q = q.reshape(B, Hkv, G, Dh).astype(jnp.float32)
            k = k.reshape(B, Hkv, Dh).astype(jnp.float32)
            v = v.reshape(B, Hkv, Dh)
        else:
            q = (h @ lp["wq"]).reshape(B, Hkv, G, Dh).astype(jnp.float32)
            k = (h @ lp["wk"]).reshape(B, Hkv, Dh).astype(jnp.float32)
            v = (h @ lp["wv"]).reshape(B, Hkv, Dh)

        q = q * cos + llama.rotate_half(q) * sin
        k = k * cos + llama.rotate_half(k) * sin

        kall = jax.lax.dynamic_update_slice(
            kall, k[None, :, :, None].astype(kall.dtype), (li, 0, 0, pos, 0)
        )
        vall = jax.lax.dynamic_update_slice(
            vall, v[None, :, :, None].astype(vall.dtype), (li, 0, 0, pos, 0)
        )
        kc = kall[li]  # static slice: fused into the einsum read
        vc = vall[li]

        scores = jnp.einsum(
            "bhgd,bhtd->bhgt", q, kc.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) / (Dh**0.5)
        scores = jnp.where(valid, scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum(
            "bhgt,bhtd->bhgd", probs, vc.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        x = x + (attn.reshape(B, H * Dh).astype(x.dtype) @ lp["wo"])
        h = llama.norm(x, lp["ln_mlp"], cfg)
        if is_moe:
            x = x + moe_ffn(h[:, None], lp, cfg)[:, 0].astype(x.dtype)
        else:
            x = x + (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]

    x = llama.norm(x, params["final_norm"], cfg)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = (x @ head).astype(jnp.float32)
    new_cache = Fp16Cache(
        k=kall, v=vall, length=jnp.full_like(cache.length, pos + 1)
    )
    return new_cache, logits
