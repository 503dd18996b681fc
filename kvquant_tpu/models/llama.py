"""Functional JAX LLaMA-family transformer.

TPU-first design choices (vs the reference's forked HF transformers):
  - pure function + stacked-parameter pytree, `lax.scan` over layers (one
    layer trace instead of n_layers traces: fast compiles at 32+ layers)
  - bf16 matmuls on the MXU, fp32 RMSNorm/softmax/rope
  - RoPE computed analytically from positions every call (the reference's
    "dynamic RoPE" deployment modeling_llama.py:159-179 exists to avoid a
    1M-entry cos/sin cache; in JAX that is simply the natural formulation)
  - simulated KV quantization is a pure hook on the k/v projections
    (reference wraps k_proj/v_proj in QuantLinearSim modules,
    quant/kvquant/simquant_module_quantizer.py:563)
  - Fisher calibration needs d(loss)/d(k_act): instead of module hooks +
    retain_grad (gradients fork modeling_llama.py:286-301) we add zero-valued
    probe tensors to the activations and take plain jax.grad w.r.t. them.

Capture/probe outputs are per-layer stacked along a leading L axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from .config import ModelConfig
from ..quant.nuq import quant_lut
from ..quant.outliers import (
    static_outlier_mask,
    dynamic_outlier_mask,
    capped_outlier_mask,
    apply_sink_mask,
)


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------

def init_params(key, cfg: ModelConfig, dtype=jnp.bfloat16):
    """Random-init parameter pytree with stacked per-layer weights."""
    k_embed, k_layers, k_head = jax.random.split(key, 3)

    def dense(key, shape, scale=None):
        scale = scale or (1.0 / shape[-2] ** 0.5 if len(shape) > 1 else 0.02)
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    L, D, H, Hkv, Dh, F = (
        cfg.n_layers, cfg.d_model, cfg.n_heads, cfg.n_kv_heads, cfg.d_head,
        cfg.d_ff,
    )
    ks = jax.random.split(k_layers, 7)
    layers = dict(
        wq=dense(ks[0], (L, D, H * Dh)),
        wk=dense(ks[1], (L, D, Hkv * Dh)),
        wv=dense(ks[2], (L, D, Hkv * Dh)),
        wo=dense(ks[3], (L, H * Dh, D)),
        w_gate=dense(ks[4], (L, D, F)),
        w_up=dense(ks[5], (L, D, F)),
        w_down=dense(ks[6], (L, F, D)),
        ln_attn=jnp.ones((L, D), jnp.float32),
        ln_mlp=jnp.ones((L, D), jnp.float32),
    )
    params = dict(
        embed=dense(k_embed, (cfg.vocab_size, D), scale=0.02),
        final_norm=jnp.ones((D,), jnp.float32),
        layers=layers,
    )
    if not cfg.tie_embeddings:
        params["lm_head"] = dense(k_head, (D, cfg.vocab_size))
    return params


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def rms_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * scale * w).astype(x.dtype)


def norm(x, w, cfg):
    """Config-dispatched normalization: RMSNorm (LLaMA family) or bias-free
    LayerNorm (DBRX, modeling_dbrx.py:647-652)."""
    if cfg.norm_type == "layernorm":
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + cfg.rms_eps) * w).astype(x.dtype)
    return rms_norm(x, w, cfg.rms_eps)


def rope_cos_sin(positions, cfg: ModelConfig, dtype=jnp.float32):
    """cos/sin tables for given positions: (..., d_head). HF rotate-half
    convention: angles for dim pair i repeated at i and i + d_head/2."""
    half = cfg.d_head // 2
    inv_freq = cfg.rope_theta ** (
        -jnp.arange(0, half, dtype=jnp.float32) * 2.0 / cfg.d_head
    )
    pos = positions.astype(jnp.float32) / cfg.rope_scaling
    angles = pos[..., None] * inv_freq  # (..., half)
    angles = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rope(x, cos, sin):
    """x: (..., T, n, d_head) with cos/sin (..., T, d_head)."""
    c = jnp.expand_dims(cos, -2)
    s = jnp.expand_dims(sin, -2)
    xf = x.astype(jnp.float32)
    return (xf * c + rotate_half(xf) * s).astype(x.dtype)


# ---------------------------------------------------------------------------
# simulated KV quantization hook
# ---------------------------------------------------------------------------

# Quantizer arrays (a pytree scanned over layers) are kept separate from the
# static scheme config (hashable, closed over) so the whole thing jits clean.


@jax.tree_util.register_dataclass
@dataclass
class SimQuantArrays:
    """Stacked (leading L axis) quantizer arrays.

    K: per-channel, pre-RoPE, static calibrated thresholds, optionally capped
       outlier budget per token.
    V: per-token, dynamic range (see SimQuantConfig.v_mode).
    Shapes: k_lower/k_upper (L, C); k_lut/v_lut (L, 2**bits) sorted
    normalized; *_normscale/*_normoffset (L,) Q-Norm affine (1/0 when unused).
    """


    k_lower: Any
    k_upper: Any
    k_lut: Any
    v_lut: Any
    k_normscale: Any
    k_normoffset: Any
    v_normscale: Any
    v_normoffset: Any
    k_ressc: Any = None  # (L, C) per-channel residual energy (static-
    #   channel K outlier selection signal; only read when
    #   SimQuantConfig.k_outliers == "channels")


@dataclass(frozen=True)
class SimQuantConfig:
    """Static scheme config. v_mode:
    - "topk": range from the token's 2-sided global top-k, per-head capped
      outlier storage (matches the deployed kernels; see ops/deployed.py)
    - "percentile": reference simulated-eval semantics
      (get_outliers_dynamic, simquant_module_quantizer.py:80)

    ``cap_per_side`` is per (token, kv-head) — set ``n_kv_heads`` with it.
    ``v_range_exclude`` is the global per-side extreme count defining the
    per-token V range (the reference's topk(cap+1)).
    """

    bits: int
    include_sparse: bool = True
    sparsity_threshold: float = 0.99
    cap_per_side: int = 0  # 0 => uncapped static mask
    n_kv_heads: int = 1
    v_range_exclude: int = 0  # 0 => derive from sparsity_threshold
    first_few_fp16: int = 0
    v_mode: str = "topk"  # or "percentile"
    qnorm: bool = False
    k_outliers: str = "slots"  # "channels": K outliers are the n_kc
    #   highest-residual-energy channels per head group, kept EXACT for
    #   every token (mirrors DeployConfig.k_outliers="channels" — dense
    #   fp residual storage reconstructs those channels exactly)
    n_kc: int = 4
    post_rope_k: bool = False  # quantize keys AFTER rotary embedding.
    #   The reference quantizes pre-RoPE (the paper's per-channel insight);
    #   post-RoPE storage is the TPU speed mode: the deployed kernel skips
    #   the per-element rotation entirely and per-channel scales fold into
    #   the query. Calibrate on ROPED activations (rope_k_activations).


@dataclass
class SimQuantParams:
    arrays: SimQuantArrays
    config: SimQuantConfig


def simquant_from_quantizers(qs, v_mode="topk", n_kv_heads=1,
                             cap_per_side=2, head_group=1,
                             post_rope_k=None, k_outliers="slots",
                             n_kc=4) -> SimQuantParams:
    """Build stacked simulated-quant params from a QuantizerSet artifact.
    ``n_kv_heads`` sets the per-(token, kv-head) outlier budget granularity
    and ``cap_per_side`` the per-head budget — pass the model's kv-head
    count and the DeployConfig's cap so the oracle matches deployment.
    ``head_group`` pools the budget over groups of kv heads exactly like
    DeployConfig.head_group (pass the same value for oracle alignment)."""
    import numpy as np

    k_lower = np.stack([lq.k.lower for lq in qs.layers])
    k_upper = np.stack([lq.k.upper for lq in qs.layers])
    k_lut = np.stack([np.sort(lq.k.lut.reshape(-1)) for lq in qs.layers])
    v_lut = np.stack([np.sort(lq.v.lut.reshape(-1)) for lq in qs.layers])

    def aff(vals, default):
        return np.array(
            [default if v is None else v for v in vals], np.float32
        )

    arrays = SimQuantArrays(
        k_lower=jnp.asarray(k_lower, jnp.float32),
        k_upper=jnp.asarray(k_upper, jnp.float32),
        k_lut=jnp.asarray(k_lut, jnp.float32),
        v_lut=jnp.asarray(v_lut, jnp.float32),
        k_normscale=jnp.asarray(aff([lq.k.normscale for lq in qs.layers], 1.0)),
        k_normoffset=jnp.asarray(aff([lq.k.normoffset for lq in qs.layers], 0.0)),
        v_normscale=jnp.asarray(aff([lq.v.normscale for lq in qs.layers], 1.0)),
        v_normoffset=jnp.asarray(aff([lq.v.normoffset for lq in qs.layers], 0.0)),
        k_ressc=jnp.asarray(np.stack([
            np.zeros_like(lq.k.upper) if lq.k.ressc is None
            else np.asarray(lq.k.ressc, np.float32)
            for lq in qs.layers
        ]), jnp.float32),
    )
    qnorm = any(lq.k.normscale is not None for lq in qs.layers)
    from ..quant.outliers import outlier_budget_per_side

    C = k_lower.shape[-1]
    assert n_kv_heads % head_group == 0, (n_kv_heads, head_group)
    cfg = SimQuantConfig(
        bits=qs.bits,
        include_sparse=True,
        sparsity_threshold=qs.sparsity_threshold,
        cap_per_side=cap_per_side if qs.cap_outliers else 0,
        n_kv_heads=n_kv_heads // head_group,
        v_range_exclude=outlier_budget_per_side(C, qs.sparsity_threshold),
        first_few_fp16=qs.first_few_fp16,
        v_mode=v_mode,
        qnorm=qnorm,
        post_rope_k=(
            bool(qs.meta.get("post_rope_k", False))
            if post_rope_k is None else post_rope_k
        ),
        k_outliers=k_outliers,
        n_kc=n_kc,
    )
    return SimQuantParams(arrays=arrays, config=cfg)


def simquant_k(k, arrs, cfg: SimQuantConfig):
    """Fake-quantize pre-RoPE keys (B, T, C), per-channel static scheme."""
    from ..quant.outliers import capped_outlier_mask_headwise

    kf = k.astype(jnp.float32)
    if cfg.include_sparse:
        if cfg.k_outliers == "channels":
            # static-channel mode: the deployed cache stores the FULL
            # residual densely at each group's top-n_kc residual-energy
            # channels — reconstruction there is exact for every token
            # (ops/deployed.quantize_k), so the simulated mask is a static
            # per-channel one-hot, not a per-token top-k
            C = kf.shape[-1]
            gw = C // cfg.n_kv_heads
            g = arrs.k_ressc.reshape(cfg.n_kv_heads, gw)
            idx = jax.lax.top_k(g, cfg.n_kc)[1]  # (G, n_kc)
            chmask = jnp.any(
                idx[..., None] == jnp.arange(gw), axis=-2
            ).reshape(C)  # (C,) bool
            mask = jnp.broadcast_to(chmask, kf.shape)
        elif cfg.cap_per_side > 0:
            mask = capped_outlier_mask_headwise(
                kf, arrs.k_lower, arrs.k_upper, cfg.cap_per_side,
                cfg.n_kv_heads,
            )
        else:
            mask = static_outlier_mask(kf, arrs.k_lower, arrs.k_upper, axis=0)
        mask = apply_sink_mask(mask, cfg.first_few_fp16, token_axis=-2)
    else:
        mask = None
    deq = quant_lut(
        kf,
        arrs.k_lut,
        axis=0,  # per-channel thresholds broadcast along tokens
        minval=arrs.k_lower,
        maxval=arrs.k_upper,
        outlier_mask=mask,
        normscale=arrs.k_normscale if cfg.qnorm else None,
        normoffset=arrs.k_normoffset if cfg.qnorm else None,
        sink=cfg.first_few_fp16,
        token_axis=-2,
    )
    return deq.astype(k.dtype)


def v_topk_range_and_mask(vf, r_exclude: int, cap_per_side: int,
                          n_kv_heads: int):
    """Deployed-kernel V semantics: range = the (r+1)-th global extreme each
    side (deployment modeling_llama.py:1528-1545, 1091-1114); the stored
    outliers are the per-head top-cap beyond-range elements."""
    from ..quant.outliers import headwise_range_outlier_mask

    top_v, _ = jax.lax.top_k(vf, r_exclude + 1)
    bot_v, _ = jax.lax.top_k(-vf, r_exclude + 1)
    maxval = top_v[..., -1:]
    minval = -bot_v[..., -1:]
    mask = headwise_range_outlier_mask(
        vf, minval, maxval, cap_per_side, n_kv_heads
    )
    return minval, maxval, mask


def simquant_v(v, arrs, cfg: SimQuantConfig):
    """Fake-quantize values (B, T, C), per-token dynamic scheme."""
    vf = v.astype(jnp.float32)
    minval = maxval = None
    dynamic = True
    if cfg.include_sparse:
        if cfg.v_mode == "topk":
            from ..quant.outliers import outlier_budget_per_side

            r = cfg.v_range_exclude or outlier_budget_per_side(
                v.shape[-1], cfg.sparsity_threshold
            )
            cap = cfg.cap_per_side or outlier_budget_per_side(
                v.shape[-1] // cfg.n_kv_heads, cfg.sparsity_threshold
            )
            if cfg.k_outliers == "channels" and cfg.cap_per_side == 0:
                # channels mode with V slots turned OFF: per-token range
                # only, no stored V outliers (deployed mirror: quantize_v
                # skips _group_outlier_words when cap_per_side == 0)
                top_v, _ = jax.lax.top_k(vf, r + 1)
                bot_v, _ = jax.lax.top_k(-vf, r + 1)
                maxval, minval = top_v[..., -1:], -bot_v[..., -1:]
                mask = jnp.zeros(vf.shape, bool)
            else:
                minval, maxval, mask = v_topk_range_and_mask(
                    vf, r, cap, cfg.n_kv_heads
                )
            dynamic = False
        else:
            mask = dynamic_outlier_mask(vf, cfg.sparsity_threshold, axis=-1)
        mask = apply_sink_mask(mask, cfg.first_few_fp16, token_axis=-2)
    else:
        mask = None
    deq = quant_lut(
        vf,
        arrs.v_lut,
        axis=-1,
        minval=minval,
        maxval=maxval,
        dynamic=dynamic,
        outlier_mask=mask,
        normscale=arrs.v_normscale if cfg.qnorm else None,
        normoffset=arrs.v_normoffset if cfg.qnorm else None,
        sink=cfg.first_few_fp16,
        token_axis=-2,
    )
    return deq.astype(v.dtype)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _mask(cfg: ModelConfig, pq, pk):
    """causal (+ optional sliding window) mask from absolute positions."""
    m = pk <= pq
    if cfg.sliding_window is not None:
        m &= pk > pq - cfg.sliding_window
    return m


def _attention_full(q, k, v, cfg: ModelConfig, positions):
    """Materialized causal attention. q: (B,T,H,Dh), k/v: (B,T,Hkv,Dh)."""
    B, T, H, Dh = q.shape
    g = cfg.q_per_kv
    qh = q.reshape(B, T, cfg.n_kv_heads, g, Dh)
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qh, k, preferred_element_type=jnp.float32
    ) / (Dh**0.5)

    mask = _mask(cfg, positions[:, :, None], positions[:, None, :])
    scores = jnp.where(mask[:, None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, T, H * Dh).astype(q.dtype)


def _attention_chunked(q, k, v, cfg: ModelConfig, positions, chunk: int,
                       remat: bool = False):
    """Blockwise online-softmax (flash-style) causal attention: O(T*chunk)
    score memory instead of O(T^2). The reference's long-prompt path is
    flash-attn fp16 (deployment modeling_llama.py:1860-1873); on TPU the
    blockwise formulation maps to a lax.scan over KV chunks that XLA
    pipelines — no custom kernel needed for the prompt phase.
    """
    B, T, H, Dh = q.shape
    g = cfg.q_per_kv
    Hkv = cfg.n_kv_heads
    nb = T // chunk
    assert T % chunk == 0
    qh = (
        q.reshape(B, T, Hkv, g, Dh).astype(jnp.float32) / (Dh**0.5)
    )

    kb = k.astype(jnp.float32).reshape(B, nb, chunk, Hkv, Dh)
    vb = v.astype(jnp.float32).reshape(B, nb, chunk, Hkv, Dh)
    pb = positions.reshape(B, nb, chunk)
    kb = jnp.moveaxis(kb, 1, 0)
    vb = jnp.moveaxis(vb, 1, 0)
    pb = jnp.moveaxis(pb, 1, 0)

    def body(carry, blk):
        m, l, acc = carry  # (B,Hkv,g,T), (B,Hkv,g,T), (B,Hkv,g,T,Dh)
        k_c, v_c, p_c = blk
        s = jnp.einsum("bqhgd,bkhd->bhgqk", qh, k_c,
                       preferred_element_type=jnp.float32)
        mask = _mask(cfg, positions[:, :, None], p_c[:, None, :])
        s = jnp.where(mask[:, None, None], s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        # guard: fully-masked rows keep m = -inf; exp(-inf - -inf) -> use 0
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - m_new), 0.0)
        p = jnp.exp(s - m_new[..., None])
        p = jnp.where(jnp.isfinite(s), p, 0.0)
        l_new = l * corr + jnp.sum(p, axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bhgqk,bkhd->bhgqd", p, v_c, preferred_element_type=jnp.float32
        )
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((B, Hkv, g, T), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, Hkv, g, T), jnp.float32)
    a0 = jnp.zeros((B, Hkv, g, T, Dh), jnp.float32)
    # remat: recompute each chunk's (T, chunk) score block in the
    # backward instead of saving all nb of them (32K tokens measured a
    # 68.7G allocation without this; the saved carries are O(nb*T*Dh))
    (m, l, acc), _ = jax.lax.scan(
        jax.checkpoint(body) if remat else body, (m0, l0, a0),
        (kb, vb, pb),
    )

    out = acc / jnp.maximum(l, 1e-30)[..., None]
    out = jnp.moveaxis(out, 3, 1)  # (B,T,Hkv,g,Dh)
    return out.reshape(B, T, H * Dh).astype(q.dtype)


def _attention(q, k, v, cfg: ModelConfig, positions, chunk=None,
               remat=False):
    """Causal attention; switches to the blockwise path for long sequences
    (or when ``chunk`` is forced)."""
    T = q.shape[1]
    if chunk is None and T > 4096:
        chunk = 2048
    if chunk is not None and T % chunk == 0 and T > chunk:
        return _attention_chunked(q, k, v, cfg, positions, chunk,
                                  remat=remat)
    return _attention_full(q, k, v, cfg, positions)


def forward(
    params,
    cfg: ModelConfig,
    tokens,  # (B, T) int32
    *,
    positions=None,  # (B, T) int32 absolute positions
    simquant: SimQuantParams | None = None,
    capture_kv: bool = False,
    kv_probes=None,  # dict(k=(L,B,T,C), v=(L,B,T,C)) zeros — Fisher probes
    attn_chunk: int | None = None,  # force blockwise attention chunk size
    remat: bool = False,  # jax.checkpoint each layer: O(L*B*T*d) residuals
    # instead of per-chunk attention intermediates in the backward pass
    # (T=8192 fine-tune measured 58.7G HBM without it — the standard
    # activation-rematerialization trade, cf. jax.checkpoint docs)
):
    """Full-sequence forward. Returns (logits fp32 (B,T,V), aux dict).

    aux["k_acts"]/aux["v_acts"]: (L, B, T, C) fp32 pre-RoPE k / v projections
    when capture_kv=True (the calibration signal, reference hook at
    quant/llama_simquant.py:238-245).
    """
    B, T = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    cos, sin = rope_cos_sin(positions, cfg)

    x = jnp.take(params["embed"], tokens, axis=0)
    sq_arrays = simquant.arrays if simquant is not None else None
    sq_cfg = simquant.config if simquant is not None else None

    def layer_fn(x, scanned):
        lp = scanned["p"]
        h = norm(x, lp["ln_attn"], cfg)
        q = h @ lp["wq"]
        k = h @ lp["wk"]
        v = h @ lp["wv"]

        if kv_probes is not None:
            k = k + scanned["probe_k"]
            v = v + scanned["probe_v"]

        captured = (
            (k.astype(jnp.float32), v.astype(jnp.float32))
            if capture_kv
            else (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
        )

        if simquant is not None:
            sq = scanned["sq"]
            if not sq_cfg.post_rope_k:
                k = simquant_k(k, sq, sq_cfg)
            v = simquant_v(v, sq, sq_cfg)

        q = q.reshape(B, T, cfg.n_heads, cfg.d_head)
        k = k.reshape(B, T, cfg.n_kv_heads, cfg.d_head)
        v = v.reshape(B, T, cfg.n_kv_heads, cfg.d_head)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if simquant is not None and sq_cfg.post_rope_k:
            # post-RoPE K scheme: fake-quantize the ROPED keys (the same
            # per-channel static machinery, calibrated on roped activations)
            k = simquant_k(
                k.reshape(B, T, cfg.n_kv_heads * cfg.d_head),
                scanned["sq"], sq_cfg,
            ).reshape(B, T, cfg.n_kv_heads, cfg.d_head)

        attn = _attention(q, k, v, cfg, positions, chunk=attn_chunk,
                          remat=remat)
        x = x + attn @ lp["wo"]

        h = norm(x, lp["ln_mlp"], cfg)
        x = x + (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        return x, captured

    scanned = {"p": params["layers"]}
    if sq_arrays is not None:
        scanned["sq"] = sq_arrays
    if kv_probes is not None:
        scanned["probe_k"] = kv_probes["k"]
        scanned["probe_v"] = kv_probes["v"]

    x, (k_acts, v_acts) = jax.lax.scan(
        jax.checkpoint(layer_fn) if remat else layer_fn, x, scanned
    )

    x = norm(x, params["final_norm"], cfg)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = (x @ head).astype(jnp.float32)

    aux = {}
    if capture_kv:
        aux["k_acts"] = k_acts
        aux["v_acts"] = v_acts
    return logits, aux


def make_kv_probes(cfg: ModelConfig, batch: int, seq: int):
    """Zero probe tensors whose gradients are d(loss)/d(k_act), d(loss)/d(v_act)."""
    shape = (cfg.n_layers, batch, seq, cfg.kv_hidden)
    return {
        "k": jnp.zeros(shape, jnp.float32),
        "v": jnp.zeros(shape, jnp.float32),
    }
