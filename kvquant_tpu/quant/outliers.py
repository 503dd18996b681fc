"""Outlier detection: static thresholds, dynamic percentiles, capped budgets,
attention-sink retention.

Reference behavior (SqueezeAILab/KVQuant, quant/kvquant/simquant_module_quantizer.py):
  - static threshold mask (strict >/<):            get_outliers       :30
  - capped per-token budget via 2-sided topk:      get_outliers cap   :56-73
  - dynamic percentile mask (non-strict >=/<=):    get_outliers_dynamic :80
  - first-few-tokens (attention sink) retention:   :75-77

The capped path is the one that matters for deployment: it guarantees a fixed
number of outlier slots per token (static shapes — exactly what XLA wants),
matching the reference's fixed 42-slot outlier rows
(deployment modeling_llama.py:396-397).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def outlier_budget_per_side(kv_hidden: int, sparsity_threshold: float) -> int:
    """Per-side outlier slot count for one token.

    Mirrors deployment modeling_llama.py:707: int(((1-s)/2)*hidden)+1,
    e.g. hidden=4096, s=0.99 -> 21 (42 total slots/token)."""
    return int(((1.0 - sparsity_threshold) / 2.0) * kv_hidden) + 1


def static_outlier_mask(x, lower, upper, axis: int = 0):
    """Boolean mask of elements strictly outside calibrated thresholds.

    ``lower``/``upper`` are per-slice thresholds shared along ``axis``
    (per-channel K outliers use the token axis)."""
    lower = jnp.expand_dims(jnp.asarray(lower, x.dtype).reshape(-1), axis)
    upper = jnp.expand_dims(jnp.asarray(upper, x.dtype).reshape(-1), axis)
    return (x < lower) | (x > upper)


def dynamic_outlier_mask(x, thresh: float = 0.999, axis: int = -1):
    """Percentile-threshold mask, computed online (non-strict comparisons,
    reference get_outliers_dynamic :99-108)."""
    t = 1.0 - (1.0 - thresh) / 2.0
    x = x.astype(jnp.float32)
    upper = jnp.quantile(x, t, axis=axis, keepdims=True)
    lower = jnp.quantile(x, 1.0 - t, axis=axis, keepdims=True)
    return (x <= lower) | (x >= upper)


def capped_outlier_mask_headwise(x, lower, upper, cap_per_side: int,
                                 n_kv_heads: int):
    """Static-threshold outliers with a fixed per-(token, kv-head) budget —
    the deployed storage scheme (see ops/deployed.py module docs for the
    divergence from the reference's global per-token budget).

    x: (..., C) with C = Hkv*D; lower/upper: (C,) thresholds. Returns a bool
    mask marking the selected (stored-exact) elements.
    """
    *lead, C = x.shape
    D = C // n_kv_heads
    xf = x.astype(jnp.float32)
    lower = jnp.asarray(lower, jnp.float32).reshape(-1)
    upper = jnp.asarray(upper, jnp.float32).reshape(-1)
    zp = (upper + lower) * 0.5
    hr = (upper - lower) * 0.5
    xn = ((xf - zp) / hr).reshape(*lead, n_kv_heads, D)

    base = jnp.abs(xn) > 1.0
    resc = jnp.where(base, jnp.abs(xn), 0.0)
    signed = jnp.where(xn > 0, resc, -resc)

    top_v, top_i = jax.lax.top_k(signed, cap_per_side)
    bot_v, bot_i = jax.lax.top_k(-signed, cap_per_side)
    idx = jnp.concatenate([top_i, bot_i], axis=-1)
    val = jnp.concatenate([top_v, bot_v], axis=-1)
    kept = jnp.put_along_axis(
        jnp.zeros_like(signed), idx, jnp.where(val > 0, 1.0, 0.0), axis=-1,
        inplace=False,
    )
    return (kept > 0).reshape(*lead, C)


def headwise_range_outlier_mask(x, minval, maxval, cap_per_side: int,
                                n_kv_heads: int):
    """Per-head fixed-budget selection of elements beyond a (per-token)
    range — the deployed V scheme. x: (..., C); minval/maxval broadcastable
    (..., 1)."""
    *lead, C = x.shape
    D = C // n_kv_heads
    xf = x.astype(jnp.float32)
    offset = (maxval + minval) * 0.5
    scale = (maxval - minval) * 0.5
    xn = ((xf - offset) / scale).reshape(*lead, n_kv_heads, D)

    base = jnp.abs(xn) > 1.0
    resc = jnp.where(base, jnp.abs(xn), 0.0)
    signed = jnp.where(xn > 0, resc, -resc)
    top_v, top_i = jax.lax.top_k(signed, cap_per_side)
    bot_v, bot_i = jax.lax.top_k(-signed, cap_per_side)
    idx = jnp.concatenate([top_i, bot_i], axis=-1)
    val = jnp.concatenate([top_v, bot_v], axis=-1)
    kept = jnp.put_along_axis(
        jnp.zeros_like(signed), idx, jnp.where(val > 0, 1.0, 0.0), axis=-1,
        inplace=False,
    )
    return (kept > 0).reshape(*lead, C)


def capped_outlier_mask(x, lower, upper, cap_per_side: int, axis: int = 0):
    """Static-threshold outliers, capped to at most ``cap_per_side`` per side
    per token (last dim). Returns (mask, rescaled) where ``rescaled`` is the
    threshold-normalized magnitude ((x - zp)/halfrange), zero at non-outliers
    — the same ranking signal the deployed kernels emit for topK
    (deployment modeling_llama.py:669-714).

    x: (..., C) with tokens on the leading axes and the shared-threshold axis
    being the token axis (``axis``); the cap is applied along the last dim.
    """
    lower = jnp.expand_dims(jnp.asarray(lower, jnp.float32).reshape(-1), axis)
    upper = jnp.expand_dims(jnp.asarray(upper, jnp.float32).reshape(-1), axis)
    x = x.astype(jnp.float32)

    base_mask = (x < lower) | (x > upper)
    zp = (upper + lower) * 0.5
    dist = (upper - lower) * 0.5
    rescaled = jnp.where(base_mask, (x - zp) / dist, 0.0)

    top_v, top_i = jax.lax.top_k(rescaled, cap_per_side)
    bot_v, bot_i = jax.lax.top_k(-rescaled, cap_per_side)
    bot_v = -bot_v

    idx = jnp.concatenate([top_i, bot_i], axis=-1)
    val = jnp.concatenate([top_v, bot_v], axis=-1)
    kept = jnp.put_along_axis(
        jnp.zeros_like(rescaled), idx, val, axis=-1, inplace=False
    )
    mask = kept != 0.0
    return mask, rescaled


def apply_sink_mask(mask, sink: int, token_axis: int = 0):
    """Mark the first ``sink`` tokens (along ``token_axis``) as retained-exact
    (reference :75-77 / :441-446)."""
    if sink <= 0:
        return mask
    tok = jnp.arange(mask.shape[token_axis])
    tok = jnp.expand_dims(
        tok, [a for a in range(mask.ndim) if a != token_axis % mask.ndim]
    )
    return mask | (tok < sink)
