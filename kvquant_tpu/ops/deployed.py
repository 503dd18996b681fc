"""Deployed quantized-KV attention — pure-XLA reference implementation.

This module defines the exact semantics of the deployed datapath (append,
parallel pack, fused dequant+RoPE+QK^T, fused score*V, dense-and-sparse
outlier reconstruction, attention sinks). The Pallas kernels in
ops/pallas/ are drop-in replacements tested for agreement with these
functions; these in turn are tested for agreement with the *simulated*
quantization path (models/llama.py simquant hooks) — the framework's
correctness oracle, replacing the reference's "deployed ppl == simquant ppl"
manual check (deployment llama.py:84-93).

Key identities relied upon (mirroring the CUDA kernel semantics at
quant_cuda_kernel.cu:3040-3209):
  - keys are quantized pre-RoPE; RoPE is applied to the *dequantized* key at
    score time with absolute positions; rotated-query . rotated-key is
    computed with the regrouped sign trick
  - dense + sparse reconstruction is exact at outlier positions: the packed
    code at an outlier is its clamped nearest entry and the stored sparse
    value is (value - dense dequant), so their sum is the original value
  - V outliers store (value - zeropoint LUT entry) and the packed code at an
    outlier is the zeropoint index (modeling_llama.py:1165-1180)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cache import KVCache, DeployConfig, DeployedQuant
from ..models.config import ModelConfig
from ..models.llama import rope_cos_sin, rotate_half
from ..quant.nuq import nearest_codes, lut_lookup
from .packing import pack_codes, unpack_codes, set_token_codes


def rotate_half_axis(x, axis):
    h = x.shape[axis] // 2
    a = jax.lax.slice_in_dim(x, 0, h, axis=axis)
    b = jax.lax.slice_in_dim(x, h, 2 * h, axis=axis)
    return jnp.concatenate([-b, a], axis=axis)


# ---------------------------------------------------------------------------
# per-token quantization (append-side math)
# ---------------------------------------------------------------------------

def quantize_k(k, lq: DeployedQuant, dcfg: DeployConfig):
    """Quantize pre-RoPE keys (..., C) -> (codes (..., Hkv, D),
    outlier_vals (..., 2*cap), outlier_idx (..., 2*cap)).

    Mirrors vecquantNappendvecKsparse + the fixed-budget topk at
    deployment modeling_llama.py:669-751.
    """
    kf = k.astype(jnp.float32)
    zp = (lq.k_upper + lq.k_lower) * 0.5
    hr = (lq.k_upper - lq.k_lower) * 0.5
    xn = (kf - zp) / hr
    codes = nearest_codes(xn, lq.k_lut_enc)
    deq = lut_lookup(lq.k_lut_dec, codes) * hr + zp

    cap = dcfg.cap_per_side
    ovals = oidx = None
    if dcfg.include_sparse:
        base = (kf < lq.k_lower) | (kf > lq.k_upper)
        resc = jnp.where(base, xn, 0.0)
        top_v, top_i = jax.lax.top_k(resc, cap)
        bot_v, bot_i = jax.lax.top_k(-resc, cap)
        bot_v = -bot_v
        oidx = jnp.concatenate([top_i, bot_i], axis=-1).astype(jnp.int32)
        genuine = jnp.concatenate([top_v > 1.0, bot_v < -1.0], axis=-1)
        k_at = jnp.take_along_axis(kf, oidx, axis=-1)
        d_at = jnp.take_along_axis(deq, oidx, axis=-1)
        ovals = jnp.where(genuine, k_at - d_at, 0.0)

    codes = codes.reshape(*k.shape[:-1], dcfg.n_kv_heads, dcfg.d_head)
    return codes, ovals, oidx


def quantize_v(v, lq: DeployedQuant, dcfg: DeployConfig):
    """Quantize values (..., C) -> (codes (..., Hkv, D), outlier_vals,
    outlier_idx, scale (...,), offset (...,)).

    Per-token range from the (cap+1)-th extremes (the reference's topk(22)
    at modeling_llama.py:1528-1545 / 1091-1114); outliers beyond it stored
    minus the zeropoint entry; packed code at outliers = zeropoint index.
    """
    vf = v.astype(jnp.float32)
    cap = dcfg.cap_per_side
    top_v, top_i = jax.lax.top_k(vf, cap + 1)
    bot_v, bot_i = jax.lax.top_k(-vf, cap + 1)
    bot_v = -bot_v
    maxval = top_v[..., -1:]
    minval = bot_v[..., -1:]
    offset = (maxval + minval) * 0.5
    scale = (maxval - minval) * 0.5

    xn = (vf - offset) / scale
    codes = nearest_codes(xn, lq.v_lut_enc)

    ovals = oidx = None
    if dcfg.include_sparse:
        zp_code = 2 ** (dcfg.bits - 1) - 1
        zp_val = lq.v_lut_dec[zp_code] * scale + offset  # (..., 1)
        mask = (vf > maxval) | (vf < minval)
        codes = jnp.where(mask, zp_code, codes)
        oidx = jnp.concatenate(
            [top_i[..., :cap], bot_i[..., :cap]], axis=-1
        ).astype(jnp.int32)
        genuine = jnp.concatenate(
            [top_v[..., :cap] > maxval, bot_v[..., :cap] < minval], axis=-1
        )
        v_at = jnp.take_along_axis(vf, oidx, axis=-1)
        ovals = jnp.where(genuine, v_at - zp_val, 0.0)

    codes = codes.reshape(*v.shape[:-1], dcfg.n_kv_heads, dcfg.d_head)
    return codes, ovals, oidx, scale[..., 0], offset[..., 0]


# ---------------------------------------------------------------------------
# full-cache dequantization (reference path; production uses Pallas kernels)
# ---------------------------------------------------------------------------

def _scatter_outliers(ovals, oidx, n_kv_heads, d_head, Tc):
    """(B, Tc, 2cap) sparse rows -> dense (B, Hkv, Tc, D) addend.

    NOTE: XLA scatter serializes on TPU (~10us per update row) — this is for
    tests/introspection only; the decode path applies outliers with the
    gather/one-hot formulations below.
    """
    B = ovals.shape[0]
    C = n_kv_heads * d_head
    flat = jnp.zeros((B, Tc, C), jnp.float32)
    b_ix = jnp.arange(B)[:, None, None]
    t_ix = jnp.arange(Tc)[None, :, None]
    flat = flat.at[b_ix, t_ix, oidx].add(ovals)
    return flat.reshape(B, Tc, n_kv_heads, d_head).transpose(0, 2, 1, 3)


def dequant_k_full(cache_l: KVCache, lq: DeployedQuant, dcfg: DeployConfig,
                   with_outliers: bool = True):
    """(B, Hkv, Tc, D) fp32 pre-RoPE keys (dense [+ sparse])."""
    codes = unpack_codes(cache_l.k_planes, dcfg.bits)  # (B,Hkv,Tc,D)
    deq = lut_lookup(lq.k_lut_dec, codes) * lq.k_range[:, None, :] + (
        lq.k_offset[:, None, :]
    )
    if dcfg.include_sparse and with_outliers:
        deq = deq + _scatter_outliers(
            cache_l.k_ovals, cache_l.k_oidx, dcfg.n_kv_heads, dcfg.d_head,
            dcfg.cache_tokens,
        )
    return deq


def dequant_v_full(cache_l: KVCache, lq: DeployedQuant, dcfg: DeployConfig,
                   with_outliers: bool = True):
    """(B, Hkv, Tc, D) fp32 values (dense [+ sparse])."""
    codes = unpack_codes(cache_l.v_planes, dcfg.bits)
    deq = lut_lookup(lq.v_lut_dec, codes) * cache_l.v_scale[:, None, :, None] + (
        cache_l.v_offset[:, None, :, None]
    )
    if dcfg.include_sparse and with_outliers:
        deq = deq + _scatter_outliers(
            cache_l.v_ovals, cache_l.v_oidx, dcfg.n_kv_heads, dcfg.d_head,
            dcfg.cache_tokens,
        )
    return deq


# ---------------------------------------------------------------------------
# scatter-free outlier application (the reference's SPMV_ATOMIC_ROPE_BALANCED
# / SPMV_ATOMIC_BALANCED kernels, quant_cuda_kernel.cu:437-521, recast as
# dense gathers + tiny one-hot contractions — XLA scatter serializes on TPU)
# ---------------------------------------------------------------------------


def k_outlier_scores(q_rot, k_ovals, k_oidx, dcfg: DeployConfig,
                     mcfg: ModelConfig):
    """Score contribution of the sparse Key outliers, with RoPE applied
    analytically to each outlier element.

    RoPE is linear: with R(t) = diag(cos) + diag(sin)·P (P = rotate-half),
    an outlier delta val·e_c at cache slot t contributes
      q_rot · R(t) (val e_c) = val · (R(t)^T q_rot)[c]
                             = val · (cosθ·q[c] + sgn(d)·sinθ·q[c']),
    where d = c mod Dh, c' is the rotate-half partner channel, and
    sgn = +1 for d < Dh/2 else -1 (P^T = -P).

    q_rot: (B, Hkv, G, Dh) roped query; k_ovals/k_oidx: (B, Tc, J).
    Returns (B, Hkv, G, Tc), unscaled (caller applies 1/sqrt(Dh)).
    """
    B, Hkv, G, Dh = q_rot.shape
    Tc, J = k_ovals.shape[1:]
    half = Dh // 2
    S = dcfg.sink

    c = k_oidx  # (B, Tc, J)
    d = c % Dh
    h = c // Dh
    sign = jnp.where(d < half, 1.0, -1.0)
    partner = jnp.where(d < half, d + half, d - half)

    # inv_freq computed analytically from the outlier's dim (a gather from
    # even a 64-entry table serializes on TPU)
    inv_freq = mcfg.rope_theta ** (
        -(d % half).astype(jnp.float32) * 2.0 / Dh
    )  # (B, Tc, J)
    pos = (S + jnp.arange(Tc, dtype=jnp.float32))[None, :, None]
    theta = (pos / mcfg.rope_scaling) * inv_freq
    cost, sint = jnp.cos(theta), jnp.sin(theta)  # (B, Tc, J)

    # q values at the outlier dims via one-hot MXU contractions (no gathers)
    dimoh = (d[..., None] == jnp.arange(Dh)).astype(jnp.float32)  # (B,Tc,J,Dh)
    poh = (partner[..., None] == jnp.arange(Dh)).astype(jnp.float32)
    q_d = jnp.einsum("btjd,bhgd->bhgtj", dimoh, q_rot)
    q_p = jnp.einsum("btjd,bhgd->bhgtj", poh, q_rot)

    term = k_ovals[:, None, None] * (
        cost[:, None, None] * q_d + (sign * sint)[:, None, None] * q_p
    )  # (B, Hkv, G, Tc, J)

    headoh = (h[..., None] == jnp.arange(Hkv)).astype(jnp.float32)
    return jnp.einsum("bhgtj,btjh->bhgt", term, headoh)


def v_outlier_out(p_dense, v_ovals, v_oidx, dcfg: DeployConfig):
    """Output contribution of the sparse Value outliers.

    p_dense: (B, Hkv, G, Tc) softmax weights over packed positions.
    Returns (B, Hkv, G, Dh).
    """
    B, Hkv, G, Tc = p_dense.shape
    Dh = dcfg.d_head
    J = v_ovals.shape[-1]

    c = v_oidx
    d = c % Dh
    h = c // Dh

    headoh = (h[..., None] == jnp.arange(Hkv)).astype(jnp.float32)
    # p at the outlier's head, via one-hot contraction (no gathers)
    p_at = jnp.einsum("bhgt,btjh->bgtj", p_dense, headoh)
    w = p_at * v_ovals[:, None]

    u = jnp.einsum("bgtj,btjh->bhgtj", w, headoh)
    dimoh = (d[..., None] == jnp.arange(Dh)).astype(jnp.float32)
    return jnp.einsum("bhgtj,btjd->bhgd", u, dimoh)


# ---------------------------------------------------------------------------
# predicated row writes
# ---------------------------------------------------------------------------

def _write_row(arr, row, i, pred, axis):
    """dynamic_update_slice of one row along ``axis`` that becomes a no-op
    when pred is False (reads the old row and writes it back)."""
    i = jnp.clip(i, 0, arr.shape[axis] - 1)
    old = jax.lax.dynamic_slice_in_dim(arr, i, 1, axis=axis)
    new = jnp.where(pred, jnp.expand_dims(row, axis).astype(arr.dtype), old)
    return jax.lax.dynamic_update_slice_in_dim(arr, new, i, axis=axis)


# ---------------------------------------------------------------------------
# decode step (append + fused attention)
# ---------------------------------------------------------------------------

def decode_attention(
    cache_l: KVCache,
    lq: DeployedQuant,
    dcfg: DeployConfig,
    mcfg: ModelConfig,
    q,  # (B, H, Dh) un-roped query for this position
    k_new,  # (B, C) pre-RoPE key projection
    v_new,  # (B, C) value projection
    pos,  # scalar int32 absolute position
):
    """Append token ``pos`` to the (single-layer) cache and compute attention
    over positions 0..pos. Returns (cache_l, out (B, H, Dh))."""
    B = q.shape[0]
    S, Tc = dcfg.sink, dcfg.cache_tokens
    Hkv, Dh = dcfg.n_kv_heads, dcfg.d_head
    G = q.shape[1] // Hkv

    pos = jnp.asarray(pos, jnp.int32)
    cos, sin = rope_cos_sin(pos[None], mcfg)  # (1, Dh)
    in_sink = pos < S
    p = jnp.clip(pos - S, 0, Tc - 1)

    # ---- append K ----
    k_h = k_new.reshape(B, Hkv, Dh).astype(jnp.float32)
    k_roped = k_h * cos + rotate_half(k_h) * sin
    codes_k, k_ovals, k_oidx = quantize_k(k_new, lq, dcfg)

    k_sink = cache_l.k_sink
    v_sink = cache_l.v_sink
    if S > 0:
        k_sink = _write_row(k_sink, k_roped, pos, in_sink, axis=2)

    k_planes = set_token_codes(cache_l.k_planes, codes_k, p)
    # predicated: restore the old word column when the token went to the sink
    if S > 0:
        k_planes = jnp.where(in_sink, cache_l.k_planes, k_planes)
    if dcfg.include_sparse:
        k_ov = _write_row(cache_l.k_ovals, k_ovals, p, ~in_sink, axis=1)
        k_oi = _write_row(cache_l.k_oidx, k_oidx, p, ~in_sink, axis=1)
    else:
        k_ov, k_oi = cache_l.k_ovals, cache_l.k_oidx

    # ---- scores ----
    q_h = q.reshape(B, Hkv, G, Dh).astype(jnp.float32)
    q_rot = q_h * cos + rotate_half(q_h) * sin
    inv = 1.0 / (Dh**0.5)

    cache_tmp = KVCache(
        k_planes=k_planes, v_planes=cache_l.v_planes, k_ovals=k_ov,
        k_oidx=k_oi, v_ovals=cache_l.v_ovals, v_oidx=cache_l.v_oidx,
        v_scale=cache_l.v_scale, v_offset=cache_l.v_offset, k_sink=k_sink,
        v_sink=v_sink, length=cache_l.length,
    )
    if dcfg.kernel == "pallas":
        from .pallas import qk_fused

        dense = jax.vmap(
            lambda q1, kp1: qk_fused(
                q1, kp1, lq.k_range, lq.k_offset, lq.k_lut_dec, dcfg, mcfg
            )
        )(q_rot, k_planes)
    else:
        k_full = dequant_k_full(cache_tmp, lq, dcfg, with_outliers=False)
        pos_cache = S + jnp.arange(Tc, dtype=jnp.int32)
        ck, sk = rope_cos_sin(pos_cache, mcfg)  # (Tc, Dh)
        kx = k_full * ck[None, None] + rotate_half_axis(k_full, axis=-1) * sk[None, None]
        dense = jnp.einsum("bhgd,bhtd->bhgt", q_rot, kx)
    if dcfg.include_sparse:
        dense = dense + k_outlier_scores(q_rot, k_ov, k_oi, dcfg, mcfg)
    dense = dense * inv
    scores = dense
    if S > 0:
        sink_sc = jnp.einsum("bhgd,bhsd->bhgs", q_rot, k_sink) * inv
        scores = jnp.concatenate([sink_sc, dense], axis=-1)  # (B,Hkv,G,S+Tc)

    valid = jnp.arange(S + Tc, dtype=jnp.int32) <= pos
    scores = jnp.where(valid, scores, -jnp.inf)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)

    # ---- append V ----
    codes_v, v_ovals, v_oidx, v_sc, v_off = quantize_v(v_new, lq, dcfg)
    v_h = v_new.reshape(B, Hkv, Dh).astype(jnp.float32)
    if S > 0:
        v_sink = _write_row(v_sink, v_h, pos, in_sink, axis=2)
    v_planes = set_token_codes(cache_l.v_planes, codes_v, p)
    if S > 0:
        v_planes = jnp.where(in_sink, cache_l.v_planes, v_planes)
    v_scale = _write_row(cache_l.v_scale, v_sc, p, ~in_sink, axis=1)
    v_offset = _write_row(cache_l.v_offset, v_off, p, ~in_sink, axis=1)
    if dcfg.include_sparse:
        v_ov = _write_row(cache_l.v_ovals, v_ovals, p, ~in_sink, axis=1)
        v_oi = _write_row(cache_l.v_oidx, v_oidx, p, ~in_sink, axis=1)
    else:
        v_ov, v_oi = cache_l.v_ovals, cache_l.v_oidx

    new_cache = KVCache(
        k_planes=k_planes, v_planes=v_planes, k_ovals=k_ov, k_oidx=k_oi,
        v_ovals=v_ov, v_oidx=v_oi, v_scale=v_scale, v_offset=v_offset,
        k_sink=k_sink, v_sink=v_sink,
        length=jnp.full_like(cache_l.length, pos + 1),
    )

    # ---- weighted values ----
    p_dense = probs[..., S:] if S > 0 else probs
    if dcfg.kernel == "pallas":
        from .pallas import pv_fused

        out = jax.vmap(
            lambda p1, vp1, sc1, of1: pv_fused(
                p1, vp1, sc1, of1, lq.v_lut_dec, dcfg
            )
        )(p_dense, v_planes, v_scale, v_offset)
    else:
        v_full = dequant_v_full(new_cache, lq, dcfg, with_outliers=False)
        out = jnp.einsum("bhgt,bhtd->bhgd", p_dense, v_full)
    if dcfg.include_sparse:
        out = out + v_outlier_out(p_dense, new_cache.v_ovals, new_cache.v_oidx, dcfg)
    if S > 0:
        out = out + jnp.einsum("bhgs,bhsd->bhgd", probs[..., :S], v_sink)
    return new_cache, out.reshape(B, Hkv * G, Dh)


# ---------------------------------------------------------------------------
# prompt-phase parallel pack
# ---------------------------------------------------------------------------

def prefill_pack(
    cache_l: KVCache,
    lq: DeployedQuant,
    dcfg: DeployConfig,
    mcfg: ModelConfig,
    k,  # (B, T0, C) pre-RoPE key projections for the whole prompt
    v,  # (B, T0, C)
):
    """Pack a whole prompt into the quantized cache in parallel (the
    reference's parallel_pack kernels + GPU batched topk,
    modeling_llama.py:879-975 / 1294-1385). Prompt-phase attention itself is
    computed in full precision elsewhere (flash path)."""
    B, T0, C = k.shape
    S, Tc = dcfg.sink, dcfg.cache_tokens
    Hkv, Dh = dcfg.n_kv_heads, dcfg.d_head
    assert T0 > S, "prompt must extend beyond the sink prefix"
    Tp = T0 - S
    Tpad = ((Tp + 127) // 128) * 128
    assert Tp <= Tc

    k_sink = cache_l.k_sink
    v_sink = cache_l.v_sink
    if S > 0:
        cos, sin = rope_cos_sin(jnp.arange(S, dtype=jnp.int32), mcfg)
        k_s = k[:, :S].reshape(B, S, Hkv, Dh).astype(jnp.float32)
        k_s = k_s * cos[:, None] + rotate_half(k_s) * sin[:, None]
        k_sink = k_s.transpose(0, 2, 1, 3)
        v_sink = v[:, :S].reshape(B, S, Hkv, Dh).astype(jnp.float32).transpose(0, 2, 1, 3)

    def place(planes, codes):
        # codes (B, Tp, Hkv, D) -> planes word rows [0 : Tpad/32)
        c = codes.transpose(0, 2, 1, 3)  # (B,Hkv,Tp,D)
        c = jnp.pad(c, ((0, 0),) * 2 + ((0, Tpad - Tp), (0, 0)))
        words = pack_codes(c, dcfg.bits)  # (B,Hkv,bits,Tpad/32,D)
        return jax.lax.dynamic_update_slice_in_dim(planes, words, 0, axis=-2)

    def place_rows(arr, rows):
        return jax.lax.dynamic_update_slice_in_dim(
            arr, rows.astype(arr.dtype), 0, axis=1
        )

    codes_k, k_ovals, k_oidx = quantize_k(k[:, S:], lq, dcfg)
    codes_v, v_ovals, v_oidx, v_sc, v_off = quantize_v(v[:, S:], lq, dcfg)

    new_cache = KVCache(
        k_planes=place(cache_l.k_planes, codes_k),
        v_planes=place(cache_l.v_planes, codes_v),
        k_ovals=place_rows(cache_l.k_ovals, k_ovals),
        k_oidx=place_rows(cache_l.k_oidx, k_oidx),
        v_ovals=place_rows(cache_l.v_ovals, v_ovals),
        v_oidx=place_rows(cache_l.v_oidx, v_oidx),
        v_scale=place_rows(cache_l.v_scale, v_sc),
        v_offset=place_rows(cache_l.v_offset, v_off),
        k_sink=k_sink,
        v_sink=v_sink,
        length=jnp.full_like(cache_l.length, T0),
    )
    return new_cache
