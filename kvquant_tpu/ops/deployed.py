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
  - dense + sparse reconstruction is exact at stored-outlier positions: the
    packed code there is the clamped nearest entry and the stored sparse
    value is (value - dense dequant), so their sum is the original value.
    (The reference stores V outliers relative to the zero-point LUT entry,
    modeling_llama.py:1165-1180 — residual-vs-dequant storage is equivalent
    in reconstruction and needs no code rewriting at append time.)

TPU-first divergence from the reference (global per-token outlier budget,
42 slots over all channels, modeling_llama.py:396-397): the outlier budget
here is per (token, kv-head) with in-head dim indices. Work in the fused
kernels then scales with the per-head slot count instead of the global
count, outlier arrays shard over heads together with the packed cache, and
elements beyond threshold in excess of a head's budget degrade gracefully
(their packed code clamps to the nearest codebook extreme).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cache import KVCache, DeployConfig, DeployedQuant, k_channel_onehot
from ..models.config import ModelConfig
from ..models.llama import rope_cos_sin, rotate_half
from ..quant.nuq import nearest_codes, lut_lookup
from .packing import (
    pack_codes, unpack_codes, set_token_codes,
    store_codes_int, load_codes_int, place_codes_int,
    pair_codes_int4x2, unpair_codes_int4x2, place_codes_int4x2,
    set_token_rows, set_token_rows_at_layer,
    encode_outlier_words, decode_outlier_words,
)


def _stored_codes(planes, dcfg: DeployConfig):
    """Packed storage -> unsigned int32 codes (B, Hkv, Tc, D)."""
    if dcfg.codes == "nuq":
        return unpack_codes(planes, dcfg.bits)
    if dcfg.codes == "int4x2":
        return unpair_codes_int4x2(planes)
    return load_codes_int(planes, dcfg.bits)


def _encode_rows(codes, dcfg: DeployConfig):
    """Unsigned codes (..., Hkv, D) -> container token rows (..., H', D)
    for the non-"nuq" storage modes (H' = Hkv//2 under int4x2 head
    pairing, Hkv otherwise)."""
    if dcfg.codes == "int4x2":
        return pair_codes_int4x2(codes)
    return store_codes_int(codes, dcfg.bits, dcfg.code_dtype)


def _place_codes(arr, codes, p0, dcfg: DeployConfig):
    """Aligned block write of unsigned codes (..., T, Hkv, D) into a
    non-"nuq" container array (..., H', Tc, D)."""
    if dcfg.codes == "int4x2":
        return place_codes_int4x2(arr, codes, p0)
    return place_codes_int(arr, codes, p0, dcfg.bits)


def rotate_half_axis(x, axis):
    h = x.shape[axis] // 2
    a = jax.lax.slice_in_dim(x, 0, h, axis=axis)
    b = jax.lax.slice_in_dim(x, h, 2 * h, axis=axis)
    return jnp.concatenate([-b, a], axis=axis)


# ---------------------------------------------------------------------------
# per-token quantization (append-side math)
# ---------------------------------------------------------------------------

def _headwise_residual_outliers(xf, resc, deq, cap: int):
    """Per-head fixed-budget outlier extraction.

    xf/resc/deq: (..., Hkv, D). ``resc`` is the ranking signal, nonzero only
    at genuine (beyond-threshold) positions. Returns (ovals, oidx), each
    (..., Hkv, 2*cap), with in-head dim indices; slots of non-genuine
    padding carry value 0.
    """
    top_v, top_i = jax.lax.top_k(resc, cap)
    bot_v, bot_i = jax.lax.top_k(-resc, cap)
    oidx = jnp.concatenate([top_i, bot_i], axis=-1).astype(jnp.int32)
    genuine = jnp.concatenate([top_v > 0.0, bot_v > 0.0], axis=-1)
    x_at = jnp.take_along_axis(xf, oidx, axis=-1)
    d_at = jnp.take_along_axis(deq, oidx, axis=-1)
    return jnp.where(genuine, x_at - d_at, 0.0), oidx


def _encode_padded(ovals, oidx, n_slots: int):
    """(..., G, 2*cap) residuals/9-bit idx -> (..., G, n_slots) encoded fp32
    words, zero-padded."""
    words = encode_outlier_words(ovals, oidx)
    # non-genuine slots carry value 0: their encoded word is just the dim
    # bits (a denormal), which decodes back to value exactly 0 — harmless
    pad = n_slots - words.shape[-1]
    if pad:
        words = jnp.pad(words, ((0, 0),) * (words.ndim - 1) + ((0, pad),))
    return words


def _group_outlier_words(x_g, xn_g, deq_g, dcfg: DeployConfig,
                         n_slots: int | None = None):
    """Shared outlier path for K and V: extract the per-(token, head-group)
    fixed-budget residual outliers in group space and encode them with the
    9-bit ``head_in_group << 7 | dim`` index (ops/packing.py).

    x_g/xn_g/deq_g: (..., n_groups, head_group * d_head) raw / normalized /
    dense-dequantized values. ``n_slots``: rows to pad the encoded words to
    (defaults to slots_per_kind; the V rows of the "channels" layout are
    the tail n_slots - n_kc rows instead)."""
    base = jnp.abs(xn_g) > 1.0
    resc = jnp.where(base, jnp.abs(xn_g), 0.0)
    signed = jnp.where(xn_g > 0, resc, -resc)
    ovals, oidx = _headwise_residual_outliers(
        x_g, signed, deq_g, dcfg.cap_per_side
    )
    D = dcfg.d_head
    oidx9 = (oidx // D) * 128 + (oidx % D)
    return _encode_padded(
        ovals, oidx9,
        dcfg.slots_per_kind if n_slots is None else n_slots,
    )


def quantize_k(k, lq: DeployedQuant, dcfg: DeployConfig):
    """Quantize pre-RoPE keys (..., C) -> (codes (..., Hkv, D), outlier
    rows (..., n_groups, slots_per_kind) or None).

    Mirrors vecquantNappendvecKsparse + the fixed-budget topk at
    deployment modeling_llama.py:669-751, with the budget per kv-head.
    k_outliers="channels": no per-token topk at all — the outlier rows are
    the plain residuals x - dequant at the layer's static channels (dense,
    exact reconstruction there), gathered by a one-hot contraction.
    """
    Hkv, D = dcfg.n_kv_heads, dcfg.d_head
    kf = k.astype(jnp.float32).reshape(*k.shape[:-1], Hkv, D)
    zp = ((lq.k_upper + lq.k_lower) * 0.5).reshape(Hkv, D)
    hr = ((lq.k_upper - lq.k_lower) * 0.5).reshape(Hkv, D)
    xn = (kf - zp) / hr
    codes = nearest_codes(xn, lq.k_lut_enc)
    deq = lut_lookup(lq.k_lut_dec, codes) * hr + zp

    out_words = None
    if dcfg.include_sparse:
        gshape = (*k.shape[:-1], dcfg.n_groups, dcfg.head_group * D)
        if dcfg.k_outliers == "channels":
            sel = k_channel_onehot(lq.k_ressc, dcfg)  # (G, n_kc, hg*D)
            resid = (kf - deq).reshape(gshape)
            out_words = jnp.einsum("...gc,gnc->...gn", resid, sel)
        else:
            out_words = _group_outlier_words(
                kf.reshape(gshape), xn.reshape(gshape), deq.reshape(gshape),
                dcfg,
            )
    return codes, out_words


def quantize_v(v, lq: DeployedQuant, dcfg: DeployConfig):
    """Quantize values (..., C) -> (codes (..., Hkv, D), outlier_vals
    (..., Hkv, 2*cap), outlier_idx, scale (...,), offset (...,)).

    Per-token range from the (r+1)-th global extremes (the reference's
    topk(22) at modeling_llama.py:1528-1545 / 1091-1114); beyond-range
    elements are stored per head as residuals vs the clamped dense dequant.
    """
    Hkv, D = dcfg.n_kv_heads, dcfg.d_head
    vf = v.astype(jnp.float32)
    r = dcfg.v_range_exclude
    top_v = jax.lax.top_k(vf, r + 1)[0]
    bot_v = -jax.lax.top_k(-vf, r + 1)[0]
    maxval = top_v[..., -1:]
    minval = bot_v[..., -1:]
    offset = (maxval + minval) * 0.5
    scale = (maxval - minval) * 0.5

    vh = vf.reshape(*v.shape[:-1], Hkv, D)
    xn = (vh - offset[..., None]) / scale[..., None]
    codes = nearest_codes(xn, lq.v_lut_enc)
    deq = lut_lookup(lq.v_lut_dec, codes) * scale[..., None] + offset[..., None]

    out_words = None
    if dcfg.include_sparse and dcfg.cap_per_side > 0:
        gshape = (*v.shape[:-1], dcfg.n_groups, dcfg.head_group * D)
        out_words = _group_outlier_words(
            vh.reshape(gshape), xn.reshape(gshape), deq.reshape(gshape),
            dcfg, n_slots=dcfg.n_slots - dcfg.slots_per_kind,
        )
    return codes, out_words, scale[..., 0], offset[..., 0]


# ---------------------------------------------------------------------------
# full-cache dequantization (reference path; production uses Pallas kernels)
# ---------------------------------------------------------------------------

def _outlier_addend(out_words, dcfg: DeployConfig):
    """(B, n_groups, J, Tc) encoded slots -> dense (B, Hkv, Tc, D) addend,
    via a one-hot contraction over the group's head_group*d_head dims (XLA
    scatter serializes on TPU). Padding slots decode to value 0, so index
    collisions are harmless."""
    B, Gp, J, Tc = out_words.shape
    D, hg = dcfg.d_head, dcfg.head_group
    vals, idx9 = decode_outlier_words(out_words)
    gidx = (idx9 >> 7) * D + (idx9 & 0x7F)  # dense index in group space
    onehot = (gidx[..., None] == jnp.arange(hg * D)).astype(jnp.float32)
    dense = jnp.einsum("bgjt,bgjtd->bgtd", vals, onehot)  # (B,Gp,Tc,hg*D)
    return dense.reshape(B, Gp, Tc, hg, D).transpose(0, 1, 3, 2, 4).reshape(
        B, Gp * hg, Tc, D
    )


def dequant_k_full(cache_l: KVCache, lq: DeployedQuant, dcfg: DeployConfig,
                   with_outliers: bool = True):
    """(B, Hkv, Tc, D) fp32 pre-RoPE keys (dense [+ sparse])."""
    codes = _stored_codes(cache_l.k_planes, dcfg)  # (B,Hkv,Tc,D)
    deq = lut_lookup(lq.k_lut_dec, codes) * lq.k_range[:, None, :] + (
        lq.k_offset[:, None, :]
    )
    if dcfg.include_sparse and with_outliers:
        rows = cache_l.kv_out[:, :, : dcfg.slots_per_kind]
        if dcfg.k_outliers == "channels":
            # rows are plain residuals at the static channels: densify with
            # the per-layer one-hot selection (an MXU contraction, matching
            # the kernels' two-dot application)
            B, Gp, N, Tc = rows.shape
            D, hg = dcfg.d_head, dcfg.head_group
            sel = k_channel_onehot(lq.k_ressc, dcfg)  # (G, n_kc, hg*D)
            dense = jnp.einsum("bgnt,gnc->bgtc", rows, sel)
            deq = deq + dense.reshape(B, Gp, Tc, hg, D).transpose(
                0, 1, 3, 2, 4
            ).reshape(B, Gp * hg, Tc, D)
        else:
            deq = deq + _outlier_addend(rows, dcfg)
    return deq


def dequant_v_full(cache_l: KVCache, lq: DeployedQuant, dcfg: DeployConfig,
                   with_outliers: bool = True):
    """(B, Hkv, Tc, D) fp32 values (dense [+ sparse])."""
    codes = _stored_codes(cache_l.v_planes, dcfg)
    deq = lut_lookup(lq.v_lut_dec, codes) * cache_l.v_scale[:, None, :, None] + (
        cache_l.v_offset[:, None, :, None]
    )
    if dcfg.include_sparse and with_outliers and dcfg.cap_per_side > 0:
        deq = deq + _outlier_addend(
            cache_l.kv_out[:, :, dcfg.slots_per_kind :], dcfg
        )
    return deq


# ---------------------------------------------------------------------------
# predicated row writes
# ---------------------------------------------------------------------------

def _write_out_slots(arr, words, p, pred, row0: int):
    """Write one token's outlier words into slot rows [row0, row0+n) of the
    merged (B, Hkv, J, Tc) array at each sample's own column ``p`` (scalar
    or (B,)); no-op where pred is False."""
    B, H, _, Tc = arr.shape
    n = words.shape[-1]
    p = jnp.broadcast_to(jnp.clip(p, 0, Tc - 1), (B,))
    pred = jnp.broadcast_to(pred, (B,))

    def one(a, w, pp, pr):
        old = jax.lax.dynamic_slice(a, (0, row0, pp), (H, n, 1))
        new = jnp.where(pr, w[..., None].astype(a.dtype), old)
        return jax.lax.dynamic_update_slice(a, new, (0, row0, pp))

    return jax.vmap(one)(arr, words, p, pred)


def _write_row(arr, row, i, pred, axis):
    """dynamic_update_slice of one row along ``axis`` that becomes a no-op
    when pred is False (reads the old row and writes it back)."""
    i = jnp.clip(i, 0, arr.shape[axis] - 1)
    old = jax.lax.dynamic_slice_in_dim(arr, i, 1, axis=axis)
    new = jnp.where(pred, jnp.expand_dims(row, axis).astype(arr.dtype), old)
    return jax.lax.dynamic_update_slice_in_dim(arr, new, i, axis=axis)


def _write_row_b(arr, row, i, pred, axis):
    """Per-sample _write_row: arr (B, ...), row (B, ...), i/pred (B,);
    ``axis`` indexes the PER-SAMPLE array (after stripping the batch dim).
    Each batch slot writes at its own position — the basis of continuous
    batching (slots decode at independent sequence positions)."""
    return jax.vmap(
        lambda a, r, ii, pr: _write_row(a, r, ii, pr, axis=axis)
    )(arr, row, i, pred)


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
    pos,  # int32 absolute position: scalar or per-sample (B,)
):
    """Append each sample's token at its own ``pos`` to the (single-layer)
    cache and compute attention over positions 0..pos. Returns
    (cache_l, out (B, H, Dh)). Per-sample positions make every batch slot an
    independent sequence (continuous batching); the reference is hard-wired
    to batch size 1 (modeling_llama.py:1525)."""
    B = q.shape[0]
    S, Tc = dcfg.sink, dcfg.cache_tokens
    Hkv, Dh = dcfg.n_kv_heads, dcfg.d_head
    G = q.shape[1] // Hkv

    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))
    cos, sin = rope_cos_sin(pos, mcfg)  # (B, Dh)
    in_sink = pos < S  # (B,)
    not_sink = ~in_sink
    p = jnp.clip(pos - S, 0, Tc - 1)  # (B,)

    # ---- append K ----
    k_h = k_new.reshape(B, Hkv, Dh).astype(jnp.float32)
    k_roped = k_h * cos[:, None] + rotate_half(k_h) * sin[:, None]
    k_store = k_roped.reshape(B, Hkv * Dh) if dcfg.post_rope_k else k_new
    codes_k, k_words = quantize_k(k_store, lq, dcfg)

    k_sink = cache_l.k_sink
    v_sink = cache_l.v_sink
    if S > 0:
        k_sink = _write_row_b(k_sink, k_roped, pos, in_sink, axis=1)

    # row-level predication: tokens that went to the sink leave the packed
    # cache untouched (a full-array jnp.where here would copy the whole
    # packed cache every step)
    def _append(planes, codes):
        if dcfg.codes == "nuq":
            return jax.vmap(set_token_codes)(planes, codes, p, not_sink)
        return jax.vmap(set_token_rows)(
            planes, _encode_rows(codes, dcfg), p, not_sink
        )

    k_planes = _append(cache_l.k_planes, codes_k)
    if dcfg.include_sparse:
        kv_out = _write_out_slots(cache_l.kv_out, k_words, p, not_sink, 0)
    else:
        kv_out = cache_l.kv_out

    # ---- scores ----
    q_h = q.reshape(B, Hkv, G, Dh).astype(jnp.float32)
    q_rot = q_h * cos[:, None, None] + rotate_half(q_h) * sin[:, None, None]
    inv = 1.0 / (Dh**0.5)

    cache_tmp = KVCache(
        k_planes=k_planes, v_planes=cache_l.v_planes, kv_out=kv_out,
        v_scale=cache_l.v_scale, v_offset=cache_l.v_offset, k_sink=k_sink,
        v_sink=v_sink, length=cache_l.length,
    )
    if dcfg.kernel == "pallas":
        from .pallas import qk_fused

        assert dcfg.codes == "nuq", "two-pass kernels read bit planes only"
        assert not dcfg.post_rope_k, "two-pass kernels rope in-kernel"
        assert dcfg.k_outliers == "slots", (
            "two-pass kernels decode slot words; use kernel='flash' for "
            "k_outliers='channels'"
        )
        dense = jax.vmap(
            lambda q1, kp1, ow1: qk_fused(
                q1, kp1, ow1, lq.k_range, lq.k_offset, lq.k_lut_dec,
                dcfg, mcfg,
            )
        )(q_rot, k_planes, kv_out)
    else:
        k_full = dequant_k_full(cache_tmp, lq, dcfg)
        if dcfg.post_rope_k:
            kx = k_full  # keys stored post-RoPE: no rotation at score time
        else:
            pos_cache = S + jnp.arange(Tc, dtype=jnp.int32)
            ck, sk = rope_cos_sin(pos_cache, mcfg)  # (Tc, Dh)
            kx = k_full * ck[None, None] + rotate_half_axis(k_full, axis=-1) * sk[None, None]
        dense = jnp.einsum("bhgd,bhtd->bhgt", q_rot, kx)
    dense = dense * inv
    scores = dense
    if S > 0:
        sink_sc = jnp.einsum("bhgd,bhsd->bhgs", q_rot, k_sink) * inv
        scores = jnp.concatenate([sink_sc, dense], axis=-1)  # (B,Hkv,G,S+Tc)

    idx = jnp.arange(S + Tc, dtype=jnp.int32)
    valid = idx[None, :] <= pos[:, None]  # (B, S+Tc)
    if mcfg.sliding_window is not None:
        # Mistral-style local attention over the cached positions
        valid &= idx[None, :] > (pos[:, None] - mcfg.sliding_window)
    scores = jnp.where(valid[:, None, None, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)

    # ---- append V ----
    codes_v, v_words, v_sc, v_off = quantize_v(v_new, lq, dcfg)
    v_h = v_new.reshape(B, Hkv, Dh).astype(jnp.float32)
    if S > 0:
        v_sink = _write_row_b(v_sink, v_h, pos, in_sink, axis=1)
    v_planes = _append(cache_l.v_planes, codes_v)
    v_scale = _write_row_b(cache_l.v_scale, v_sc, p, not_sink, axis=0)
    v_offset = _write_row_b(cache_l.v_offset, v_off, p, not_sink, axis=0)
    if dcfg.include_sparse and v_words is not None:
        kv_out = _write_out_slots(kv_out, v_words, p, not_sink,
                                  dcfg.slots_per_kind)

    new_cache = KVCache(
        k_planes=k_planes, v_planes=v_planes, kv_out=kv_out,
        v_scale=v_scale, v_offset=v_offset,
        k_sink=k_sink, v_sink=v_sink,
        length=pos + 1,
    )

    # ---- weighted values ----
    p_dense = probs[..., S:] if S > 0 else probs
    if dcfg.kernel == "pallas":
        from .pallas import pv_fused

        out = jax.vmap(
            lambda p1, vp1, sc1, of1, ow1: pv_fused(
                p1, vp1, sc1, of1, ow1, lq.v_lut_dec, dcfg
            )
        )(p_dense, v_planes, v_scale, v_offset, kv_out)
    else:
        v_full = dequant_v_full(new_cache, lq, dcfg)
        out = jnp.einsum("bhgt,bhtd->bhgd", p_dense, v_full)
    if S > 0:
        out = out + jnp.einsum("bhgs,bhsd->bhgd", probs[..., :S], v_sink)
    return new_cache, out.reshape(B, Hkv * G, Dh)


# ---------------------------------------------------------------------------
# flash-decode append: row-level writes into the FULL (L, ...) cache arrays
# ---------------------------------------------------------------------------

def append_token_flash(
    arrs: dict,  # full cache arrays, each (L, B, ...)
    lq: DeployedQuant,  # layer-sliced quantizer (this layer's arrays)
    dcfg: DeployConfig,
    mcfg: ModelConfig,
    k_new,  # (B, C) pre-RoPE key projection
    v_new,  # (B, C) value projection
    pos,  # (B,) int32 absolute positions
    li,  # traced scalar layer index
) -> dict:
    """Append one token at layer ``li`` directly into the stacked
    (L, B, ...) cache arrays. Unlike decode_attention's per-layer path, no
    layer cache is ever sliced out: every write is a row-level
    read-modify-write at (li, b, ..., p_b), predicated on the token not
    belonging to the sink prefix.

    If ``pos`` is a SCALAR (every sequence appends at the same position —
    the generate/bench decode loops), each array takes one batch-wide
    dynamic_update_slice, which XLA aliases in place. The per-b (B,) form
    (serving slot pools) vmaps the row writes instead; that lowers to a
    scatter that XLA implements by copying the full array — at B=4/32K
    measured ~14.6 ms/layer of pure copies — so prefer scalar ``pos``
    whenever positions are uniform."""
    from .packing import (
        set_token_codes_at_layer, set_token_codes_at_layer_uniform,
    )

    B = k_new.shape[0]
    S, Tc = dcfg.sink, dcfg.cache_tokens
    Hkv, Dh = dcfg.n_kv_heads, dcfg.d_head

    uniform = jnp.ndim(pos) == 0
    pos0 = jnp.asarray(pos, jnp.int32)
    pos = jnp.broadcast_to(pos0, (B,))
    in_sink = pos < S
    not_sink = ~in_sink
    p = jnp.clip(pos - S, 0, Tc - 1)

    cos, sin = rope_cos_sin(pos, mcfg)  # (B, Dh)
    k_h = k_new.reshape(B, Hkv, Dh).astype(jnp.float32)
    k_roped = k_h * cos[:, None] + rotate_half(k_h) * sin[:, None]
    k_store = k_roped.reshape(B, Hkv * Dh) if dcfg.post_rope_k else k_new
    codes_k, k_words = quantize_k(k_store, lq, dcfg)  # (B,Hkv,D)
    codes_v, v_words, v_sc, v_off = quantize_v(v_new, lq, dcfg)

    if uniform:
        p0 = jnp.clip(pos0 - S, 0, Tc - 1)
        pred = pos0 >= S

        def rmw(arr, new_block, start, prd):
            old = jax.lax.dynamic_slice(arr, start, new_block.shape)
            new = jnp.where(prd, new_block.astype(arr.dtype), old)
            return jax.lax.dynamic_update_slice(arr, new, start)

        def put_planes(planes, codes):
            if dcfg.codes == "nuq":
                return set_token_codes_at_layer_uniform(
                    planes, codes, li, p0, pred
                )
            new = _encode_rows(codes, dcfg)[None, :, :, None, :]
            # (1, B, H', 1, D)
            return rmw(planes, new, (li, 0, 0, p0, 0), pred)

        out = dict(arrs)
        out["k_planes"] = put_planes(arrs["k_planes"], codes_k)
        out["v_planes"] = put_planes(arrs["v_planes"], codes_v)

        if dcfg.include_sparse:
            spk = dcfg.slots_per_kind

            def put_out(arr, words, row0):
                # words (B, n_groups, n) -> (1, B, n_groups, n, 1)
                return rmw(arr, words[None, :, :, :, None],
                           (li, 0, 0, row0, p0), pred)

            kv = put_out(arrs["kv_out"], k_words, 0)
            out["kv_out"] = (
                kv if v_words is None else put_out(kv, v_words, spk)
            )

        out["v_scale"] = rmw(
            arrs["v_scale"], v_sc.reshape(1, B, 1), (li, 0, p0), pred
        )
        out["v_offset"] = rmw(
            arrs["v_offset"], v_off.reshape(1, B, 1), (li, 0, p0), pred
        )

        if S > 0:
            v_h = v_new.reshape(B, Hkv, Dh).astype(jnp.float32)
            ps0 = jnp.clip(pos0, 0, S - 1)
            out["k_sink"] = rmw(
                arrs["k_sink"], k_roped[None, :, :, None, :],
                (li, 0, 0, ps0, 0), pos0 < S,
            )
            out["v_sink"] = rmw(
                arrs["v_sink"], v_h[None, :, :, None, :],
                (li, 0, 0, ps0, 0), pos0 < S,
            )
        return out

    # Per-b positions (serving slot pools): SEQUENTIAL predicated row
    # writes, one dynamic_update_slice chain per array. The earlier vmapped
    # form lowered to an XLA scatter that copies the FULL plane arrays
    # every layer (measured 14.6 ms/layer of pure copies at B=4/32K —
    # NOTES_ROUND2 item #3); a chain of B plain DUS ops aliases in place,
    # exactly like paged.paged_append (two slots never write the same row,
    # so order is irrelevant).
    from .packing import token_word_bit

    bits = dcfg.bits

    def put_planes(planes, codes):
        if dcfg.codes != "nuq":
            codes = _encode_rows(codes, dcfg)

        def one(i, pl_):
            if dcfg.codes == "nuq":
                H_ = pl_.shape[2]
                w, jbit = token_word_bit(p[i])
                jbit = jnp.asarray(jbit, jnp.uint32)
                old = jax.lax.dynamic_slice(
                    pl_, (li, i, 0, 0, w, 0),
                    (1, 1, H_, bits, 1, pl_.shape[-1]),
                )
                rowdata = old.astype(jnp.uint32)
                shifts = jnp.arange(bits, dtype=jnp.uint32).reshape(
                    1, 1, 1, bits, 1, 1
                )
                bitvals = (
                    (codes[i].astype(jnp.uint32)[None, None, :, None, None, :]
                     >> shifts) & 1
                ) << jbit
                new = ((rowdata & ~(jnp.uint32(1) << jbit)) | bitvals).astype(
                    pl_.dtype
                )
                new = jnp.where(not_sink[i], new, old)
                return jax.lax.dynamic_update_slice(
                    pl_, new, (li, i, 0, 0, w, 0)
                )
            old = jax.lax.dynamic_slice(
                pl_, (li, i, 0, p[i], 0),
                (1, 1, pl_.shape[2], 1, pl_.shape[-1]),
            )
            new = codes[i][None, None, :, None, :].astype(pl_.dtype)
            new = jnp.where(not_sink[i], new, old)
            return jax.lax.dynamic_update_slice(
                pl_, new, (li, i, 0, p[i], 0)
            )

        out_p = planes
        for i in range(B):
            out_p = one(i, out_p)
        return out_p

    out = dict(arrs)
    out["k_planes"] = put_planes(arrs["k_planes"], codes_k)
    out["v_planes"] = put_planes(arrs["v_planes"], codes_v)

    if dcfg.include_sparse:
        spk = dcfg.slots_per_kind

        def put_out(arr, words, row0):
            n = words.shape[-1]
            Gp = arr.shape[2]
            o = arr
            for i in range(B):
                old = jax.lax.dynamic_slice(
                    o, (li, i, 0, row0, p[i]), (1, 1, Gp, n, 1)
                )
                new = jnp.where(
                    not_sink[i],
                    words[i][None, None, :, :, None].astype(o.dtype), old,
                )
                o = jax.lax.dynamic_update_slice(
                    o, new, (li, i, 0, row0, p[i])
                )
            return o

        kv = put_out(arrs["kv_out"], k_words, 0)
        out["kv_out"] = kv if v_words is None else put_out(kv, v_words, spk)

    def put_scalar(arr, val):
        o = arr
        for i in range(B):
            old = jax.lax.dynamic_slice(o, (li, i, p[i]), (1, 1, 1))
            new = jnp.where(
                not_sink[i], val[i].reshape(1, 1, 1).astype(o.dtype), old
            )
            o = jax.lax.dynamic_update_slice(o, new, (li, i, p[i]))
        return o

    out["v_scale"] = put_scalar(arrs["v_scale"], v_sc)
    out["v_offset"] = put_scalar(arrs["v_offset"], v_off)

    if S > 0:
        v_h = v_new.reshape(B, Hkv, Dh).astype(jnp.float32)
        ps = jnp.clip(pos, 0, S - 1)

        def put_sink(arr, rows):
            o = arr
            for i in range(B):
                old = jax.lax.dynamic_slice(
                    o, (li, i, 0, ps[i], 0), (1, 1, Hkv, 1, Dh)
                )
                new = jnp.where(
                    in_sink[i], rows[i][None, None, :, None, :], old
                )
                o = jax.lax.dynamic_update_slice(
                    o, new, (li, i, 0, ps[i], 0)
                )
            return o

        out["k_sink"] = put_sink(arrs["k_sink"], k_roped)
        out["v_sink"] = put_sink(arrs["v_sink"], v_h)

    return out


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

    cos, sin = rope_cos_sin(jnp.arange(T0, dtype=jnp.int32), mcfg)  # (T0, Dh)
    k_sink = cache_l.k_sink
    v_sink = cache_l.v_sink
    if S > 0:
        k_s = k[:, :S].reshape(B, S, Hkv, Dh).astype(jnp.float32)
        k_s = k_s * cos[:S, None] + rotate_half(k_s) * sin[:S, None]
        k_sink = k_s.transpose(0, 2, 1, 3)
        v_sink = v[:, :S].reshape(B, S, Hkv, Dh).astype(jnp.float32).transpose(0, 2, 1, 3)

    def place(planes, codes):
        if dcfg.codes != "nuq":
            return _place_codes(planes, codes, 0, dcfg)
        # codes (B, Tp, Hkv, D) -> planes word rows [0 : Tpad/32)
        c = codes.transpose(0, 2, 1, 3)  # (B,Hkv,Tp,D)
        c = jnp.pad(c, ((0, 0),) * 2 + ((0, Tpad - Tp), (0, 0)))
        words = pack_codes(c, dcfg.bits)  # (B,Hkv,bits,Tpad/32,D)
        return jax.lax.dynamic_update_slice_in_dim(planes, words, 0, axis=-2)

    def place_rows(arr, rows):
        return jax.lax.dynamic_update_slice_in_dim(
            arr, rows.astype(arr.dtype), 0, axis=1
        )

    def place_head_rows(arr, rows):
        # rows (B, Tp, Hkv, J) -> arr (B, Hkv, J, Tc) token axis last
        return jax.lax.dynamic_update_slice_in_dim(
            arr, rows.transpose(0, 2, 3, 1).astype(arr.dtype), 0, axis=3
        )

    if dcfg.post_rope_k:
        kh = k.reshape(B, T0, Hkv, Dh).astype(jnp.float32)
        kh = kh * cos[:, None] + rotate_half(kh) * sin[:, None]
        k_store = kh.reshape(B, T0, Hkv * Dh)[:, S:]
    else:
        k_store = k[:, S:]
    codes_k, k_words = quantize_k(k_store, lq, dcfg)
    codes_v, v_words, v_sc, v_off = quantize_v(v[:, S:], lq, dcfg)
    kv_words = None
    if dcfg.include_sparse:
        kv_words = k_words if v_words is None else jnp.concatenate(
            [k_words, v_words], axis=-1
        )

    new_cache = KVCache(
        k_planes=place(cache_l.k_planes, codes_k),
        v_planes=place(cache_l.v_planes, codes_v),
        kv_out=(
            place_head_rows(cache_l.kv_out, kv_words)
            if dcfg.include_sparse else cache_l.kv_out
        ),
        v_scale=place_rows(cache_l.v_scale, v_sc),
        v_offset=place_rows(cache_l.v_offset, v_off),
        k_sink=k_sink,
        v_sink=v_sink,
        length=jnp.full_like(cache_l.length, T0),
    )
    return new_cache


# ---------------------------------------------------------------------------
# block decode: append + attend a whole 128-aligned token block (the basis
# of quantized-trajectory chunked prefill — no reference counterpart; the
# reference's prompt phase is fp16 flash-attn + parallel pack)
# ---------------------------------------------------------------------------

def block_attention(
    cache_l: KVCache,
    lq: DeployedQuant,
    dcfg: DeployConfig,
    mcfg: ModelConfig,
    q,  # (B, Tq, H, Dh) un-roped queries
    k_new,  # (B, Tq, C) pre-RoPE key projections
    v_new,  # (B, Tq, C)
    pos0,  # scalar int32 absolute position of the block's first NON-SINK
           # token; (pos0 - sink) must be 128-aligned
    sink_fill: bool = False,  # True: the first `sink` rows of q/k/v are the
                              # sink tokens (block 0 of a prefill)
):
    """Pack ``Tq`` tokens at once and compute attention for every query in
    the block over cache positions 0..pos0+i (quantized trajectory — each
    query sees the same dequantized values a later decode step would).
    Returns (cache_l, out (B, Tq, H, Dh))."""
    B, Tq_all = q.shape[:2]
    S, Tc = dcfg.sink, dcfg.cache_tokens
    Hkv, Dh = dcfg.n_kv_heads, dcfg.d_head
    G = q.shape[2] // Hkv
    ns = S if sink_fill else 0
    Tq = Tq_all - ns  # packed tokens
    assert Tq % 128 == 0, Tq

    pos0 = jnp.asarray(pos0, jnp.int32)
    positions = (pos0 - ns) + jnp.arange(Tq_all, dtype=jnp.int32)
    cos, sin = rope_cos_sin(positions, mcfg)  # (Tq_all, Dh)

    k_sink, v_sink = cache_l.k_sink, cache_l.v_sink
    if sink_fill and S > 0:
        k_s = k_new[:, :S].reshape(B, S, Hkv, Dh).astype(jnp.float32)
        k_s = k_s * cos[:S, None] + rotate_half(k_s) * sin[:S, None]
        k_sink = k_s.transpose(0, 2, 1, 3)
        v_sink = (
            v_new[:, :S].reshape(B, S, Hkv, Dh).astype(jnp.float32)
            .transpose(0, 2, 1, 3)
        )

    kq, vq = k_new[:, ns:], v_new[:, ns:]
    if dcfg.post_rope_k:
        kh = k_new.reshape(B, Tq_all, Hkv, Dh).astype(jnp.float32)
        kh = kh * cos[:, None] + rotate_half(kh) * sin[:, None]
        kq = kh.reshape(B, Tq_all, Hkv * Dh)[:, ns:]
    codes_k, k_words = quantize_k(kq, lq, dcfg)  # (B,Tq,Hkv,D)
    codes_v, v_words, v_sc, v_off = quantize_v(vq, lq, dcfg)

    p0 = jnp.maximum(pos0 - S, 0)  # packed offset of the block
    w0 = p0 // 32

    def place(planes, codes):
        if dcfg.codes != "nuq":
            return _place_codes(planes, codes, p0, dcfg)
        c = codes.transpose(0, 2, 1, 3)  # (B,Hkv,Tq,D)
        words = pack_codes(c, dcfg.bits)  # (B,Hkv,bits,Tq/32,D)
        return jax.lax.dynamic_update_slice(
            planes, words, (0, 0, 0, w0, 0)
        )

    k_planes = place(cache_l.k_planes, codes_k)
    v_planes = place(cache_l.v_planes, codes_v)
    if dcfg.include_sparse:
        kv_words = k_words if v_words is None else jnp.concatenate(
            [k_words, v_words], axis=-1
        )
        kv_out = jax.lax.dynamic_update_slice(
            cache_l.kv_out,
            kv_words.transpose(0, 2, 3, 1).astype(cache_l.kv_out.dtype),
            (0, 0, 0, p0),
        )
    else:
        kv_out = cache_l.kv_out
    v_scale = jax.lax.dynamic_update_slice(cache_l.v_scale, v_sc, (0, p0))
    v_offset = jax.lax.dynamic_update_slice(cache_l.v_offset, v_off, (0, p0))

    new_cache = KVCache(
        k_planes=k_planes, v_planes=v_planes, kv_out=kv_out,
        v_scale=v_scale, v_offset=v_offset, k_sink=k_sink, v_sink=v_sink,
        length=jnp.full_like(cache_l.length, pos0 + Tq),
    )

    # ---- attention for every query in the block ----
    q_h = q.reshape(B, Tq_all, Hkv, G, Dh).astype(jnp.float32)
    q_rot = q_h * cos[:, None, None] + rotate_half(q_h) * sin[:, None, None]
    q_rot = q_rot.transpose(0, 2, 3, 1, 4)  # (B,Hkv,G,Tq_all,Dh)
    inv = 1.0 / (Dh**0.5)

    if dcfg.kernel in ("flash", "flash_serial"):
        # blockwise online-softmax kernel: per-row causal masking happens
        # in-kernel and nothing of O(Tq x Tc) ever materializes — this is
        # what makes quantized chunked prefill viable at >=256K prompts.
        # (flash_serial is a DECODE-step kernel; its prefill blocks run
        # through the pipelined flash kernel, which overlaps fine there —
        # prefill grid steps are compute-dense.)
        from .pallas.flash_decode import flash_attention

        qf = q_rot.reshape(B, Hkv, G * Tq_all, Dh)
        pos_first = jnp.broadcast_to(positions[0], (B,))
        out = flash_attention(
            qf, new_cache.k_planes[None], new_cache.v_planes[None],
            new_cache.kv_out[None], lq.k_range[None], lq.k_offset[None],
            new_cache.v_scale[None], new_cache.v_offset[None],
            new_cache.k_sink[None], new_cache.v_sink[None],
            lq.k_lut_dec[None], lq.v_lut_dec[None],
            jnp.int32(0), pos_first, dcfg, mcfg,
            # multi-row queries scale the kernel's out/m/l/q VMEM blocks
            # with Q = G*Tq: a smaller token block keeps the folded kernel
            # under the 16MB scoped-VMEM limit at chunk 256
            Tq=Tq_all, block_tokens=512, k_ressc=lq.k_ressc[None],
        ).reshape(B, Hkv, G, Tq_all, Dh)
        out = out.transpose(0, 3, 1, 2, 4).reshape(B, Tq_all, Hkv * G * Dh)
        return new_cache, out

    if dcfg.kernel == "pallas":
        from .pallas import qk_fused

        assert dcfg.codes == "nuq", "two-pass kernels read bit planes only"
        assert not dcfg.post_rope_k, "two-pass kernels rope in-kernel"
        assert dcfg.k_outliers == "slots", (
            "two-pass kernels decode slot words; use kernel='flash' for "
            "k_outliers='channels'"
        )
        qf = q_rot.reshape(B, Hkv, G * Tq_all, Dh)
        dense = jax.vmap(
            lambda q1, kp1, ow1: qk_fused(
                q1, kp1, ow1, lq.k_range, lq.k_offset, lq.k_lut_dec,
                dcfg, mcfg,
            )
        )(qf, k_planes, kv_out).reshape(B, Hkv, G, Tq_all, Tc)
    else:
        k_full = dequant_k_full(new_cache, lq, dcfg)
        if dcfg.post_rope_k:
            kx = k_full
        else:
            pos_cache = S + jnp.arange(Tc, dtype=jnp.int32)
            ck, sk = rope_cos_sin(pos_cache, mcfg)
            kx = k_full * ck[None, None] + rotate_half_axis(k_full, axis=-1) * sk[None, None]
        dense = jnp.einsum("bhgqd,bhtd->bhgqt", q_rot, kx)
    dense = dense * inv
    scores = dense
    if S > 0:
        sink_sc = jnp.einsum("bhgqd,bhsd->bhgqs", q_rot, k_sink) * inv
        scores = jnp.concatenate([sink_sc, dense], axis=-1)

    idx = jnp.arange(S + Tc, dtype=jnp.int32)
    valid = idx[None, :] <= positions[:, None]  # (Tq_all, S+Tc)
    if mcfg.sliding_window is not None:
        valid &= idx[None, :] > positions[:, None] - mcfg.sliding_window
    scores = jnp.where(valid, scores, -jnp.inf)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)

    p_dense = probs[..., S:] if S > 0 else probs
    if dcfg.kernel == "pallas":
        from .pallas import pv_fused

        pf = p_dense.reshape(B, Hkv, G * Tq_all, Tc)
        out = jax.vmap(
            lambda p1, vp1, sc1, of1, ow1: pv_fused(
                p1, vp1, sc1, of1, ow1, lq.v_lut_dec, dcfg
            )
        )(pf, v_planes, v_scale, v_offset, kv_out)
        out = out.reshape(B, Hkv, G, Tq_all, Dh)
    else:
        v_full = dequant_v_full(new_cache, lq, dcfg)
        out = jnp.einsum("bhgqt,bhtd->bhgqd", p_dense, v_full)
    if S > 0:
        out = out + jnp.einsum("bhgqs,bhsd->bhgqd", probs[..., :S], v_sink)
    out = out.transpose(0, 3, 1, 2, 4).reshape(B, Tq_all, Hkv * G * Dh)
    return new_cache, out
