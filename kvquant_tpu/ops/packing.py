"""Bit-plane packing of quantization codes.

Layout decision (TPU-first, diverges deliberately from the reference): the
reference packs codes of one token's head_dim into int32 words along the
feature axis (cache (H, D/32*bits, max_len), quant_cuda_kernel.cu:1202-1245),
which needs cross-word bit arithmetic for 3-bit and makes the packed feature
dim tiny (12-16 words) — a bad lane dimension for TPU tiling.

Here the packed cache is (..., bits, TW, D) int32 — head_dim last (one full
lane tile), bit-planes packed along the TOKEN axis in 128-token groups:
within group g = t // 128, token t lives in word row ``g*4 + t % 4`` at bit
``(t % 128) // 4``. The mapping is chosen so a Pallas kernel reconstructs a
group's 128 token rows with a single ``pltpu.repeat(words[4, D], 32,
axis=0)`` (tile semantics: row r <- word r % 4) plus a variable right-shift
by ``row // 4`` — branch-free VPU work.

Properties:
  - any bit width {2,3,4,...} packs at exact density with identical code
  - a single token's append touches one word row (read-modify-write of a
    contiguous (..., bits, 1, D) slice), a static-shape dynamic_update_slice
  - Pallas blocks (1, bits, BT/32, D) satisfy the (8, 128) tiling rule
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GROUP = 128  # tokens per packing group (one lane tile)
WPG = 4  # int32 words per group


def token_word_bit(pos):
    """Word row index and bit position of token ``pos``."""
    g = pos // GROUP
    r = pos % GROUP
    return g * WPG + r % WPG, r // WPG


def pack_codes(codes: jax.Array, bits: int) -> jax.Array:
    """codes (..., T, D) int32 in [0, 2**bits) with T % 128 == 0
    -> planes (..., bits, T//32, D) int32."""
    *lead, T, D = codes.shape
    assert T % GROUP == 0, f"token axis must be a multiple of {GROUP}, got {T}"
    # (..., g, j, w, D): token t = g*128 + j*4 + w
    c = codes.astype(jnp.uint32).reshape(
        *lead, T // GROUP, GROUP // WPG, WPG, D
    )
    weights = (jnp.uint32(1) << jnp.arange(GROUP // WPG, dtype=jnp.uint32))
    planes = []
    for b in range(bits):
        bitvals = (c >> b) & jnp.uint32(1)
        words = jnp.sum(
            bitvals * weights[:, None, None], axis=-3, dtype=jnp.uint32
        )  # (..., g, w, D)
        planes.append(words.reshape(*lead, T // 32, D))
    return jnp.stack(planes, axis=-3).astype(jnp.int32)


def unpack_codes(planes: jax.Array, bits: int) -> jax.Array:
    """planes (..., bits, TW, D) int32 -> codes (..., 32*TW, D) int32."""
    *lead, b_dim, TW, D = planes.shape
    assert b_dim == bits and TW % WPG == 0
    words = planes.astype(jnp.uint32).reshape(
        *lead, bits, TW // WPG, 1, WPG, D
    )
    shifts = jnp.arange(GROUP // WPG, dtype=jnp.uint32).reshape(-1, 1, 1)
    bitvals = (words >> shifts) & jnp.uint32(1)  # (..., bits, g, j, w, D)
    weights = (jnp.uint32(1) << jnp.arange(bits, dtype=jnp.uint32)).reshape(
        (bits,) + (1,) * 4
    )
    codes = jnp.sum(bitvals * weights, axis=-5, dtype=jnp.uint32)
    return codes.reshape(*lead, 32 * TW, D).astype(jnp.int32)


def set_token_codes(planes: jax.Array, codes: jax.Array, pos,
                    pred=None) -> jax.Array:
    """Write one token's codes at packed position ``pos``.

    planes: (..., bits, TW, D) int32; codes: (..., D) int32; pos: scalar.
    Clears then sets the token's bit in its word row — a read-modify-write
    of a contiguous (..., bits, 1, D) slice that XLA keeps in place when the
    cache buffer is donated.

    ``pred`` (scalar bool): when False the old row is written back — the
    predication happens at the ROW level. (A caller-side
    ``jnp.where(pred, old_planes, new_planes)`` would materialize a full
    copy of the packed cache every step — measured ~100 MB/step of phantom
    HBM traffic on an 8-layer 32K-context model.)
    """
    bits = planes.shape[-3]
    w, j = token_word_bit(pos)
    j = jnp.asarray(j, jnp.uint32)

    old = jax.lax.dynamic_slice_in_dim(planes, w, 1, axis=-2)  # (...,bits,1,D)
    row = old.astype(jnp.uint32)

    shifts = jnp.arange(bits, dtype=jnp.uint32).reshape(bits, 1, 1)
    bitvals = ((codes.astype(jnp.uint32)[..., None, None, :] >> shifts) & 1) << j
    row = (row & ~(jnp.uint32(1) << j)) | bitvals
    new = row.astype(jnp.int32)
    if pred is not None:
        new = jnp.where(pred, new, old)
    return jax.lax.dynamic_update_slice_in_dim(planes, new, w, axis=-2)


def set_token_codes_at_layer(planes, codes, li, pos, pred=None):
    """Write one token's codes into layer ``li`` of the FULL stacked planes.

    planes: (L, H, bits, TW, D) int32 (single sample); codes: (H, D) int32;
    li/pos: traced scalars; pred: scalar bool (False => no-op row write).
    The read-modify-write touches one (1, H, bits, 1, D) word row — the
    flash-decode path uses this so the caller never has to slice a layer's
    packed cache out of the (L, ...) arrays (a ~6 MB copy per layer/step).
    """
    L, Hh, bits, TW, D = planes.shape
    w, j = token_word_bit(pos)
    j = jnp.asarray(j, jnp.uint32)
    old = jax.lax.dynamic_slice(planes, (li, 0, 0, w, 0), (1, Hh, bits, 1, D))
    row = old.astype(jnp.uint32)
    shifts = jnp.arange(bits, dtype=jnp.uint32).reshape(1, 1, bits, 1, 1)
    bitvals = (
        (codes.astype(jnp.uint32)[None, :, None, None, :] >> shifts) & 1
    ) << j
    row = (row & ~(jnp.uint32(1) << j)) | bitvals
    new = row.astype(planes.dtype)
    if pred is not None:
        new = jnp.where(pred, new, old)
    return jax.lax.dynamic_update_slice(planes, new, (li, 0, 0, w, 0))


def set_token_codes_at_layer_uniform(planes, codes, li, pos, pred=None):
    """Batched variant of set_token_codes_at_layer for a position UNIFORM
    across the batch: planes (L, B, H, bits, TW, D), codes (B, H, D),
    li/pos traced scalars, pred scalar bool. One dynamic_update_slice over
    the whole batch — XLA aliases it in place, whereas a vmap of per-b
    writes lowers to a scatter that copies the full planes array every
    layer (measured 3.7 ms per plane array per layer at B=4, 32K ctx)."""
    L, B, Hh, bits, TW, D = planes.shape
    w, j = token_word_bit(pos)
    j = jnp.asarray(j, jnp.uint32)
    old = jax.lax.dynamic_slice(
        planes, (li, 0, 0, 0, w, 0), (1, B, Hh, bits, 1, D)
    )
    row = old.astype(jnp.uint32)
    shifts = jnp.arange(bits, dtype=jnp.uint32).reshape(1, 1, 1, bits, 1, 1)
    bitvals = (
        (codes.astype(jnp.uint32)[None, :, :, None, None, :] >> shifts) & 1
    ) << j
    row = (row & ~(jnp.uint32(1) << j)) | bitvals
    new = row.astype(planes.dtype)
    if pred is not None:
        new = jnp.where(pred, new, old)
    return jax.lax.dynamic_update_slice(planes, new, (li, 0, 0, 0, w, 0))


# ---------------------------------------------------------------------------
# hardware intN code storage (DeployConfig.codes "int4"/"int8")
#
# Codes live directly at (..., Tc, D) in a signed int4/int8 array — the long
# token axis on sublanes, head_dim (one full lane tile) on lanes. No bit
# arithmetic anywhere: store = subtract-bias + convert, load = convert +
# add-bias, and the Pallas kernels dequantize with ONE convert + fma per
# element (vs ~19 VPU ops for the bit-plane mux tree). This is the v5e
# fast path: the machine runs ~2.1 VPU ops per HBM byte, so mux dequant is
# VPU-bound ~5x over the fp16 baseline's bandwidth cost while affine
# dequant is not. Bit widths below the container width still clamp to the
# codebook range at encode time; density is the container's (int4: 0.5
# B/elem — equal to 4-bit planes; the sub-4-bit widths keep "nuq" storage
# for exact density).
# ---------------------------------------------------------------------------


def store_codes_int(codes, bits: int, dtype):
    """Unsigned codes (int32, [0, 2**bits)) -> signed container values."""
    return (codes.astype(jnp.int32) - (1 << (bits - 1))).astype(dtype)


def load_codes_int(arr, bits: int):
    """Signed container values -> unsigned int32 codes."""
    return arr.astype(jnp.int32) + (1 << (bits - 1))


def set_token_codes_int(arr, codes, pos, bits: int, pred=None):
    """Write one token's codes at packed position ``pos`` of an intN array.

    arr: (..., Tc, D) intN; codes: (..., D) int32 unsigned; pos scalar.
    Row-level predicated read-modify-write (same contract as
    set_token_codes: a caller-side jnp.where would copy the whole cache).
    """
    pos = jnp.clip(pos, 0, arr.shape[-2] - 1)
    old = jax.lax.dynamic_slice_in_dim(arr, pos, 1, axis=-2)
    new = store_codes_int(codes[..., None, :], bits, arr.dtype)
    if pred is not None:
        new = jnp.where(pred, new, old)
    return jax.lax.dynamic_update_slice_in_dim(arr, new, pos, axis=-2)


def set_token_codes_int_at_layer(arr, codes, li, pos, bits: int, pred=None):
    """Write one token's codes into layer ``li`` of the FULL stacked array.

    arr: (L, H, Tc, D) intN (single sample); codes: (H, D) int32 unsigned;
    li/pos traced scalars; pred scalar bool (False => no-op row write).
    """
    L, Hh, Tc, D = arr.shape
    pos = jnp.clip(pos, 0, Tc - 1)
    old = jax.lax.dynamic_slice(arr, (li, 0, pos, 0), (1, Hh, 1, D))
    new = store_codes_int(codes[None, :, None, :], bits, arr.dtype)
    if pred is not None:
        new = jnp.where(pred, new, old)
    return jax.lax.dynamic_update_slice(arr, new, (li, 0, pos, 0))


def place_codes_int(arr, codes, p0, bits: int):
    """Write a whole aligned token block: arr (..., H, Tc, D) intN, codes
    (..., T, H, D) int32 unsigned, block start ``p0`` on the token axis."""
    c = jnp.moveaxis(codes, -3, -2)  # (..., H, T, D)
    start = (0,) * (arr.ndim - 2) + (p0, 0)
    return jax.lax.dynamic_update_slice(
        arr, store_codes_int(c, bits, arr.dtype), start
    )


# ---------------------------------------------------------------------------
# int4x2: exact-density 2-bit codes, TWO per int4 element via HEAD PAIRING
#
# Adjacent kv heads (2j, 2j+1) share one (Tc, D) int4 array; element value
# s = c_even + 4*c_odd - 8 (c unsigned in [0, 4), s in the int4 range
# [-8, 7]). Both digits of an element are produced by the SAME token append
# (a token carries codes for every head), so writes never read-modify-write
# across appends. The flash kernel unpacks a pair with one convert + one
# fma + one floor; the even head's codes are never materialized — its
# score/output contractions distribute over x - 4*c_odd on the MXU
# (ops/pallas/flash_decode.py). This is the storage mode that makes the
# reference's flagship 2-bit claim (1M context on one device at usable
# speed, README.md:12) hold on TPU: 2-bit memory density with intN-class
# dequant cost instead of the ~12-VPU-op bit-plane mux tree.
# ---------------------------------------------------------------------------


def pair_codes_int4x2(codes):
    """Unsigned 2-bit codes (..., H, D) (head axis -2) -> (..., H//2, D)
    int4 container values c_even + 4*c_odd - 8."""
    c = codes.astype(jnp.int32)
    return (c[..., 0::2, :] + 4 * c[..., 1::2, :] - 8).astype(jnp.int4)


def unpair_codes_int4x2(arr):
    """(..., H//2, Tc, D) int4 (head axis -3) -> (..., H, Tc, D) int32
    unsigned codes, heads re-interleaved."""
    x = arr.astype(jnp.int32) + 8  # c_even + 4*c_odd in [0, 16)
    ce = x & 3
    co = x >> 2
    st = jnp.stack([ce, co], axis=-3)  # (..., H//2, 2, Tc, D)
    return st.reshape(*arr.shape[:-3], -1, *arr.shape[-2:])


def set_token_rows(arr, rows, pos, pred=None):
    """Write one token's already-encoded container rows at position ``pos``.

    arr: (..., Tc, D); rows: (..., D) in the container dtype (or castable).
    Row-level predicated read-modify-write (same contract as
    set_token_codes_int)."""
    pos = jnp.clip(pos, 0, arr.shape[-2] - 1)
    old = jax.lax.dynamic_slice_in_dim(arr, pos, 1, axis=-2)
    new = rows[..., None, :].astype(arr.dtype)
    if pred is not None:
        new = jnp.where(pred, new, old)
    return jax.lax.dynamic_update_slice_in_dim(arr, new, pos, axis=-2)


def set_token_rows_at_layer(arr, rows, li, pos, pred=None):
    """Write one token's encoded rows into layer ``li`` of the FULL stacked
    array: arr (L, H', Tc, D); rows (H', D); li/pos traced scalars."""
    L, Hh, Tc, D = arr.shape
    pos = jnp.clip(pos, 0, Tc - 1)
    old = jax.lax.dynamic_slice(arr, (li, 0, pos, 0), (1, Hh, 1, D))
    new = rows[None, :, None, :].astype(arr.dtype)
    if pred is not None:
        new = jnp.where(pred, new, old)
    return jax.lax.dynamic_update_slice(arr, new, (li, 0, pos, 0))


def place_codes_int4x2(arr, codes, p0):
    """Write a whole aligned token block of paired codes: arr
    (..., H//2, Tc, D) int4, codes (..., T, H, D) int32 unsigned."""
    c = jnp.moveaxis(pair_codes_int4x2(codes), -3, -2)  # (..., H//2, T, D)
    start = (0,) * (arr.ndim - 2) + (p0, 0)
    return jax.lax.dynamic_update_slice(arr, c, start)


# ---------------------------------------------------------------------------
# outlier word encoding
# ---------------------------------------------------------------------------

# An outlier slot is ONE fp32 word: the residual value with its low 9
# mantissa bits replaced by a (head-in-group, dim) index — bit layout
# ``head_in_group << 7 | dim`` (d_head <= 128, head groups of up to 4 kv
# heads share one slot tile). Value precision loss is <= 2^-14 relative —
# still better than the reference's fp16 outlier storage — and the single
# fp32 array keeps the TPU layout dense: slots live on the 8-sublane axis
# of a (..., J, Tc) array (J a multiple of 8), with the long token axis on
# lanes. A separate small-last-dim index array would be lane-padded 16-64x
# by TPU tiling (measured: +460 MB/step of phantom HBM traffic at 32K
# context). Head grouping (DeployConfig.head_group) divides the outlier
# array's bytes AND its kernel read traffic by the group size: the
# reference stores a GLOBAL 42-slot row per token (modeling_llama.py:
# 396-397); per-head tiles cost 4x more bytes than that, per-4-head-group
# tiles come in BELOW it while keeping the array head-shardable.

OUTLIER_DIM_MASK = 0x7F     # low 7 bits: dim within the head
OUTLIER_IDX_MASK = 0x1FF    # full 9-bit (head_in_group, dim) field


def encode_outlier_words(vals, idx):
    """(vals fp32, idx int32 = head_in_group << 7 | dim) -> fp32 words."""
    bits = jax.lax.bitcast_convert_type(
        vals.astype(jnp.float32), jnp.uint32
    )
    word = (bits & jnp.uint32(~OUTLIER_IDX_MASK & 0xFFFFFFFF)) | (
        idx.astype(jnp.uint32) & jnp.uint32(OUTLIER_IDX_MASK)
    )
    return jax.lax.bitcast_convert_type(word, jnp.float32)


def decode_outlier_words(words):
    """fp32 words -> (vals fp32, idx int32 = head_in_group << 7 | dim).
    Zero-padded slots decode to (~0.0, 0): the value keeps a harmless
    sub-denormal magnitude of the index bits' worth."""
    u = jax.lax.bitcast_convert_type(words, jnp.uint32)
    idx = (u & jnp.uint32(OUTLIER_IDX_MASK)).astype(jnp.int32)
    vals = jax.lax.bitcast_convert_type(
        u & jnp.uint32(~OUTLIER_IDX_MASK & 0xFFFFFFFF), jnp.float32
    )
    return vals, idx
