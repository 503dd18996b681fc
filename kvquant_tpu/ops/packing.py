"""Bit-plane packing of quantization codes.

Layout decision (TPU-first, diverges deliberately from the reference): the
reference packs codes of one token's head_dim into int32 words along the
feature axis (cache (H, D/32*bits, max_len), quant_cuda_kernel.cu:1202-1245),
which needs cross-word bit arithmetic for 3-bit and makes the packed feature
dim tiny (12-16 words) — a bad lane dimension for TPU tiling.

Here codes are stored as ``bits`` separate bit-planes packed along the TOKEN
axis: plane b, word w holds bit b of the codes of tokens 32w..32w+31. So the
cache is (..., bits, D, T/32) int32 with the long token axis last (lane
dimension), and

  - any bit width {2,3,4,...} packs at exact density with identical code
  - unpack is branch-free VPU work: broadcast each word over 32 lanes,
    variable right-shift by lane index, mask, weighted-sum the planes
  - a single token's append touches one word column (read-modify-write of
    (..., bits, D, 1)), a static-shape dynamic_update_slice

Bit packing within a word is little-endian: token 32w+j -> bit j.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_codes(codes: jax.Array, bits: int) -> jax.Array:
    """codes (..., T) int32 in [0, 2**bits) with T % 32 == 0
    -> planes (..., bits, T//32) int32."""
    *lead, T = codes.shape
    assert T % 32 == 0, f"token axis must be a multiple of 32, got {T}"
    c = codes.astype(jnp.uint32).reshape(*lead, T // 32, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    planes = []
    for b in range(bits):
        bitvals = (c >> b) & jnp.uint32(1)
        planes.append(jnp.sum(bitvals * weights, axis=-1, dtype=jnp.uint32))
    return jnp.stack(planes, axis=-2).astype(jnp.int32)


def unpack_codes(planes: jax.Array, bits: int) -> jax.Array:
    """planes (..., bits, TW) int32 -> codes (..., 32*TW) int32."""
    *lead, b_dim, TW = planes.shape
    assert b_dim == bits
    words = planes.astype(jnp.uint32)[..., :, :, None]  # (..., bits, TW, 1)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bitvals = (words >> shifts) & jnp.uint32(1)  # (..., bits, TW, 32)
    weights = (jnp.uint32(1) << jnp.arange(bits, dtype=jnp.uint32)).reshape(
        (bits,) + (1,) * 2
    )
    codes = jnp.sum(bitvals * weights, axis=-3, dtype=jnp.uint32)
    return codes.reshape(*lead, 32 * TW).astype(jnp.int32)


def set_token_codes(planes: jax.Array, codes: jax.Array, pos) -> jax.Array:
    """Write one token's codes at packed position ``pos``.

    planes: (..., D, bits, TW) int32; codes: (..., D) int32; pos: scalar.
    Clears then sets bit (pos % 32) of word column pos // 32 — a
    read-modify-write of a (..., D, bits, 1) column that XLA keeps in place
    when the cache buffer is donated.
    """
    bits = planes.shape[-2]
    w = pos // 32
    j = jnp.asarray(pos % 32, jnp.uint32)

    col = jax.lax.dynamic_slice_in_dim(planes, w, 1, axis=-1)  # (...,D,bits,1)
    col = col.astype(jnp.uint32)

    shifts = jnp.arange(bits, dtype=jnp.uint32).reshape(bits, 1)  # (bits, 1)
    bitvals = ((codes.astype(jnp.uint32)[..., None, None] >> shifts) & 1) << j
    col = (col & ~(jnp.uint32(1) << j)) | bitvals
    return jax.lax.dynamic_update_slice_in_dim(
        planes, col.astype(jnp.int32), w, axis=-1
    )
