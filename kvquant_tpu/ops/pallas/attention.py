"""Pallas TPU kernels: fused dequant + RoPE + QK^T and fused score*V over the
packed bit-plane KV cache.

TPU-native equivalents of the reference CUDA kernels
  vecquantNmatmul_nuq_perchannel_transposed_rope_mha_batched_fused_opt2
  (quant_cuda_kernel.cu:3040-3209: shared-mem LUT dequant + on-the-fly RoPE
  + matvec) and the value-side *_fused_opt kernels (:3211+).

Design (vs the CUDA formulation):
  - the packed cache never leaves HBM undequantized: each grid step DMAs a
    (bits, BT/32, D) block of int32 bit-planes into VMEM (the compressed
    bytes are the only HBM traffic for the cache), unpacks on the VPU with
    shift/mask arithmetic, dequantizes via a mux tree on the bit masks (a
    gather would serialize), applies RoPE analytically from the block's
    absolute positions, and contracts on the MXU in bf16 with fp32
    accumulation.
  - atomicAdd accumulation (CUDA) becomes sequential grid accumulation into
    the output block (PV kernel revisits its (G, D) output for every token
    block of one head).
  - the per-token V LUT of the reference ((max_len, 2^bits) fp32,
    modeling_llama.py:1011) is factored as lut * scale[t] + offset[t]:
    scale folds into the probability tile before the MXU dot and offset
    contributes sum_t p[t]*offset[t] to every output dim.

Sparse outliers are applied IN-kernel from the merged encoded word array
(the reference launches a separate SPMV kernel); attention sinks are the
caller's concern (ops/deployed.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


GROUP = 128  # tokens per packing group (see ops/packing.py layout docs)
WPG = 4


def _unpack_dequant_block(words_u32, lut_ref, bits: int, D: int, BT: int):
    """(bits, BT//32, D) uint32 bit-planes -> (BT, D) fp32 dequantized.

    Per 128-token group: token row r holds word r % 4 (pltpu.repeat tile
    semantics along sublanes) shifted right by r // 4 — the packing layout
    is designed for exactly this reconstruction. The 2^bits-entry LUT is
    evaluated as a mux tree directly on the bit masks (2^bits - 1 selects,
    no code assembly, no compares) — the kernel is VPU-bound, so every
    per-element op matters.
    """
    # sign-bit expansion: bit r//4 of the word == sign of (word << 31-r//4)
    # — 2 VPU ops per plane element vs the 3-op shift/and/compare chain
    lshift = 31 - (
        jax.lax.broadcasted_iota(jnp.int32, (GROUP, D), 0) // WPG
    )
    groups = []
    for g in range(BT // GROUP):
        masks = []
        for b in range(bits):
            w = pltpu.repeat(
                words_u32[b, g * WPG:(g + 1) * WPG, :], GROUP // WPG, axis=0
            )
            masks.append((pltpu.bitcast(w, jnp.int32) << lshift) < 0)
        # mux tree: level b selects between subtrees on bit b (LSB first at
        # the leaves)
        vals = [lut_ref[i] for i in range(2 ** bits)]
        level = vals
        for b in range(bits):
            level = [
                jnp.where(masks[b], level[2 * i + 1], level[2 * i])
                for i in range(len(level) // 2)
            ]
        groups.append(level[0])
    return groups[0] if len(groups) == 1 else jnp.concatenate(groups, axis=0)


def _rope_block(D: int, BT: int, t0, sink: int, theta: float, scaling: float):
    """cos/sin (BT, D) for cache block starting at packed index t0.
    Absolute position of packed index t is sink + t. Angles repeat per half
    (HF rotate-half convention), so the transcendentals — the kernel's
    dominant VPU cost — run on (BT, D/2) and are concatenated."""
    half = D // 2
    d = jax.lax.broadcasted_iota(jnp.int32, (BT, half), 1)
    t = jax.lax.broadcasted_iota(jnp.int32, (BT, half), 0) + t0
    inv_freq = theta ** (-d.astype(jnp.float32) * 2.0 / D)
    ang = ((sink + t).astype(jnp.float32) / scaling) * inv_freq
    c, s = jnp.cos(ang), jnp.sin(ang)
    return (
        jnp.concatenate([c, c], axis=1),
        jnp.concatenate([s, s], axis=1),
    )


def _pick_bt(Tc: int, block_tokens: int) -> int:
    BT = min(block_tokens, Tc)
    while Tc % BT:
        BT //= 2
    # >= 8 word rows per block: the Mosaic (8, 128) sublane/lane tile rule
    assert BT % 256 == 0, (Tc, block_tokens)
    return BT


# ---------------------------------------------------------------------------
# fused dequant + RoPE + QK^T (+ in-VMEM sparse outlier application — the
# reference's separate SPMV_ATOMIC_ROPE_BALANCED launch, fused)
# ---------------------------------------------------------------------------


def _outlier_addend_block(ow, D: int, BT: int, cos=None, sin=None,
                          hg: int = 1, hsel=None):
    """Build the dense (BT, D) addend of this block's outliers in VMEM
    (never touches HBM). ow: (J, BT) encoded fp32 words (residual value
    bits | 9-bit head_in_group<<7|dim field, ops/packing.py) — one
    transpose puts slots on lanes, then value/index unpack is bitmasks.
    With head grouping, slots whose head field != ``hsel`` are zeroed.

    With cos/sin (the dense path's (BT, D) RoPE tiles), the addend lands
    already rotated: val*cos at its dim and sign*val*sin at its rotate-half
    partner dim. No per-slot transcendentals are needed — RoPE angles repeat
    per half, so masking the dense cos/sin tiles with the dim / partner
    one-hots extracts exactly cos(theta_j) / sin(theta_j) at the right
    columns.
    """
    J = ow.shape[0]
    half = D // 2
    w = jnp.transpose(ow)  # (BT, J)
    u = pltpu.bitcast(w, jnp.uint32)
    oi = (u & jnp.uint32(0x7F)).astype(jnp.int32)
    ov = pltpu.bitcast(u & jnp.uint32(0xFFFFFE00), jnp.float32)
    if hg > 1:
        hig = ((u >> 7) & jnp.uint32(0x3)).astype(jnp.int32)
        ov = jnp.where(hig == hsel, ov, 0.0)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (BT, D), 1)
    M = jnp.zeros((BT, D), jnp.float32)
    for j in range(J):
        dj = oi[:, j:j + 1]  # (BT, 1)
        vj = ov[:, j:j + 1]
        ohd = (iota_d == dj).astype(jnp.float32)
        if cos is None:
            M += vj * ohd
            continue
        sgn = jnp.where(dj < half, 1.0, -1.0)
        pj = jnp.where(dj < half, dj + half, dj - half)
        ohp = (iota_d == pj).astype(jnp.float32)
        M += vj * (cos * ohd + sgn * (sin * ohp))
    return M


def _qk_kernel(q_ref, planes_ref, ow_ref, rng_ref, off_ref, lut_ref,
               out_ref, *, bits, D, BT, K, sink, theta, scaling, sparse, spk,
               dot_bf16, hg):
    h = pl.program_id(0)
    hsel = h % hg if hg > 1 else None
    tb = pl.program_id(1)
    words = planes_ref[0].astype(jnp.uint32)  # (bits, BT//32, D)
    k = _unpack_dequant_block(words, lut_ref, bits, D, BT)  # (BT, D)
    k = k * rng_ref[0] + off_ref[0]  # (1, D) ranges broadcast over BT

    cos, sin = _rope_block(D, BT, tb * BT, sink, theta, scaling)
    half = D // 2
    k_rot = jnp.concatenate([-k[:, half:], k[:, :half]], axis=1)
    kx = k * cos + k_rot * sin  # (BT, D)

    if sparse:
        kx += _outlier_addend_block(ow_ref[0, :spk], D, BT, cos, sin,
                                    hg, hsel)

    # bf16 dot inputs, fp32 accumulation: the MXU runs fp32 matmuls at a
    # fraction of its bf16 rate; the reference's CUDA kernels likewise
    # contract fp16 inputs with fp32 accumulators
    ct = jnp.bfloat16 if dot_bf16 else jnp.float32
    out_ref[0] = jax.lax.dot_general(
        q_ref[0].astype(ct), kx.astype(ct),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (G, BT)


def qk_fused(q_rot, k_planes, kv_out, k_range, k_offset, lut, dcfg,
             mcfg, block_tokens: int = 1024):
    """scores (Hkv, G, Tc) = q_rot (Hkv, G, D) . rope(dequant + outliers).

    k_planes: (Hkv, bits, TW, D) int32; kv_out: (Hkv, J, Tc) merged encoded
    outlier words (K slots first); k_range/k_offset: (Hkv, D); lut:
    (2**bits,) fp32 sorted. Unscaled scores (caller applies 1/sqrt(D) and
    validity masking). Single-batch: vmap for B > 1.
    """
    Hkv, G, D = q_rot.shape
    bits = dcfg.bits
    TW = k_planes.shape[-2]
    Tc = TW * 32
    BT = _pick_bt(Tc, block_tokens)
    K = 2 ** bits
    J = kv_out.shape[-2] if kv_out is not None else 0
    sparse = dcfg.include_sparse and J > 0
    hg = dcfg.head_group
    if not sparse:
        kv_out = jnp.zeros((Hkv // hg, 8, Tc), jnp.float32)
        J = 8

    kern = functools.partial(
        _qk_kernel, bits=bits, D=D, BT=BT, K=K, sink=dcfg.sink,
        theta=mcfg.rope_theta, scaling=mcfg.rope_scaling, sparse=sparse,
        spk=dcfg.slots_per_kind, dot_bf16=dcfg.dot_bf16, hg=hg,
    )
    grid = (Hkv, Tc // BT)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, G, D), lambda h, t: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bits, BT // 32, D), lambda h, t: (h, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J, BT), lambda h, t, _hg=hg: (h // _hg, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda h, t: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda h, t: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, G, BT), lambda h, t: (h, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hkv, G, Tc), jnp.float32),
        interpret=_interpret(),
    )(
        q_rot.astype(jnp.float32),
        k_planes,
        kv_out,
        k_range.astype(jnp.float32)[:, None, :],
        k_offset.astype(jnp.float32)[:, None, :],
        lut.astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# fused score * V
# ---------------------------------------------------------------------------


def _pv_kernel(p_ref, planes_ref, ow_ref, sc_ref, off_ref, lut_ref,
               out_ref, *, bits, D, BT, K, sparse, spk, dot_bf16, hg):
    h = pl.program_id(0)
    hsel = h % hg if hg > 1 else None
    tb = pl.program_id(1)
    words = planes_ref[0].astype(jnp.uint32)
    deq = _unpack_dequant_block(words, lut_ref, bits, D, BT)  # (BT, D)

    p = p_ref[0]  # (G, BT)
    ps = p * sc_ref[0]  # scale folded into probabilities, (G, BT)
    ct = jnp.bfloat16 if dot_bf16 else jnp.float32
    tile = jax.lax.dot_general(
        ps.astype(ct), deq.astype(ct),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (G, D)
    # per-token offset contributes to every output dim
    tile = tile + jnp.sum(p * off_ref[0], axis=1, keepdims=True)

    if sparse:
        M = _outlier_addend_block(ow_ref[0, spk:], D, BT, hg=hg, hsel=hsel)
        tile += jax.lax.dot_general(
            p.astype(ct), M.astype(ct),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(tb == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] += tile


def pv_fused(probs, v_planes, v_scale, v_offset, kv_out, lut, dcfg,
             block_tokens: int = 1024):
    """out (Hkv, G, D) = probs (Hkv, G, Tc) . (dequant(v_planes) + outliers).

    v_planes: (Hkv, bits, TW, D); v_scale/v_offset: (Tc,) per-token range;
    kv_out: (Hkv, J, Tc) merged encoded outlier words (V slots last). probs
    must already be zero at invalid positions. Single-batch.
    """
    Hkv, G, Tc = probs.shape
    D = v_planes.shape[-1]
    bits = dcfg.bits
    BT = _pick_bt(Tc, block_tokens)
    K = 2 ** bits
    J = kv_out.shape[-2] if kv_out is not None else 0
    sparse = dcfg.include_sparse and J > 0
    hg = dcfg.head_group
    if not sparse:
        kv_out = jnp.zeros((Hkv // hg, 8, Tc), jnp.float32)
        J = 8

    kern = functools.partial(
        _pv_kernel, bits=bits, D=D, BT=BT, K=K, sparse=sparse,
        spk=dcfg.slots_per_kind, dot_bf16=dcfg.dot_bf16, hg=hg,
    )
    grid = (Hkv, Tc // BT)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, G, BT), lambda h, t: (h, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bits, BT // 32, D), lambda h, t: (h, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J, BT), lambda h, t, _hg=hg: (h // _hg, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT), lambda h, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT), lambda h, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, G, D), lambda h, t: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hkv, G, D), jnp.float32),
        interpret=_interpret(),
    )(
        probs.astype(jnp.float32),
        v_planes,
        kv_out,
        v_scale.astype(jnp.float32)[None, :],
        v_offset.astype(jnp.float32)[None, :],
        lut.astype(jnp.float32),
    )
