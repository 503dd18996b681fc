"""Quantized KV cache: a functional pytree of static-shape arrays.

Replaces the reference's stateful QuantK/QuantV modules (deployment
modeling_llama.py:352/:978). Per layer (all arrays carry leading (L, B)):

  k_planes / v_planes : (L,B,Hkv,bits,TW,D) int32   bit-plane packed codes,
                        head_dim last (TW = cache_tokens/32 word rows; see
                        ops/packing.py for the group layout)
  kv_out              : (L,B,Hkv,J,Tc) fp32         fixed per-(token,
                        kv-head) budget outliers for K (slots [0, J/2)) and
                        V (slots [J/2, J)), each slot ONE fp32 word encoding
                        (residual value, in-head dim) — see ops/packing.py
                        encode_outlier_words. The TPU-native restructuring
                        of the reference's global 42-slot rows
                        (modeling_llama.py:396-397): kernel work scales with
                        the per-head slot count, the array shards over heads
                        with the packed cache, and the single merged
                        (J=8-sublane, token-lane) array is exactly one tile
                        high — zero padding (separate K/V or value/index
                        arrays would be tile-padded 2-64x)
  v_scale / v_offset  : (L,B,Tc) fp32               per-token V range — the
                        expanded (max_len, 2**bits) LUT of the reference
                        (:1011) is reconstructed from these 2 scalars + the
                        global normalized LUT, saving 8x LUT memory
  k_sink / v_sink     : (L,B,Hkv,S,D) fp32          attention-sink prefix
                        kept exact; K stored post-RoPE (positions are fixed),
                        V raw — reference kcache_fp16/vcache_fp16 (:1464-1466)
  length              : (B,) int32                  tokens present (incl sink)

The packed caches hold positions S..S+Tc-1; absolute position p maps to
packed index p - S (the reference's klen - first_few_fp16 bookkeeping,
modeling_llama.py:679).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from .quant.outliers import outlier_budget_per_side


@dataclass(frozen=True)
class DeployConfig:
    """Static deployment scheme parameters."""

    bits: int
    n_kv_heads: int
    d_head: int
    max_len: int  # total context capacity incl. sink tokens
    cap_per_side: int  # outlier slots per side per token PER HEAD GROUP
    head_group: int = 1  # kv heads sharing one outlier slot tile (1, 2, 4)
    sink: int = 5  # first_few_fp16
    sparsity_threshold: float = 0.99
    include_sparse: bool = True
    kernel: str = "xla"  # "xla" (reference datapath) or "pallas" (fused)
    v_range_exclude: int = 21  # global extremes/side excluded from V range
    dot_bf16: bool = True  # bf16 MXU contractions in the fused kernels
    #   (fp32 accumulate — the same input precision class as the
    #   reference's fp16 CUDA matmuls; fp32 inputs run the MXU at a
    #   fraction of rate). Set False for bit-level kernel-vs-XLA tests.
    codes: str = "nuq"  # code STORAGE format:
    #   "nuq"  — bit-plane packed int32 words + LUT mux-tree dequant
    #            (any codebook; exact density at any bit width)
    #   "int4" — hardware int4 array + affine dequant (convert + fma).
    #            Requires an AFFINE codebook ("uniform" calibration mode;
    #            the reference's own tables show int4-sparse ~= nuq4-sparse,
    #            quant/README.md). The TPU-native fast path: dequant is
    #            ~2-4 VPU ops/element vs ~19 for the mux tree — on v5e
    #            (~2.1 VPU ops per HBM byte) that is the difference between
    #            VPU-bound 0.4x and beating the fp16 baseline. bits <= 4.
    #   "int8" — same affine path in an int8 container (bits <= 8); robust
    #            fallback where int4 tiling is unsupported, 2x compression.
    #   "int4x2" — EXACT-density 2-bit storage: TWO 2-bit codes per int4
    #            element via HEAD PAIRING (kv heads 2j, 2j+1 share one
    #            (Tc, D) int4 array; stored value = c_even + 4*c_odd - 8).
    #            Affine codebook only. The flash kernel unpacks a pair
    #            with one convert + one fma + one floor, and the even
    #            head's codes are never materialized (its score/output
    #            dots distribute over x - 4*c_odd on the MXU) — ~1.5 VPU
    #            ops per element vs ~12 for the 2-bit mux tree. This is
    #            what makes 512K-1M contexts decode at usable speed on one
    #            chip (the reference's flagship 2-bit claim, README.md:12)
    #            while fitting the 2-bit memory budget. Requires bits == 2
    #            and an even n_kv_heads (the flash kernel also needs an
    #            even head_group).
    page_tokens: int = 1024  # paged-pool page size (kvquant_tpu.paged):
    #   tokens per page == the flash kernel's token block when paging.
    #   Multiple of 256; 1024 is the measured VMEM sweet spot on v5e.
    k_outliers: str = "slots"  # K-side outlier storage:
    #   "slots"    — per-token fixed-budget encoded words (cap_per_side per
    #                side per head group), the reference-faithful scheme:
    #                the kernel densifies each slot with a one-hot build
    #                (~3 VPU ops/slot/element — measured to DOMINATE the
    #                whole decode step once dequant is cheap).
    #   "channels" — TPU-native: n_kc STATIC channels per (layer, head
    #                group), chosen at calibration time by expected residual
    #                energy (KVQuant's own observation that K outliers are
    #                channel-consistent, paper §3.1). The full residual
    #                x - dequant is stored DENSELY for those channels as
    #                plain fp32 rows of kv_out (reconstruction there is
    #                EXACT), and the kernel applies them with two small MXU
    #                contractions against a per-layer one-hot selection
    #                matrix — zero per-token VPU densification work, no
    #                index bits, no append-time top-k for K.
    #                V outliers stay per-token slots (cap_per_side; 0 turns
    #                them off — per-token V scale/offset already absorbs
    #                token-level spikes).
    n_kc: int = 4  # static K channels per head group ("channels" mode)
    post_rope_k: bool = False  # store keys POST-rotary. The reference
    #   quantizes pre-RoPE (per-channel distributions are cleaner there);
    #   post-RoPE storage lets the deployed kernel skip the per-element
    #   rotation entirely — the TPU speed mode. Calibration must then fit
    #   on roped activations (quant.calibration.rope_k_activations) and the
    #   quantizer artifact should carry meta["post_rope_k"]=True.

    def __post_init__(self):
        assert self.codes in ("nuq", "int4", "int8", "int4x2"), self.codes
        assert self.k_outliers in ("slots", "channels"), self.k_outliers
        if self.codes == "int4":
            assert self.bits <= 4, "int4 container holds <= 4-bit codes"
        if self.codes == "int8":
            assert self.bits <= 8
        if self.codes == "int4x2":
            assert self.bits == 2, "int4x2 packs exactly two 2-bit codes"
            assert self.n_kv_heads % 2 == 0, "int4x2 pairs adjacent kv heads"

    @property
    def code_dtype(self):
        import jax.numpy as _jnp

        return {
            "int4": _jnp.int4, "int8": _jnp.int8, "int4x2": _jnp.int4,
        }[self.codes]

    @property
    def code_bias(self) -> int:
        """Offset between the code the dequant kernels see and the unsigned
        codebook index. int4/int8 store signed (code - 2**(bits-1)); int4x2
        unpacks straight back to unsigned codes (the -8 container bias is
        handled inside the pair encoding), so its bias is 0."""
        if self.codes == "int4x2":
            return 0
        return 1 << (self.bits - 1)

    @property
    def kv_hidden(self) -> int:
        return self.n_kv_heads * self.d_head

    @property
    def cache_tokens(self) -> int:
        """Packed-cache capacity. Multiple of 256 (Pallas token blocks need
        >= 8 word rows — the (8, 128) sublane/lane tile — and one word row
        packs 32 tokens); long caches round to 2048 so the kernels can use
        full-size token blocks (grid-step overhead dominates otherwise)."""
        t = self.max_len - self.sink
        unit = 2048 if t > 4096 else 256
        return ((t + unit - 1) // unit) * unit

    @property
    def n_groups(self) -> int:
        """Outlier head groups: ``head_group`` kv heads share one slot tile
        (the cap budget pools over the group's head_group*d_head dims).
        Bytes and kernel read traffic for outliers scale with 1/head_group;
        at head_group=4 the per-token outlier bytes drop BELOW the
        reference's global 42-slot rows while staying head-shardable."""
        assert self.n_kv_heads % self.head_group == 0, (
            self.n_kv_heads, self.head_group
        )
        return self.n_kv_heads // self.head_group

    @property
    def n_slots(self) -> int:
        """Total outlier rows per (token, head group) in the merged (J, Tc)
        array — K rows first, then V rows.

        "slots" mode: 2*cap_per_side encoded words per kind.
        "channels" mode: n_kc dense K residual rows + 2*cap_per_side V slot
        words (n_kc=4, cap=2 fills an 8-row fp32 tile exactly — the same
        bytes as the default slots layout).

        NOT padded to the 8-sublane tile: a Pallas block must either be
        8-divisible in its second-minor dim or cover the WHOLE array dim,
        so capped configs (e.g. channels+cap0 => 4 rows) keep the array at
        its live row count and the kernels read full-dim blocks — halving
        outlier DMA traffic vs an 8-padded layout. (Minimum 1 row so the
        array/block stay well-formed when outliers are disabled.)"""
        if self.k_outliers == "channels":
            raw = self.n_kc + 2 * self.cap_per_side
        else:
            raw = 4 * self.cap_per_side
        return max(raw, 1)

    @property
    def slots_per_kind(self) -> int:
        """Row where the V slots start (== the K row count)."""
        if self.k_outliers == "channels":
            return self.n_kc
        return self.n_slots // 2

    @classmethod
    def create(cls, bits, n_kv_heads, d_head, max_len, sink=5,
               sparsity_threshold=0.99, include_sparse=True, kernel="xla",
               cap_per_side=None, dot_bf16=True, head_group=1, codes="nuq",
               post_rope_k=False, k_outliers="slots", n_kc=4):
        if head_group in (None, 0):  # auto: largest of {1,2,4} that divides
            head_group = 4
        while n_kv_heads % head_group:
            head_group //= 2
        # the encoded outlier-slot word packs a (head-in-group, dim) index
        # into 9 bits — only a constraint when per-token slots exist;
        # the cap0 channels speed config stores no encoded slots and may
        # use any group size (hg=16 halves the serial kernel's grid steps)
        cap_eff = 2 if cap_per_side is None else cap_per_side
        if cap_eff > 0:
            assert head_group * d_head <= 512, "9-bit (head, dim) index field"
        return cls(
            bits=bits, n_kv_heads=n_kv_heads, d_head=d_head, max_len=max_len,
            cap_per_side=(2 if cap_per_side is None else cap_per_side),
            head_group=head_group,
            sink=sink, sparsity_threshold=sparsity_threshold,
            include_sparse=include_sparse, kernel=kernel,
            v_range_exclude=outlier_budget_per_side(
                n_kv_heads * d_head, sparsity_threshold
            ),
            dot_bf16=dot_bf16,
            codes=codes,
            post_rope_k=post_rope_k,
            k_outliers=k_outliers,
            n_kc=n_kc,
        )


@jax.tree_util.register_dataclass
@dataclass
class KVCache:
    k_planes: Any
    v_planes: Any
    kv_out: Any
    v_scale: Any
    v_offset: Any
    k_sink: Any
    v_sink: Any
    length: Any

    def layer(self, i) -> "KVCache":
        return jax.tree.map(
            lambda a: a[i] if a.ndim > 1 else a, self
        )


def create_cache(dcfg: DeployConfig, n_layers: int, batch: int) -> KVCache:
    L, B = n_layers, batch
    H, D, S = dcfg.n_kv_heads, dcfg.d_head, dcfg.sink
    TW = dcfg.cache_tokens // 32
    Tc = dcfg.cache_tokens
    ns = dcfg.n_slots

    def z(shape, dt):
        return jnp.zeros(shape, dt)

    assert D <= 128, "outlier words encode a 7-bit in-head dim"
    if dcfg.codes != "nuq":
        # hardware intN storage: codes live at (token, dim) directly —
        # long token axis on sublanes, head_dim (one full lane tile) on
        # lanes; dequant in the kernels is a single convert + fma.
        # int4x2 halves the head axis: adjacent kv-head pairs share one
        # int4 array (two 2-bit codes per element).
        Hc = H // 2 if dcfg.codes == "int4x2" else H
        code_shape = (L, B, Hc, Tc, D)
        return KVCache(
            k_planes=z(code_shape, dcfg.code_dtype),
            v_planes=z(code_shape, dcfg.code_dtype),
            kv_out=z((L, B, dcfg.n_groups, ns, Tc), jnp.float32),
            v_scale=z((L, B, Tc), jnp.float32),
            v_offset=z((L, B, Tc), jnp.float32),
            k_sink=z((L, B, H, S, D), jnp.float32),
            v_sink=z((L, B, H, S, D), jnp.float32),
            length=z((B,), jnp.int32),
        )
    return KVCache(
        k_planes=z((L, B, H, dcfg.bits, TW, D), jnp.int32),
        v_planes=z((L, B, H, dcfg.bits, TW, D), jnp.int32),
        kv_out=z((L, B, dcfg.n_groups, ns, Tc), jnp.float32),
        v_scale=z((L, B, Tc), jnp.float32),
        v_offset=z((L, B, Tc), jnp.float32),
        k_sink=z((L, B, H, S, D), jnp.float32),
        v_sink=z((L, B, H, S, D), jnp.float32),
        length=z((B,), jnp.int32),
    )


def reset_cache(cache: KVCache) -> KVCache:
    """Zero everything (reference QuantK.reset/QuantV.reset)."""
    return jax.tree.map(jnp.zeros_like, cache)


def cache_bytes(dcfg: DeployConfig, n_layers: int, batch: int) -> dict:
    """Memory accounting for the quantized cache vs an fp16 baseline."""
    C = dcfg.kv_hidden
    Tc = dcfg.cache_tokens
    stored_bits = {
        "nuq": dcfg.bits, "int4": 4, "int8": 8, "int4x2": 2,
    }[dcfg.codes]
    packed = 2 * n_layers * batch * C * stored_bits * Tc // 8
    outliers = n_layers * batch * dcfg.n_groups * Tc * dcfg.n_slots * 4
    vlut = 2 * n_layers * batch * Tc * 4
    sink = 2 * n_layers * batch * C * dcfg.sink * 4
    # fp16 baseline at the SAME preallocated capacity (both caches are
    # static allocations; comparing rounded capacity vs requested max_len
    # would charge the rounding to the quantized side only)
    fp16 = 2 * n_layers * batch * C * (Tc + dcfg.sink) * 2
    total = packed + outliers + vlut + sink
    return dict(
        packed=packed, outliers=outliers, v_range=vlut, sink=sink,
        total=total, fp16_baseline=fp16, ratio=fp16 / total,
    )


# ---------------------------------------------------------------------------
# deployed quantizer arrays (static per model, stacked over layers)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass
class DeployedQuant:
    """Per-layer quantizer state expanded for the deployed datapath.

    k_lut_enc is used for nearest-code selection, k_lut_dec for dequant;
    they differ only under Q-Norm (reference lookup_table vs lookup_table2,
    modeling_llama.py:469-488).
    """

    k_range: Any  # (L, Hkv, D) fp32 per-channel halfrange
    k_offset: Any  # (L, Hkv, D) fp32 per-channel zeropoint
    k_lower: Any  # (L, C) outlier thresholds
    k_upper: Any  # (L, C)
    k_lut_enc: Any  # (L, 2**bits) sorted normalized
    k_lut_dec: Any  # (L, 2**bits)
    v_lut_enc: Any  # (L, 2**bits)
    v_lut_dec: Any  # (L, 2**bits)
    k_ressc: Any  # (L, C) per-channel expected K residual energy from
    #   calibration — the selection signal for k_outliers="channels"
    #   (zeros when the artifact predates channel scores: top_k then picks
    #   the first n_kc channels of each group, still a valid scheme)

    def layer(self, i) -> "DeployedQuant":
        return jax.tree.map(lambda a: a[i], self)


def k_channel_onehot(k_ressc, dcfg: DeployConfig):
    """Static K outlier channel selection ("channels" mode): the top-n_kc
    residual-energy channels of each head group, as one-hot rows.

    k_ressc: (..., C) — (C,) per layer or (L, C) stacked.
    Returns (..., n_groups, n_kc, head_group*d_head) fp32 ``sel`` with
    sel[..., g, n, c] == 1 iff group g's n-th selected channel is c.
    jax.lax.top_k is deterministic (ties break to the lower index), so the
    append path, the kernels, and the simulated oracle all derive the SAME
    selection from the same scores.

    The group count comes from the ARRAY size, not dcfg: under the
    head-sharded shard_map wrapper each shard holds only its local heads'
    scores and derives its local groups' selection (head groups never
    straddle tp shards)."""
    gw = dcfg.head_group * dcfg.d_head
    g = k_ressc.reshape(*k_ressc.shape[:-1], -1, gw)
    idx = jax.lax.top_k(g, dcfg.n_kc)[1]  # (..., n_groups, n_kc)
    return (idx[..., None] == jnp.arange(gw)).astype(jnp.float32)


def affine_lut_coeffs(lut, tol: float = 1e-4):
    """For an affine (evenly spaced) codebook, return (a, b) per layer with
    ``lut[c] == a + b*c``; raise if any layer's codebook is not affine.

    The intN storage modes (DeployConfig.codes "int4"/"int8") dequantize as
    a single fused multiply-add — they exist only for affine codebooks (the
    "uniform" calibration mode / the reference's int4-sparse scheme). A
    Fisher-weighted NUQ codebook is NOT affine; use codes="nuq" for it.

    lut: (L, K). Returns (a (L,), b (L,)) float32 numpy arrays.
    """
    lut = np.asarray(lut, np.float32)
    L, K = lut.shape
    a = lut[:, 0]
    b = (lut[:, -1] - lut[:, 0]) / (K - 1)
    recon = a[:, None] + b[:, None] * np.arange(K, dtype=np.float32)
    err = np.abs(recon - lut).max(axis=1)
    scale = np.maximum(np.abs(lut).max(axis=1), 1e-8)
    bad = err > tol * scale
    if bad.any():
        raise ValueError(
            f"intN code storage requires an affine codebook; layers "
            f"{np.nonzero(bad)[0].tolist()} deviate by up to "
            f"{float((err / scale).max()):.2e} (calibrate with "
            f"--mode uniform, or use codes='nuq')"
        )
    return a, b


def check_intn_codebook(dcfg, dq) -> None:
    """Eager guard for the intN storage modes: their dequant folds the
    codebook into an affine (a + b*code) form from its ENDPOINTS
    (flash_decode.fold_affine), so a non-affine codebook — e.g. a
    Fisher-weighted k-means NUQ fit — would silently mis-dequantize in the
    kernels while the XLA lut_lookup path stays exact. Raise loudly at the
    deploy boundary instead. No-op for codes == "nuq" and under tracing
    (values unavailable; every public entry also checks eagerly)."""
    if dcfg.codes == "nuq":
        return
    try:
        k = np.asarray(dq.k_lut_dec)
        v = np.asarray(dq.v_lut_dec)
    except Exception:  # tracer: values unavailable under jit
        return
    affine_lut_coeffs(k)
    affine_lut_coeffs(v)


def deployed_from_quantizers(qs, n_kv_heads: int, d_head: int) -> DeployedQuant:
    def stack(fn):
        return jnp.asarray(np.stack([fn(lq) for lq in qs.layers]), jnp.float32)

    def luts(get):
        enc, dec = [], []
        for lq in qs.layers:
            q = get(lq)
            lut = np.sort(np.asarray(q.lut, np.float32).reshape(-1))
            enc.append(lut)
            if q.normscale is not None:
                dec.append(lut * q.normscale + q.normoffset)
            else:
                dec.append(lut)
        return (
            jnp.asarray(np.stack(enc), jnp.float32),
            jnp.asarray(np.stack(dec), jnp.float32),
        )

    k_enc, k_dec = luts(lambda lq: lq.k)
    v_enc, v_dec = luts(lambda lq: lq.v)
    up = stack(lambda lq: lq.k.upper.reshape(-1))
    lo = stack(lambda lq: lq.k.lower.reshape(-1))
    L, C = up.shape
    assert C == n_kv_heads * d_head
    ressc = jnp.asarray(
        np.stack([
            np.zeros(C, np.float32) if lq.k.ressc is None
            else np.asarray(lq.k.ressc, np.float32).reshape(-1)
            for lq in qs.layers
        ]), jnp.float32,
    )
    return DeployedQuant(
        k_ressc=ressc,
        k_range=((up - lo) / 2).reshape(L, n_kv_heads, d_head),
        k_offset=((up + lo) / 2).reshape(L, n_kv_heads, d_head),
        k_lower=lo,
        k_upper=up,
        k_lut_enc=k_enc,
        k_lut_dec=k_dec,
        v_lut_enc=v_enc,
        v_lut_dec=v_dec,
    )
