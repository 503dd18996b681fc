"""Calibration: fit per-layer K/V quantizers from captured activations.

Reimplements SimQuant.quantize semantics (quant/kvquant/
simquant_module_quantizer.py:400-555) on TPU:

K (per-channel, qchannel=token axis):
  1. percentile thresholds at t = 1-(1-sparsity)/2 along tokens
  2. optional capped-outlier recomputation: mark the top-cap/side rescaled
     magnitudes per token (+ sink tokens), replace them by the channel
     median, and take the trimmed min/max as the final thresholds (:421-461)
  3. normalize to [-1,1] with the threshold midrange, mask outliers + sink,
     Fisher-weighted k-means -> 2**bits normalized centroids (:497-530)
  4. optional Q-Norm: affine (scale, offset) matching the pre-quant
     mean/stdev over non-outliers (:533-550)

V (per-token, qchannel=channel axis): same flow with per-token thresholds;
the stored thresholds are informational (runtime V quant is dynamic).

The reference runs sklearn KMeans on CPU per layer (minutes each); here the
whole fit is jitted JAX and runs per-layer in milliseconds on TPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .artifacts import KQuantizer, VQuantizer, LayerQuantizers, QuantizerSet
from .kmeans import weighted_kmeans_1d
from .nuq import nearest_values, nf_signposts
from .outliers import outlier_budget_per_side


def collect_kv_activations(params, cfg, batches, forward_fn=None,
                           rope_k=False):
    """Run the model over calibration batches capturing pre-RoPE K / V
    projection outputs. Returns (k_acts, v_acts): (L, N_tokens, C) fp32,
    token rows concatenated across batches (the layer-streaming Catcher
    pattern of quant/llama_simquant.py:148-291 collapsed into one jitted
    forward — activations for all layers come out of a single scan).

    ``rope_k=True`` applies rotary embedding to the captured keys at their
    sequence positions BEFORE flattening — the calibration signal for the
    post-RoPE K storage scheme (DeployConfig.post_rope_k)."""
    from ..models import get_forward

    forward_fn = forward_fn or get_forward(cfg)
    fwd = jax.jit(
        lambda p, t: forward_fn(p, cfg, t, capture_kv=True)[1],
        static_argnames=(),
    )
    ks, vs = [], []
    for tokens in batches:
        aux = fwd(params, tokens)
        k_act = aux["k_acts"]  # (L, B, T, C)
        if rope_k:
            k_act = rope_k_activations(k_act, cfg)
        L = k_act.shape[0]
        ks.append(k_act.reshape(L, -1, k_act.shape[-1]))
        vs.append(aux["v_acts"].reshape(L, -1, aux["v_acts"].shape[-1]))
    return jnp.concatenate(ks, axis=1), jnp.concatenate(vs, axis=1)


def rope_k_activations(k_acts, cfg):
    """(L, B, T, C) pre-RoPE keys -> the same, rotated at positions 0..T-1."""
    from ..models.llama import rope_cos_sin, rotate_half

    L, B, T, C = k_acts.shape
    Hkv, Dh = cfg.n_kv_heads, cfg.d_head
    cos, sin = rope_cos_sin(jnp.arange(T, dtype=jnp.int32), cfg)  # (T, Dh)
    kh = k_acts.reshape(L, B, T, Hkv, Dh).astype(jnp.float32)
    kh = kh * cos[:, None] + rotate_half(kh) * sin[:, None]
    return kh.reshape(L, B, T, C)


def _qnorm_affine(xn, q, keep_w):
    """Q-Norm scale/offset so quantized stats match pre-quant stats over
    non-outliers (reference :533-550)."""
    wsum = jnp.sum(keep_w)
    m1 = jnp.sum(xn * keep_w) / wsum
    s1 = jnp.sqrt(jnp.sum(((xn - m1) * keep_w) ** 2) / wsum)
    m2 = jnp.sum(q * keep_w) / wsum
    s2 = jnp.sqrt(jnp.sum(((q - m2) * keep_w) ** 2) / wsum)
    scale = s1 / s2
    return scale, -m2 * scale + m1


def fit_channel_quantizer(
    acts,  # (N_tokens, C) fp32 — all calibration tokens concatenated
    bits: int,
    *,
    axis: int = 0,  # axis along which thresholds are shared (0=per-channel)
    sparsity_threshold: float = 0.99,
    include_sparse: bool = True,
    cap_outliers: bool = False,
    first_few_fp16: int = -1,
    sample_seqlen: int = 2048,  # sink positions repeat every sample
    fisher=None,  # (N_tokens, C) or None
    qnorm: bool = False,
    seed: int = 0,
    kmeans_iters: int = 50,
    mode: str = "nuq",  # "nuq" (Fisher-weighted k-means), "nf"
                        # (NormalFloat signposts, reference quant_fn_nf), or
                        # "uniform" (evenly spaced grid == the reference's
                        # integer zero-point quant_fn_zp up to offset
                        # rounding)
):
    """Returns dict(upper (C,|N,), lower, lut (2**bits,), normscale, normoffset)."""
    acts = jnp.asarray(acts, jnp.float32)
    t = 1.0 - (1.0 - sparsity_threshold) / 2.0 if include_sparse else 1.0

    upper = jnp.quantile(acts, t, axis=axis)
    lower = jnp.quantile(acts, 1.0 - t, axis=axis)

    n_tok, C = acts.shape
    sink_mask = None
    if first_few_fp16 > 0:
        pos_in_sample = jnp.arange(n_tok) % sample_seqlen
        sink_mask = (pos_in_sample < first_few_fp16)[:, None]

    if cap_outliers and axis == 0:
        # tokenwise cap -> median fill -> trimmed thresholds (:421-461)
        zp = (upper + lower) * 0.5
        dist = (upper - lower) * 0.5
        resc = jnp.abs((acts - zp) / dist)
        cap = max(1, int(np.ceil((1.0 - t) * C)))
        hi_i = jax.lax.top_k(resc, cap)[1]
        lo_i = jax.lax.top_k(-resc, cap)[1]
        omask = jnp.zeros(acts.shape, bool)
        omask = jnp.put_along_axis(omask, hi_i, True, axis=-1, inplace=False)
        omask = jnp.put_along_axis(omask, lo_i, True, axis=-1, inplace=False)
        if sink_mask is not None:
            omask |= sink_mask
        med = jnp.median(acts, axis=0, keepdims=True)
        trimmed = jnp.where(omask, med, acts)
        upper = jnp.max(trimmed, axis=0)
        lower = jnp.min(trimmed, axis=0)

    zp = jnp.expand_dims((upper + lower) * 0.5, axis)
    rng = jnp.expand_dims((upper - lower) * 0.5, axis)
    xn = (acts - zp) / rng

    outlier_mask = (xn > 1.0) | (xn < -1.0)
    if sink_mask is not None:
        outlier_mask |= sink_mask

    w = jnp.ones(acts.shape, jnp.float32) if fisher is None else jnp.asarray(
        fisher, jnp.float32
    )
    w = jnp.where(outlier_mask, 0.0, w)

    if mode == "nf":
        lut = jnp.asarray(nf_signposts(bits))
    elif mode == "uniform":
        lut = jnp.linspace(-1.0, 1.0, 2 ** bits)
    else:
        lut, _ = weighted_kmeans_1d(
            xn.reshape(-1), w.reshape(-1), k=2**bits, iters=kmeans_iters,
            seed=seed,
        )

    out = dict(
        upper=np.asarray(upper, np.float32),
        lower=np.asarray(lower, np.float32),
        lut=np.asarray(lut, np.float32),
        normscale=None,
        normoffset=None,
    )
    if axis == 0:
        # per-channel expected squared residual AFTER quantization — the
        # selection signal for static-channel K outliers (KVQuant's
        # channel-consistency observation): channels whose residual energy
        # dominates are exactly the ones worth storing densely in fp
        # (DeployConfig.k_outliers="channels"). Weighted by Fisher when
        # available so selection tracks loss impact, not raw magnitude.
        deq_n = nearest_values(jnp.clip(xn, -1.0, 1.0), lut)
        r = (xn - deq_n) * rng  # de-normalized residual (in-range rounding
        #                         + the dominant beyond-range clip error)
        wsc = jnp.ones_like(r) if fisher is None else jnp.asarray(
            fisher, jnp.float32
        )
        out["ressc"] = np.asarray(
            jnp.mean(wsc * r * r, axis=0), np.float32
        )
    if qnorm:
        q = nearest_values(xn, lut)
        keep = jnp.where(outlier_mask, 0.0, 1.0)
        scale, off = _qnorm_affine(xn, q, keep)
        out["normscale"] = float(scale)
        out["normoffset"] = float(off)
    return out


def fit_quantizers(
    k_acts,  # (L, N_tokens, C) pre-RoPE key activations
    v_acts,  # (L, N_tokens, C)
    bits: int,
    *,
    sparsity_threshold: float = 0.99,
    include_sparse: bool = True,
    cap_outliers: bool = True,
    first_few_fp16: int = -1,
    sample_seqlen: int = 2048,
    fisher_k=None,  # (L, N_tokens, C) squared grads
    fisher_v=None,
    qnorm: bool = False,
    seed: int = 0,
    kmeans_iters: int = 50,
    mode: str = "nuq",
    meta: dict | None = None,
) -> QuantizerSet:
    layers = []
    L = k_acts.shape[0]
    for i in range(L):
        kq = fit_channel_quantizer(
            k_acts[i], bits, axis=0,
            sparsity_threshold=sparsity_threshold,
            include_sparse=include_sparse, cap_outliers=cap_outliers,
            first_few_fp16=first_few_fp16, sample_seqlen=sample_seqlen,
            fisher=None if fisher_k is None else fisher_k[i],
            qnorm=qnorm, seed=seed, kmeans_iters=kmeans_iters, mode=mode,
        )
        vq = fit_channel_quantizer(
            v_acts[i], bits, axis=1,
            sparsity_threshold=sparsity_threshold,
            include_sparse=include_sparse, cap_outliers=False,
            first_few_fp16=first_few_fp16, sample_seqlen=sample_seqlen,
            fisher=None if fisher_v is None else fisher_v[i],
            qnorm=qnorm, seed=seed, kmeans_iters=kmeans_iters, mode=mode,
        )
        layers.append(
            LayerQuantizers(
                k=KQuantizer(
                    upper=kq["upper"], lower=kq["lower"], lut=kq["lut"],
                    normscale=kq["normscale"], normoffset=kq["normoffset"],
                    ressc=kq.get("ressc"),
                ),
                v=VQuantizer(
                    lut=vq["lut"], normscale=vq["normscale"],
                    normoffset=vq["normoffset"], upper=vq["upper"],
                    lower=vq["lower"],
                ),
            )
        )
    return QuantizerSet(
        layers=layers,
        bits=bits,
        sparsity_threshold=sparsity_threshold,
        cap_outliers=cap_outliers,
        first_few_fp16=max(0, first_few_fp16),
        meta=meta or {},
    )
