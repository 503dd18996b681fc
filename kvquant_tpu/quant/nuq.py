"""Quantization math core: non-uniform (LUT) / NormalFloat / integer quantization.

Pure-JAX simulated-quantization primitives. These define the *semantics* of the
scheme; the deployed Pallas kernels (kvquant_tpu.ops) are tested for exact
agreement against these functions.

Behavioral parity targets in the reference (SqueezeAILab/KVQuant):
  - nearest-signpost rounding:   quant/kvquant/simquant_module_quantizer.py:10
  - integer zero-point quant:    simquant_module_quantizer.py:116
  - NormalFloat signposts:       simquant_module_quantizer.py:634-695
  - NUQ LUT quant (+ Q-Norm):    simquant_module_quantizer.py:265
  - dynamic median-recentered min/max: simquant_module_quantizer.py:143-151

All functions are shape-polymorphic over leading dims and take an `axis`
along which scaling factors are shared ("qchannel" in the reference):
per-channel K quant uses the token axis, per-token V quant uses the channel
axis.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import ndtri  # float64 host-side (static table only)


def nearest_codes(x: jax.Array, lut: jax.Array) -> jax.Array:
    """Index of the nearest LUT entry for every element of ``x``.

    ``lut`` must be sorted ascending (we sort codebooks once at build time,
    mirroring the reference's sort at deployment-load,
    deployment modeling_llama.py:452).

    TPU note: implemented as 2^bits-1 vectorized midpoint compares summed on
    the VPU — searchsorted/gather formulations serialize per element on TPU
    and are orders of magnitude slower for tiny tables.
    """
    K = lut.shape[-1]
    code = jnp.zeros(x.shape, jnp.int32)
    for i in range(K - 1):
        mid = (lut[i] + lut[i + 1]) * 0.5
        code += (x > mid).astype(jnp.int32)
    return code


def lut_lookup(lut: jax.Array, codes: jax.Array) -> jax.Array:
    """``lut[codes]`` for a tiny (2^bits) table, as a fused select chain on
    the VPU instead of a serialized TPU gather."""
    K = lut.shape[-1]
    out = jnp.zeros(codes.shape, jnp.float32) + lut[0]
    for i in range(1, K):
        out = jnp.where(codes == i, lut[i], out)
    return out


def nearest_values(x: jax.Array, lut: jax.Array) -> jax.Array:
    """Round every element of ``x`` to its nearest entry of sorted ``lut``."""
    return lut_lookup(lut, nearest_codes(x, lut))


def nf_signposts(bits: int) -> np.ndarray:
    """NormalFloat signpost values in [-1, 1], 2**bits entries.

    Reproduces the construction at simquant_module_quantizer.py:634-695
    (quantile spacing from arXiv:2306.06965): evenly spaced quantiles of a
    standard normal on each half, inverse-CDF'd, each half affinely
    renormalized, the duplicate 0 merged.  Host-side (static table).
    """
    if bits < 2:
        raise ValueError("bits must be >= 2")
    half = 2 ** (bits - 1)
    lo_off = 0.5 * (1 / 32 + 1 / 30)
    hi_off = 1.0 - lo_off

    neg_q = lo_off + (0.5 - lo_off) / (half - 1) * np.arange(half)
    pos_q = np.concatenate(
        [0.5 + (hi_off - 0.5) / half * np.arange(half), [hi_off]]
    )

    neg = ndtri(neg_q)  # ascending, last value is ndtri(0.5) == 0
    pos = ndtri(pos_q)  # ascending, first value is 0

    # normalize each half so the grid spans exactly [-1, 1]
    neg = (neg + abs(neg[-1])) / (abs(neg[0]) - abs(neg[-1]))
    pos = (pos - abs(pos[0])) / (abs(pos[-1]) - abs(pos[0]))

    out = np.concatenate([neg, pos[1:]])  # drop duplicated 0
    assert out.shape == (2**bits,)
    return np.asarray(out, dtype=np.float32)


def dynamic_minmax(x, axis, outlier_mask=None):
    """Per-slice min/max along ``axis``; outlier positions replaced by the
    slice median first so they don't skew the quantization range
    (simquant_module_quantizer.py:143-151)."""
    x = x.astype(jnp.float32)
    if outlier_mask is not None:
        med = jnp.median(x, axis=axis, keepdims=True)
        x = jnp.where(outlier_mask, med, x)
    return (
        jnp.min(x, axis=axis, keepdims=True),
        jnp.max(x, axis=axis, keepdims=True),
    )


def _expand(v, axis):
    """Unsqueeze pre-reduced per-slice stats along ``axis`` (no-op if already
    broadcastable with a keepdims reduction)."""
    if v.ndim == 0:
        return v
    return jnp.expand_dims(v, axis) if v.ndim < 2 or v.shape[axis] != 1 else v


def quant_zp(
    x,
    bits: int,
    axis: int = -1,
    minval=None,
    maxval=None,
    outlier_mask=None,
    dynamic: bool = False,
    clamp: bool = False,
):
    """Simulated asymmetric integer quantization (reference quant_fn_zp,
    simquant_module_quantizer.py:116).

    Outlier positions (where ``outlier_mask``) pass through exactly.
    ``clamp`` rounds/clamps the zero point (off by default: unclamped offsets
    improve per-channel key accuracy per the reference comment at :165).
    """
    x = x.astype(jnp.float32)
    if dynamic:
        minval, maxval = dynamic_minmax(x, axis, outlier_mask)
    else:
        minval = _expand(jnp.asarray(minval, jnp.float32), axis)
        maxval = _expand(jnp.asarray(maxval, jnp.float32), axis)

    qx = (2**bits - 1) / (maxval - minval)
    offset = minval * qx
    if clamp:
        offset = jnp.clip(jnp.round(offset), -(2**bits - 1), 0)

    dense = jnp.where(outlier_mask, 0.0, x) if outlier_mask is not None else x
    q = jnp.clip(jnp.round(qx * dense - offset), 0, 2**bits - 1)
    deq = (q + offset) / qx
    deq = jnp.nan_to_num(deq, nan=0.0, posinf=0.0, neginf=0.0)
    if outlier_mask is not None:
        deq = jnp.where(outlier_mask, x, deq)
    return deq


def quant_lut(
    x,
    lut,
    axis: int = -1,
    minval=None,
    maxval=None,
    outlier_mask=None,
    dynamic: bool = False,
    normscale=None,
    normoffset=None,
    sink: int = 0,
    token_axis: int = 0,
):
    """Simulated LUT quantization: covers both NUQ codebooks and NormalFloat
    (pass ``lut=nf_signposts(bits)``). Reference quant_fn_nuq_recon /
    quant_fn_nf (simquant_module_quantizer.py:265 / :193).

    Data is shifted/scaled into [-1, 1] using the (static or dynamic) range
    along ``axis``, rounded to the nearest sorted LUT entry, optionally
    Q-Norm rescaled (x*normscale + normoffset, :339-342), then mapped back.
    Outlier positions and the first ``sink`` tokens (along ``token_axis``)
    pass through exactly.
    """
    x = x.astype(jnp.float32)
    lut = jnp.sort(jnp.asarray(lut, jnp.float32).reshape(-1))

    if dynamic:
        minval, maxval = dynamic_minmax(x, axis, outlier_mask)
    else:
        minval = _expand(jnp.asarray(minval, jnp.float32), axis)
        maxval = _expand(jnp.asarray(maxval, jnp.float32), axis)

    offset = (maxval + minval) * 0.5
    rangeval = (maxval - minval) * 0.5

    xn = (x - offset) / rangeval
    q = nearest_values(xn, lut)
    if normscale is not None:
        q = q * normscale + normoffset
    deq = q * rangeval + offset
    deq = jnp.nan_to_num(deq, nan=0.0, posinf=0.0, neginf=0.0)

    if outlier_mask is not None:
        deq = jnp.where(outlier_mask, x, deq)
    if sink > 0:
        tok = jnp.arange(x.shape[token_axis])
        tok = jnp.expand_dims(
            tok, [a for a in range(x.ndim) if a != token_axis % x.ndim]
        )
        deq = jnp.where(tok < sink, x, deq)
    return deq
