"""Sharding rules: tensor-parallel weights + head-sharded quantized KV cache.

Layout (Megatron-style column/row split, expressed as GSPMD shardings — XLA
inserts the psum on each row-sharded output projection):

  wq/wk/wv  (L, D, H*Dh)   -> (None, None, "tp")   heads sharded
  wo        (L, H*Dh, D)   -> (None, "tp", None)   row-sharded (psum after)
  w_gate/up (L, D, F)      -> (None, None, "tp")
  w_down    (L, F, D)      -> (None, "tp", None)
  embed / norms / lm_head  -> replicated (vocab is small relative to KV at
                              the contexts this framework targets)

Quantized cache (kvquant_tpu.cache.KVCache): every array shards batch over
"dp"; packed planes, sinks, AND the per-(token, kv-head) outlier arrays
shard the kv-head axis over "tp" (the per-head outlier budget exists partly
for this). The per-layer quantizer arrays shard k_range/k_offset over heads;
thresholds/LUTs are tiny and replicate.

This mirrors the SURVEY.md §2.3 note: the reference has no tensor
parallelism at all — this module is new TPU-first design, not translation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cache import KVCache, DeployedQuant


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def param_shardings(mesh: Mesh, params) -> dict:
    """NamedSharding pytree matching the stacked-parameter pytrees of
    models.llama.init_params and models.moe.init_params (MoE expert stacks
    shard their expert axis over "tp" — expert parallelism on the same mesh
    axis as tensor parallelism; a dedicated "ep" axis is a mesh reshape)."""
    rep = _ns(mesh)
    layer_rules = dict(
        wq=_ns(mesh, None, None, "tp"),
        wk=_ns(mesh, None, None, "tp"),
        wv=_ns(mesh, None, None, "tp"),
        wo=_ns(mesh, None, "tp", None),
        w_gate=_ns(mesh, None, None, "tp"),
        w_up=_ns(mesh, None, None, "tp"),
        w_down=_ns(mesh, None, "tp", None),
        ln_attn=rep,
        ln_mlp=rep,
    )
    if "w_qkv" in params["layers"]:  # MoE family
        layer_rules = dict(
            w_qkv=_ns(mesh, None, None, "tp"),
            wo=_ns(mesh, None, "tp", None),
            w_router=rep,
            w_gate=_ns(mesh, None, "tp", None, None),
            w_up=_ns(mesh, None, "tp", None, None),
            w_down=_ns(mesh, None, "tp", None, None),
            ln_attn=rep,
            ln_mlp=rep,
        )
    out = dict(
        embed=rep,
        final_norm=rep,
        layers={k: layer_rules[k] for k in params["layers"]},
    )
    if "lm_head" in params:
        out["lm_head"] = rep
    return out


def cache_shardings(mesh: Mesh) -> KVCache:
    """Sharding pytree for KVCache: (L, B, Hkv, ...) arrays shard B over dp
    and Hkv over tp; per-token rows shard only B."""
    return KVCache(
        k_planes=_ns(mesh, None, "dp", "tp"),
        v_planes=_ns(mesh, None, "dp", "tp"),
        kv_out=_ns(mesh, None, "dp", "tp"),
        v_scale=_ns(mesh, None, "dp"),
        v_offset=_ns(mesh, None, "dp"),
        k_sink=_ns(mesh, None, "dp", "tp"),
        v_sink=_ns(mesh, None, "dp", "tp"),
        length=_ns(mesh, "dp"),
    )


def quant_shardings(mesh: Mesh) -> DeployedQuant:
    """DeployedQuant: per-channel ranges shard kv heads over tp; LUTs and
    flat thresholds are tiny — replicate."""
    rep = _ns(mesh)
    return DeployedQuant(
        k_range=_ns(mesh, None, "tp", None),
        k_offset=_ns(mesh, None, "tp", None),
        k_lower=rep,
        k_upper=rep,
        k_lut_enc=rep,
        k_lut_dec=rep,
        v_lut_enc=rep,
        v_lut_dec=rep,
        k_ressc=rep,
    )


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Token batches shard over dp."""
    return _ns(mesh, "dp")


def shard_params(mesh: Mesh, params):
    return jax.device_put(params, param_shardings(mesh, params))


def shard_cache(mesh: Mesh, cache: KVCache) -> KVCache:
    return jax.device_put(cache, cache_shardings(mesh))


def shard_quant(mesh: Mesh, dq: DeployedQuant) -> DeployedQuant:
    return jax.device_put(dq, quant_shardings(mesh))


def flash_attention_sharded(mesh: Mesh, q_rot, k_planes, v_planes, kv_out,
                            k_range, k_offset, v_scale, v_offset,
                            k_sink, v_sink, k_lut, v_lut, li, pos,
                            dcfg, mcfg, Tq: int = 1,
                            block_tokens: int = 1024, k_ressc=None):
    """shard_map wrapper for ops.pallas.flash_decode.flash_attention:
    batch shards over "dp", kv heads (and their outlier groups) over "tp".

    Attention is head-local, so NO collectives are needed — each device
    runs the kernel on its head shard of the packed cache. Without this
    wrapper, a pallas_call inside a GSPMD program is unpartitionable and
    XLA all-gathers the full cache to every device.

    Requires (n_kv_heads / tp) % head_group == 0 so outlier groups don't
    straddle the shard boundary.
    """
    from functools import partial

    from ..ops.pallas.flash_decode import flash_attention

    shard_map = jax.shard_map

    tp = mesh.shape["tp"]
    assert (dcfg.n_kv_heads // tp) % dcfg.head_group == 0, (
        dcfg.n_kv_heads, tp, dcfg.head_group
    )

    cache_p = P(None, "dp", "tp")
    specs_in = (
        P("dp", "tp"),            # q_rot (B, Hkv, Q, D)
        cache_p, cache_p,         # k_planes, v_planes
        cache_p,                  # kv_out (groups axis)
        P(None, "tp"),            # k_range (L, Hkv, D)
        P(None, "tp"),            # k_offset
        P(None, "dp"),            # v_scale (L, B, Tc)
        P(None, "dp"),            # v_offset
        cache_p, cache_p,         # sinks
        P(), P(),                 # luts (replicated)
        P(), P("dp"),             # li, pos
        P(None, "tp"),            # k_ressc (L, C): channel scores follow
                                  # their heads so each shard derives its
                                  # LOCAL static-channel selection
    )

    if k_ressc is None:
        k_ressc = jnp.zeros(
            (k_range.shape[0], dcfg.n_kv_heads * dcfg.d_head), jnp.float32
        )
    if dcfg.kernel == "flash_serial" and Tq == 1:
        # the manual-DMA serial decode kernel shards identically: it is
        # head-local too, and its HBM operands carry the same leading axes
        from ..ops.pallas.flash_serial import flash_serial_decode

        fn = partial(flash_serial_decode, dcfg=dcfg, mcfg=mcfg,
                     block_tokens=block_tokens)
    else:
        fn = partial(flash_attention, dcfg=dcfg, mcfg=mcfg, Tq=Tq,
                     block_tokens=block_tokens)
    return shard_map(
        lambda *a: fn(*a[:-1], k_ressc=a[-1]),
        mesh=mesh, in_specs=specs_in, out_specs=P("dp", "tp"),
        check_vma=False,  # pallas_call out_shape carries no vma info
    )(q_rot, k_planes, v_planes, kv_out, k_range, k_offset, v_scale,
      v_offset, k_sink, v_sink, k_lut, v_lut, li, pos, k_ressc)
