"""DBRX-style Mixture-of-Experts transformer with fused Wqkv attention.

Reference parity target: the DBRX simulated-quantization pipeline
(quant/dbrx_simquant.py + quant/kvquant/simquant_module_quantizer_dbrx.py):
a fused Wqkv projection whose output is sliced into Q / K / V, with the K
slice quantized per-channel (static thresholds) and the V slice per-token
(dynamic), GQA kv-heads, and an MoE FFN (router + top-k gated experts).
The reference evaluates DBRX with simulated quantization only (no deployed
kernels); here the same KVCache/engine machinery applies because the cache
only sees (k, v) activations regardless of how they were projected.

TPU-first formulation:
  - ffn_mode="dense": every expert computed, combined with the (top-k
    masked) router weights — exact, fully MXU-batched, fine for small E.
  - ffn_mode="sparse": GShard-style capacity dispatch (one-hot dispatch /
    combine einsums — no gather/scatter, which serialize on TPU); expert
    FLOPs scale with top_k instead of E — the viable mode at DBRX scale
    (16 experts, top-4 => 4x FLOP cut). Both modes shard experts over the
    mesh's "tp" axis (expert parallelism).
  - the fused Wqkv matmul stays fused (one MXU call); K/V emerge as static
    slices (reference slicing at simquant_module_quantizer_dbrx.py:602-640).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .llama import (
    norm, rope_cos_sin, apply_rope, _attention,
    SimQuantParams, simquant_k, simquant_v,
)


@dataclass(frozen=True)
class MoEConfig(ModelConfig):
    n_experts: int = 8
    top_k: int = 2
    # "dense": every expert computed, mask-combined (exact, E/top_k FLOP
    # waste — fine for tiny E). "sparse": GShard-style capacity dispatch —
    # expert FLOPs scale with top_k, not E (the only viable mode at DBRX
    # scale: 16 experts, top-4).
    ffn_mode: str = "dense"
    capacity_factor: float = 2.0


TINY_MOE = MoEConfig(
    vocab_size=256, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
    d_head=16, d_ff=96, max_seq_len=256, n_experts=4, top_k=2,
)


def init_params(key, cfg: MoEConfig, dtype=jnp.bfloat16):
    k_embed, k_layers, k_head = jax.random.split(key, 3)

    def dense(key, shape, scale=None):
        scale = scale or (1.0 / shape[-2] ** 0.5 if len(shape) > 1 else 0.02)
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    L, D, H, Hkv, Dh, F, E = (
        cfg.n_layers, cfg.d_model, cfg.n_heads, cfg.n_kv_heads, cfg.d_head,
        cfg.d_ff, cfg.n_experts,
    )
    qkv_out = (H + 2 * Hkv) * Dh
    ks = jax.random.split(k_layers, 7)
    layers = dict(
        w_qkv=dense(ks[0], (L, D, qkv_out)),
        wo=dense(ks[1], (L, H * Dh, D)),
        w_router=dense(ks[2], (L, D, E)),
        w_gate=dense(ks[3], (L, E, D, F)),
        w_up=dense(ks[4], (L, E, D, F)),
        w_down=dense(ks[5], (L, E, F, D)),
        ln_attn=jnp.ones((L, D), jnp.float32),
        ln_mlp=jnp.ones((L, D), jnp.float32),
    )
    params = dict(
        embed=dense(k_embed, (cfg.vocab_size, D), scale=0.02),
        final_norm=jnp.ones((D,), jnp.float32),
        layers=layers,
    )
    if not cfg.tie_embeddings:
        params["lm_head"] = dense(k_head, (D, cfg.vocab_size))
    return params


def _router_weights(h, lp, cfg: MoEConfig):
    """(logits fp32, strict top-k softmax weights (B, T, E))."""
    logits = (h @ lp["w_router"]).astype(jnp.float32)  # (B, T, E)
    # strict top-k mask built from the top_k indices: a >=threshold compare
    # would route through MORE than top_k experts on exact ties
    _, top_idx = jax.lax.top_k(logits, cfg.top_k)
    sel = jnp.any(
        top_idx[..., None] == jnp.arange(logits.shape[-1]), axis=-2
    )  # (B, T, E) bool, exactly top_k True per token
    masked = jnp.where(sel, logits, -jnp.inf)
    return logits, jax.nn.softmax(masked, axis=-1).astype(h.dtype)


def moe_ffn(h, lp, cfg: MoEConfig):
    """Top-k gated expert MLP; mode per MoEConfig.ffn_mode."""
    if cfg.ffn_mode == "sparse":
        return moe_ffn_sparse(h, lp, cfg)
    _, w = _router_weights(h, lp, cfg)
    gate = jnp.einsum("btd,edf->btef", h, lp["w_gate"])
    up = jnp.einsum("btd,edf->btef", h, lp["w_up"])
    y = jnp.einsum("btef,efd->bted", jax.nn.silu(gate) * up, lp["w_down"])
    return jnp.einsum("bte,bted->btd", w, y)


def moe_ffn_sparse(h, lp, cfg: MoEConfig):
    """Capacity-based sparse dispatch (the GShard/GSpmd einsum pattern —
    TPU-native: one-hot dispatch/combine contractions on the MXU, zero
    gather/scatter). Expert matmul FLOPs are tokens*top_k*D*F instead of
    the dense path's tokens*E*D*F.

    Per-expert capacity C = ceil(N * top_k / E * capacity_factor), clamped
    to N. Tokens routed past an expert's capacity lose that expert's
    contribution (their remaining experts' weights are NOT renormalized —
    matching the standard serving behavior); with C == N (small N, e.g.
    decode steps, or capacity_factor >= E/top_k) the result is EXACTLY the
    dense path."""
    B, T, Dm = h.shape
    E, K = cfg.n_experts, cfg.top_k
    N = B * T
    C = min(N, -(-N * K // E) * max(1, int(round(cfg.capacity_factor))))
    hf = h.reshape(N, Dm)

    logits, w = _router_weights(h, lp, cfg)
    w = w.reshape(N, E)

    # rank the (token, expert) assignments per expert by arrival order:
    # position_in_expert via exclusive cumsum of the routed mask
    routed = (w > 0).astype(jnp.int32)  # (N, E) exactly K per row
    pos_in_e = jnp.cumsum(routed, axis=0) - routed  # (N, E) exclusive
    keep = routed.astype(bool) & (pos_in_e < C)

    # dispatch: (N, E, C) one-hot of each kept token's slot
    slot_onehot = (
        pos_in_e[..., None] == jnp.arange(C)
    ) & keep[..., None]  # (N, E, C)
    dispatch = slot_onehot.astype(h.dtype)
    combine = dispatch * w[..., None].astype(h.dtype)  # (N, E, C)

    xe = jnp.einsum("nec,nd->ecd", dispatch, hf)  # (E, C, Dm)
    gate = jnp.einsum("ecd,edf->ecf", xe, lp["w_gate"])
    up = jnp.einsum("ecd,edf->ecf", xe, lp["w_up"])
    ye = jnp.einsum("ecf,efd->ecd", jax.nn.silu(gate) * up, lp["w_down"])
    out = jnp.einsum("nec,ecd->nd", combine, ye)  # (N, Dm)
    return out.reshape(B, T, Dm)


def split_qkv(y, cfg: MoEConfig):
    """Slice the fused projection output into (q, k, v) — reference
    simquant_module_quantizer_dbrx.py:711 (y[:, 6144:7168] = K, rest = V)."""
    q_dim = cfg.n_heads * cfg.d_head
    kv = cfg.n_kv_heads * cfg.d_head
    return (
        y[..., :q_dim],
        y[..., q_dim:q_dim + kv],
        y[..., q_dim + kv:],
    )


def forward(
    params,
    cfg: MoEConfig,
    tokens,
    *,
    positions=None,
    simquant: SimQuantParams | None = None,
    capture_kv: bool = False,
    kv_probes=None,
    attn_chunk: int | None = None,
):
    """Full-sequence forward; same aux contract as models.llama.forward, so
    calibration / Fisher / ppl / engine prefill all reuse it unchanged."""
    B, T = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    cos, sin = rope_cos_sin(positions, cfg)

    x = jnp.take(params["embed"], tokens, axis=0)
    sq_cfg = simquant.config if simquant is not None else None

    def layer_fn(x, scanned):
        lp = scanned["p"]
        h = norm(x, lp["ln_attn"], cfg)
        y = h @ lp["w_qkv"]
        q, k, v = split_qkv(y, cfg)

        if kv_probes is not None:
            k = k + scanned["probe_k"]
            v = v + scanned["probe_v"]

        captured = (
            (k.astype(jnp.float32), v.astype(jnp.float32))
            if capture_kv
            else (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
        )

        if simquant is not None:
            sq = scanned["sq"]
            if not sq_cfg.post_rope_k:
                k = simquant_k(k, sq, sq_cfg)
            v = simquant_v(v, sq, sq_cfg)

        q = q.reshape(B, T, cfg.n_heads, cfg.d_head)
        k = k.reshape(B, T, cfg.n_kv_heads, cfg.d_head)
        v = v.reshape(B, T, cfg.n_kv_heads, cfg.d_head)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if simquant is not None and sq_cfg.post_rope_k:
            k = simquant_k(
                k.reshape(B, T, cfg.n_kv_heads * cfg.d_head),
                scanned["sq"], sq_cfg,
            ).reshape(B, T, cfg.n_kv_heads, cfg.d_head)

        attn = _attention(q, k, v, cfg, positions, chunk=attn_chunk)
        x = x + attn @ lp["wo"]

        h = norm(x, lp["ln_mlp"], cfg)
        x = x + moe_ffn(h, lp, cfg).astype(x.dtype)
        return x, captured

    scanned = {"p": params["layers"]}
    if simquant is not None:
        scanned["sq"] = simquant.arrays
    if kv_probes is not None:
        scanned["probe_k"] = kv_probes["k"]
        scanned["probe_v"] = kv_probes["v"]

    x, (k_acts, v_acts) = jax.lax.scan(layer_fn, x, scanned)

    x = norm(x, params["final_norm"], cfg)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = (x @ head).astype(jnp.float32)

    aux = {}
    if capture_kv:
        aux["k_acts"] = k_acts
        aux["v_acts"] = v_acts
    return logits, aux
