"""Deployed inference engine: prefill + token-by-token decode over the
packed quantized KV cache, full-model.

Replaces the reference's forked-HF generation stack (deployment
generation/utils.py kvquant mode + llama.py benchmark loop, SURVEY.md P16/P17)
with a functional TPU-native engine:

  - ``prefill``: one full-precision forward over the prompt (the reference's
    flash-attn prompt phase, modeling_llama.py:1860-1873) that simultaneously
    captures pre-RoPE K/V activations and packs them into the quantized cache
    for every layer in parallel (parallel_pack, :879-975/:1294-1385).
  - ``decode_step``: single-token forward where each layer appends to and
    attends over its packed cache (ops.deployed.decode_attention — later a
    Pallas kernel datapath). Layers run under one ``lax.scan`` so the whole
    step is a single compiled program regardless of depth.
  - ``generate``: static-shape greedy/temperature sampling loop via
    ``lax.scan`` with a position-based stop mask (the reference stops on
    position_id >= max_length, generation/utils.py:2401-2407).

State is explicit: EngineState(cache, pos) is a pytree; all functions are
pure and jit/donate-friendly.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from .cache import (KVCache, DeployConfig, DeployedQuant, create_cache,
                    check_intn_codebook)
from .models.config import ModelConfig
from .models import llama
from .ops import deployed


_CACHE_FIELDS = [f.name for f in dataclasses.fields(KVCache) if f.name != "length"]


def _split_cache(cache: KVCache):
    return {f: getattr(cache, f) for f in _CACHE_FIELDS}, cache.length


def _merge_cache(arrays, length) -> KVCache:
    return KVCache(length=length, **arrays)


# ---------------------------------------------------------------------------
# prefill
# ---------------------------------------------------------------------------


def prefill(
    params,
    cfg: ModelConfig,
    dcfg: DeployConfig,
    dq: DeployedQuant,
    cache: KVCache,
    tokens,  # (B, T0) int32 prompt
):
    """Full-precision prompt forward + parallel pack of all layers' caches.

    Returns (cache, logits_last (B, V) fp32).
    """
    from .models import get_forward

    logits, aux = get_forward(cfg)(params, cfg, tokens, capture_kv=True)
    k_acts = aux["k_acts"]  # (L, B, T0, C) fp32 pre-RoPE
    v_acts = aux["v_acts"]

    arrays, length = _split_cache(cache)

    def pack_layer(arr_l, lq, k_l, v_l):
        cache_l = _merge_cache(arr_l, length)
        new = deployed.prefill_pack(cache_l, lq, dcfg, cfg, k_l, v_l)
        new_arrays, new_len = _split_cache(new)
        return new_arrays, new_len

    new_arrays, new_lens = jax.vmap(pack_layer, in_axes=(0, 0, 0, 0))(
        arrays, dq, k_acts, v_acts
    )
    return _merge_cache(new_arrays, new_lens[0]), logits[:, -1].astype(jnp.float32)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_step(
    params,
    cfg: ModelConfig,
    dcfg: DeployConfig,
    dq: DeployedQuant,
    cache: KVCache,
    token,  # (B,) int32 the previously sampled token
    pos,  # scalar int32 its absolute position
):
    """One decode step: append ``token`` at ``pos`` to every layer's cache and
    return (cache, logits (B, V) fp32) for the next position.

    The reference feeds only the last token per step in kvquant mode
    (generation/utils.py:2680-2685); position bookkeeping lives in ``pos``.
    """
    from .models.moe import MoEConfig, split_qkv, moe_ffn

    check_intn_codebook(dcfg, dq)
    if dcfg.kernel in ("flash", "flash_serial"):
        return _decode_step_flash(params, cfg, dcfg, dq, cache, token, pos)

    is_moe = isinstance(cfg, MoEConfig)
    B = token.shape[0]
    H, Dh = cfg.n_heads, cfg.d_head

    x = jnp.take(params["embed"], token, axis=0)  # (B, D)
    arrays, length = _split_cache(cache)

    # The cache rides in the scan CARRY with per-layer dynamic slicing
    # (NOT as scan xs/ys): ys would be freshly allocated buffers, so every
    # step would rewrite the entire multi-layer cache; carried buffers are
    # aliased in place by XLA and only the appended rows are written.
    def layer_fn(carry, scanned):
        x, arrs, new_len = carry
        lp = scanned["p"]
        lq = scanned["q"]
        li = scanned["i"]
        arr_l = {k: jax.lax.dynamic_index_in_dim(v, li, 0, keepdims=False)
                 for k, v in arrs.items()}
        cache_l = _merge_cache(arr_l, length)

        h = llama.norm(x, lp["ln_attn"], cfg)
        if is_moe:
            q, k, v = split_qkv(h @ lp["w_qkv"], cfg)
            q = q.reshape(B, H, Dh)
        else:
            q = (h @ lp["wq"]).reshape(B, H, Dh)
            k = h @ lp["wk"]
            v = h @ lp["wv"]

        cache_l, attn = deployed.decode_attention(
            cache_l, lq, dcfg, cfg, q, k, v, pos
        )
        x = x + (attn.reshape(B, H * Dh).astype(x.dtype) @ lp["wo"])

        h = llama.norm(x, lp["ln_mlp"], cfg)
        if is_moe:
            x = x + moe_ffn(h[:, None], lp, cfg)[:, 0].astype(x.dtype)
        else:
            x = x + (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]

        new_arr_l, new_len = _split_cache(cache_l)
        arrs = {
            k: jax.lax.dynamic_update_index_in_dim(arrs[k], new_arr_l[k], li, 0)
            for k in arrs
        }
        return (x, arrs, new_len), None

    scanned = {
        "p": params["layers"], "q": dq,
        "i": jnp.arange(cfg.n_layers, dtype=jnp.int32),
    }
    (x, new_arrays, new_len), _ = jax.lax.scan(
        layer_fn, (x, arrays, length), scanned
    )

    x = llama.norm(x, params["final_norm"], cfg)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = (x @ head).astype(jnp.float32)
    return _merge_cache(new_arrays, new_len), logits


def _decode_step_flash(
    params,
    cfg: ModelConfig,
    dcfg: DeployConfig,
    dq: DeployedQuant,
    cache: KVCache,
    token,  # (B,) int32
    pos,  # scalar or (B,) int32
):
    """decode_step for dcfg.kernel == "flash": single-pass flash-decode
    Pallas kernel per layer over the FULL (L, ...) cache arrays.

    The layer scan never slices the packed cache (the kernel's scalar-
    prefetched index maps select layer ``li`` directly) and the append is a
    set of row-level writes (ops.deployed.append_token_flash) — the whole
    step's HBM traffic is the compressed cache bytes plus the weights.
    """
    from .models.moe import MoEConfig, split_qkv, moe_ffn
    from .ops.pallas.flash_decode import flash_decode
    from .ops.pallas.flash_serial import flash_serial_decode

    attn_fn = (flash_serial_decode if dcfg.kernel == "flash_serial"
               else flash_decode)
    is_moe = isinstance(cfg, MoEConfig)
    B = token.shape[0]
    H, Dh = cfg.n_heads, cfg.d_head
    Hkv = cfg.n_kv_heads
    G = H // Hkv

    posb = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))
    cos, sin = llama.rope_cos_sin(posb, cfg)  # (B, Dh)

    x = jnp.take(params["embed"], token, axis=0)  # (B, D)
    arrays, _length = _split_cache(cache)

    def layer_fn(carry, scanned):
        x, arrs = carry
        lp, lq, li = scanned["p"], scanned["q"], scanned["i"]

        h = llama.norm(x, lp["ln_attn"], cfg)
        if is_moe:
            q, k, v = split_qkv(h @ lp["w_qkv"], cfg)
            q = q.reshape(B, H, Dh)
        else:
            q = (h @ lp["wq"]).reshape(B, H, Dh)
            k = h @ lp["wk"]
            v = h @ lp["wv"]

        # pass ``pos`` UN-broadcast: a scalar position takes the batch-wide
        # in-place append (see append_token_flash — the vmapped per-b form
        # lowers to full-array copies at B > 1)
        arrs = deployed.append_token_flash(
            arrs, lq, dcfg, cfg, k, v, pos, li
        )

        q_h = q.reshape(B, Hkv, G, Dh).astype(jnp.float32)
        q_rot = q_h * cos[:, None, None] + (
            llama.rotate_half(q_h) * sin[:, None, None]
        )
        attn = attn_fn(
            q_rot, arrs["k_planes"], arrs["v_planes"], arrs["kv_out"],
            dq.k_range, dq.k_offset, arrs["v_scale"], arrs["v_offset"],
            arrs["k_sink"], arrs["v_sink"], dq.k_lut_dec, dq.v_lut_dec,
            li, posb, dcfg, cfg, k_ressc=dq.k_ressc,
        )  # (B, Hkv, G, Dh)

        x = x + (attn.reshape(B, H * Dh).astype(x.dtype) @ lp["wo"])
        h = llama.norm(x, lp["ln_mlp"], cfg)
        if is_moe:
            x = x + moe_ffn(h[:, None], lp, cfg)[:, 0].astype(x.dtype)
        else:
            x = x + (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        return (x, arrs), None

    scanned = {
        "p": params["layers"], "q": dq,
        "i": jnp.arange(cfg.n_layers, dtype=jnp.int32),
    }
    (x, new_arrays), _ = jax.lax.scan(layer_fn, (x, arrays), scanned)

    x = llama.norm(x, params["final_norm"], cfg)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = (x @ head).astype(jnp.float32)
    return _merge_cache(new_arrays, posb + 1), logits


# ---------------------------------------------------------------------------
# generation loop
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int
    temperature: float = 0.0  # 0 => greedy
    top_p: float = 1.0
    eos_token_id: int | None = None


def _sample(logits, gcfg: GenerateConfig, key):
    if gcfg.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / gcfg.temperature
    if gcfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < gcfg.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def generate(
    params,
    cfg: ModelConfig,
    dcfg: DeployConfig,
    dq: DeployedQuant,
    prompt,  # (B, T0) int32
    gcfg: GenerateConfig,
    *,
    cache: KVCache | None = None,
    key=None,
    prefill_mode: str = "fp16",  # "fp16" (reference flash-then-pack
                                 # semantics) or "quantized" (chunked
                                 # quantized-trajectory prefill)
):
    """Prefill + fixed-length decode scan. Returns (tokens (B, N) int32,
    cache). Positions past ``dcfg.max_len`` or after EOS emit ``eos`` (or 0)
    — generation stops contributing but shapes stay static."""
    B, T0 = prompt.shape
    check_intn_codebook(dcfg, dq)
    if cache is None:
        cache = create_cache(dcfg, cfg.n_layers, B)
    if key is None:
        key = jax.random.PRNGKey(0)

    if prefill_mode == "quantized":
        cache, logits = prefill_quantized(params, cfg, dcfg, dq, cache, prompt)
    else:
        cache, logits = prefill(params, cfg, dcfg, dq, cache, prompt)

    pad_id = gcfg.eos_token_id if gcfg.eos_token_id is not None else 0

    def step(carry, key_t):
        cache, logits, pos, done = carry
        tok = _sample(logits, gcfg, key_t)
        tok = jnp.where(done, pad_id, tok)
        cache, next_logits = decode_step(params, cfg, dcfg, dq, cache, tok, pos)
        done_next = done | (pos + 1 >= dcfg.max_len)
        if gcfg.eos_token_id is not None:
            done_next = done_next | (tok == gcfg.eos_token_id)
        return (cache, next_logits, pos + 1, done_next), tok

    keys = jax.random.split(key, gcfg.max_new_tokens)
    init = (cache, logits, jnp.int32(T0), jnp.zeros((B,), bool))
    (cache, _, _, _), toks = jax.lax.scan(step, init, keys)
    return toks.T, cache  # (B, max_new_tokens)


# ---------------------------------------------------------------------------
# deployed perplexity check (the reference's --check oracle,
# deployment/llama.py:84-93: run token-by-token through the quantized cache
# and accumulate next-token NLL)
# ---------------------------------------------------------------------------


def deployed_ppl(
    params,
    cfg: ModelConfig,
    dcfg: DeployConfig,
    dq: DeployedQuant,
    tokens,  # (B, T) int32
    *,
    prefill_tokens: int = 0,
):
    """Token-by-token decode over ``tokens`` accumulating next-token NLL.
    ``prefill_tokens`` > 0 runs that prefix through the fp16 prefill path
    first (quantizing its KV) — matching deployed usage."""
    B, T = tokens.shape
    cache = create_cache(dcfg, cfg.n_layers, B)

    if prefill_tokens > dcfg.sink:
        t0 = prefill_tokens
        cache, logits = prefill(params, cfg, dcfg, dq, cache, tokens[:, :t0])
    else:
        # pure token-by-token path (the reference benchmark loop,
        # deployment/llama.py:72-87): decode the first token at position 0
        t0 = 1
        cache, logits = decode_step(
            params, cfg, dcfg, dq, cache, tokens[:, 0], jnp.int32(0)
        )

    def step(carry, t):
        cache, logits, total = carry
        tgt = jax.lax.dynamic_index_in_dim(tokens, t, axis=1, keepdims=False)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
        cache, next_logits = decode_step(
            params, cfg, dcfg, dq, cache, tgt, t
        )
        return (cache, next_logits, total + jnp.sum(nll)), None

    steps = jnp.arange(t0, T, dtype=jnp.int32)
    (cache, _, total), _ = jax.lax.scan(step, (cache, logits, jnp.float32(0)), steps)
    n = (T - t0) * B
    return float(jnp.exp(total / n))


# ---------------------------------------------------------------------------
# quantized-trajectory chunked prefill (no reference counterpart: the
# reference's prompt phase is fp16 flash-attn then parallel pack, so its
# prompt KV comes from an unquantized trajectory. Here each chunk attends
# over the already-quantized cache — bit-identical semantics to token-by-
# token decode, at block throughput, with memory bounded by the chunk)
# ---------------------------------------------------------------------------


def prefill_chunk(
    params,
    cfg: ModelConfig,
    dcfg: DeployConfig,
    dq: DeployedQuant,
    cache: KVCache,
    tok_blk,  # (B, Tq) int32: chunk tokens (+ leading sink rows if sink_fill)
    pos0,  # int32 absolute position of the chunk's first NON-SINK token
    sink_fill: bool,
):
    """One chunk of quantized-trajectory prefill: embed, run every layer's
    block_attention (append + attend over the already-quantized cache), and
    return (cache, logits (B, Tq, V)). Jit-friendly building block — the
    serving engine admits long prompts one chunk at a time with this so
    active slots never stall behind a whole-prompt prefill."""
    from .models.moe import MoEConfig, split_qkv, moe_ffn

    is_moe = isinstance(cfg, MoEConfig)
    H, Dh = cfg.n_heads, cfg.d_head

    x = jnp.take(params["embed"], tok_blk, axis=0)  # (B, Tq_all, D)
    arrays, length = _split_cache(cache)

    def layer_fn(x, scanned):
        lp = scanned["p"]
        cache_l = _merge_cache(scanned["c"], length)
        lq = scanned["q"]
        h = llama.norm(x, lp["ln_attn"], cfg)
        if is_moe:
            qp, k, v = split_qkv(h @ lp["w_qkv"], cfg)
            qp = qp.reshape(*x.shape[:2], H, Dh)
        else:
            qp = (h @ lp["wq"]).reshape(*x.shape[:2], H, Dh)
            k = h @ lp["wk"]
            v = h @ lp["wv"]
        cache_l, attn = deployed.block_attention(
            cache_l, lq, dcfg, cfg, qp, k, v, pos0,
            sink_fill=sink_fill,
        )
        x = x + (attn.astype(x.dtype) @ lp["wo"])
        h = llama.norm(x, lp["ln_mlp"], cfg)
        if is_moe:
            x = x + moe_ffn(h, lp, cfg).astype(x.dtype)
        else:
            x = x + (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        new_arrays, new_len = _split_cache(cache_l)
        return x, (new_arrays, new_len)

    scanned = {"p": params["layers"], "c": arrays, "q": dq}
    x, (new_arrays, new_lens) = jax.lax.scan(layer_fn, x, scanned)
    x = llama.norm(x, params["final_norm"], cfg)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = (x @ head).astype(jnp.float32)
    return _merge_cache(new_arrays, new_lens[0]), logits


def prefill_quantized(
    params,
    cfg: ModelConfig,
    dcfg: DeployConfig,
    dq: DeployedQuant,
    cache: KVCache,
    tokens,  # (B, T0) int32 prompt
    chunk: int = 256,  # multiple of 128
    max_scan_chunks: int | None = None,  # split the device scan into
    # host dispatches of at most this many chunks. Prefill is O(T0^2)
    # compute; a >=256K prompt in ONE dispatch runs many minutes and TPU
    # runtimes can kill the worker mid-execution (observed through the
    # remote tunnel). Segments re-dispatch at ~1.5-2s each — negligible
    # against multi-minute device time. None = single scan.
):
    """Chunked prefill through the quantized datapath. Returns
    (cache, logits_last (B, V) fp32). Pad tokens beyond T0 (to reach chunk
    alignment) are packed but masked from all real queries and overwritten
    by subsequent decode steps."""
    check_intn_codebook(dcfg, dq)
    B, T0 = tokens.shape
    S = dcfg.sink
    assert T0 > S, "prompt must extend beyond the sink prefix"
    assert chunk % 128 == 0

    n_pack = T0 - S
    n_chunks = -(-n_pack // chunk)
    # the padded prompt (incl. chunk-alignment pad tokens) must fit the
    # packed cache: block_attention's dynamic_update_slice would clamp the
    # start index and silently clobber the cache tail otherwise
    assert n_chunks * chunk <= dcfg.cache_tokens, (
        f"prompt needs {n_chunks * chunk} packed tokens "
        f"(chunk-aligned) but cache holds {dcfg.cache_tokens}"
    )
    pad = n_chunks * chunk - n_pack
    toks = jnp.pad(tokens, ((0, 0), (0, pad)))

    @partial(jax.jit, static_argnames=("sink_fill",), donate_argnums=(2,))
    def chunk_step(params, dq, cache, tok_blk, pos0, sink_fill):
        return prefill_chunk(
            params, cfg, dcfg, dq, cache, tok_blk, pos0, sink_fill
        )

    # chunk 0 carries the sink prefix
    cache, logits = chunk_step(
        params, dq, cache, toks[:, : S + chunk], jnp.int32(S), True
    )

    if n_chunks > 1:
        # Remaining chunks run in ONE device-side lax.scan (cache donated,
        # aliased in place). A host-driven per-chunk dispatch loop costs
        # ~1.5-2s of remote-execution latency per chunk through the axon
        # tunnel — at 64K/chunk=256 that was 256 dispatches dominating a
        # 617s prefill (NOTES_ROUND2); the scan makes long-prompt prefill
        # device-time-bound.
        blks = jnp.moveaxis(
            toks[:, S + chunk :].reshape(B, n_chunks - 1, chunk), 1, 0
        )  # (n_chunks-1, B, chunk)
        pos0s = S + chunk * jnp.arange(1, n_chunks, dtype=jnp.int32)

        @partial(jax.jit, donate_argnums=(2,))
        def rest_chunks(params, dq, cache, blks, pos0s):
            # one compiled program per distinct segment length (at most 2
            # under max_scan_chunks: the full segment and the remainder)
            arrays, length = _split_cache(cache)
            logits0 = jnp.zeros(
                (B, chunk, params["embed"].shape[0]), jnp.float32
            )

            def body(carry, xs):
                arrs, ln, _ = carry
                c = _merge_cache(arrs, ln)
                c, lg = prefill_chunk(
                    params, cfg, dcfg, dq, c, xs["t"], xs["p"], False
                )
                a, l = _split_cache(c)
                return (a, l, lg), None

            (arrays, length, logits), _ = jax.lax.scan(
                body, (arrays, length, logits0), {"t": blks, "p": pos0s}
            )
            return _merge_cache(arrays, length), logits

        if max_scan_chunks is None:
            cache, logits = rest_chunks(params, dq, cache, blks, pos0s)
        else:
            nrest = n_chunks - 1
            for a in range(0, nrest, max_scan_chunks):
                b = min(a + max_scan_chunks, nrest)
                cache, logits = rest_chunks(
                    params, dq, cache, blks[a:b], pos0s[a:b]
                )

    # logits of the last REAL token (pad-safe)
    last_in_chunk = (T0 - 1) - (S + (n_chunks - 1) * chunk) if n_chunks > 1 \
        else T0 - 1
    cache = dataclasses.replace(
        cache, length=jnp.full_like(cache.length, T0)
    )
    return cache, logits[:, last_in_chunk]
