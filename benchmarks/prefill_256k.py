""">=256K-token prompt prefill on one chip — the blockwise quantized-
trajectory prefill demonstration (VERDICT round-1 item 3 follow-through).

Prefill is O(T0^2) MXU compute in ANY precision (at 256K the 8-layer
2048-d bench model is ~2e18 FLOP — hours on one v5e), so the full-scale
bench-model demonstration runs at 64K, the toy model demonstrates the
>=256K machinery end-to-end, and the quadratic scaling between measured
points is reported. What the quantized path uniquely adds is MEMORY: the
256K fp16 cache would not leave room to grow toward the 512K/1M contexts
the nuq2/3 cache fits (NOTES_ROUND2 table).

Mechanics under test: blockwise flash prefill (nothing O(Tq x Tc)
materializes), chunks 2..n in device-side lax.scan SEGMENTS
(engine.prefill_quantized max_scan_chunks — a single >=256K dispatch ran
long enough that the TPU runtime killed the worker), dead-block-clamped
index maps (triangular cost), then decode steps prove the cache is live.

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/prefill_256k.py
Env: P256_MODEL (toy|bench, default toy), P256_CTX (262144),
P256_CHUNK (256), P256_SEG (64 chunks/dispatch), P256_STEPS (16),
P256_BITS (3, nuq codes — intN cannot cross the segment jit boundary
through the axon tunnel).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from kvquant_tpu import engine
    from kvquant_tpu.cache import (
        DeployConfig, create_cache, deployed_from_quantizers, cache_bytes,
    )
    from kvquant_tpu.models.config import ModelConfig
    from kvquant_tpu.models.llama import init_params
    from kvquant_tpu.quant.artifacts import (
        KQuantizer, VQuantizer, LayerQuantizers, QuantizerSet,
    )
    from kvquant_tpu.quant.nuq import nf_signposts

    model = os.environ.get("P256_MODEL", "toy")
    ctx = int(os.environ.get("P256_CTX", 262144))
    # chunk 128: the folded kernel's per-head (Q, BT) stack temporaries
    # scale with Q = G*(chunk+sink); since the MXU outlier-slot tiles
    # (Ek/Ekc/Eks + the stacked q.E products) joined the per-block stack,
    # chunk 256 exceeds the 16M scoped-vmem limit on both model shapes
    chunk = int(os.environ.get("P256_CHUNK", 128))
    seg = int(os.environ.get("P256_SEG", 64))
    steps = int(os.environ.get("P256_STEPS", 16))
    bits = int(os.environ.get("P256_BITS", 3))

    if model == "bench":
        cfg = ModelConfig(
            vocab_size=32000, d_model=2048, n_layers=8, n_heads=16,
            n_kv_heads=16, d_head=128, d_ff=5632, max_seq_len=ctx + 64,
        )
    else:
        from kvquant_tpu.utils.toymodel import TOY_CFG
        import dataclasses as _dc
        cfg = _dc.replace(TOY_CFG, max_seq_len=ctx + 64)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    lut = np.sort(nf_signposts(bits))
    C = cfg.n_kv_heads * cfg.d_head
    u = (np.abs(rng.normal(size=C)) * 2 + 1).astype(np.float32)
    qs = QuantizerSet(
        layers=[LayerQuantizers(
            k=KQuantizer(upper=u, lower=(-0.9 * u).astype(np.float32),
                         lut=lut.copy(),
                         ressc=rng.random(C).astype(np.float32)),
            v=VQuantizer(lut=lut.copy()),
        )] * cfg.n_layers,
        bits=bits, sparsity_threshold=0.99, cap_outliers=True,
        first_few_fp16=5,
    )
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)
    dcfg = DeployConfig.create(
        bits=bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
        max_len=ctx + steps + 8, sink=5, kernel="flash", head_group=4,
    )
    cb = cache_bytes(dcfg, cfg.n_layers, 1)
    print(f"[p256] model={model} ctx={ctx} chunk={chunk} seg={seg} "
          f"nuq{bits}: cache {cb['total'] / 1e6:.0f} MB "
          f"(fp16 {cb['fp16_baseline'] / 1e9:.1f} GB, "
          f"{cb['ratio']:.2f}x)", flush=True)

    prompt = jnp.asarray(
        rng.integers(0, cfg.vocab_size, size=(1, ctx)).astype(np.int32))

    t0 = time.perf_counter()
    cache = create_cache(dcfg, cfg.n_layers, 1)
    cache, lg = engine.prefill_quantized(
        params, cfg, dcfg, dq, cache, prompt, chunk=chunk,
        max_scan_chunks=seg,
    )
    t_prefill = time.perf_counter() - t0
    print(f"[p256] prefill {ctx} tokens: {t_prefill:.1f}s "
          f"({ctx / t_prefill:.0f} tok/s incl compile)", flush=True)

    @jax.jit
    def decode(params, dq, cache, t0tok):
        def body(carry, i):
            c, t = carry
            c, lg = engine.decode_step(params, cfg, dcfg, dq, c, t, ctx + i)
            return (c, jnp.argmax(lg, -1).astype(jnp.int32)), t
        (_, _), toks = jax.lax.scan(
            body, (cache, t0tok), jnp.arange(steps))
        return toks[:, 0]

    t0 = time.perf_counter()
    toks = np.asarray(
        decode(params, dq, cache, jnp.argmax(lg, -1).astype(jnp.int32)))
    t_dec = time.perf_counter() - t0
    print(f"[p256] {steps} decode steps off the prefilled cache: "
          f"{t_dec:.1f}s; continuation {toks[:8].tolist()}", flush=True)
    print(json.dumps({
        "metric": f"prefill_{model}_{ctx}_s", "value": round(t_prefill, 1),
        "unit": "s", "prefill_tok_per_s": round(ctx / t_prefill, 0),
    }))


if __name__ == "__main__":
    main()
