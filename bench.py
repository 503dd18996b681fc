"""Headline benchmark: quantized-KV decode throughput vs fp16-KV baseline.

Runs on the real TPU chip (the driver invokes this at the end of every
round). Prints ONE JSON line:
  {"metric": ..., "value": tok/s (quantized decode),
   "unit": "tok/s", "vs_baseline": speedup vs fp16-KV decode}

The reference's headline deployment claim is quantized-cache decode at long
context vs an fp16 cache (deployment/llama.py benchmark loop; north star
>=2x at 128K). Model size / context are environment-tunable:
  BENCH_CTX (default 4096), BENCH_STEPS (default 32), BENCH_BITS (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from kvquant_tpu import engine, baseline_fp16
    from kvquant_tpu.cache import DeployConfig, create_cache, deployed_from_quantizers
    from kvquant_tpu.models.config import ModelConfig
    from kvquant_tpu.models.llama import init_params
    from kvquant_tpu.quant.artifacts import (
        KQuantizer, VQuantizer, LayerQuantizers, QuantizerSet,
    )
    from kvquant_tpu.quant.nuq import nf_signposts

    ctx = int(os.environ.get("BENCH_CTX", 2048))
    steps = int(os.environ.get("BENCH_STEPS", 16))
    bits = int(os.environ.get("BENCH_BITS", 3))
    n_layers = int(os.environ.get("BENCH_LAYERS", 8))

    # LLaMA-shaped model (random init — zero egress), bf16
    cfg = ModelConfig(
        vocab_size=32000, d_model=2048, n_layers=n_layers, n_heads=16,
        n_kv_heads=16, d_head=128, d_ff=5632, max_seq_len=max(4096, ctx),
    )
    params = init_params(jax.random.PRNGKey(0), cfg)

    # synthetic calibrated quantizers (NF signposts + random thresholds):
    # throughput does not depend on codebook values
    rng = np.random.default_rng(0)
    lut = nf_signposts(bits)
    layers = []
    for _ in range(cfg.n_layers):
        u = (np.abs(rng.normal(size=cfg.kv_hidden)) * 2 + 1).astype(np.float32)
        layers.append(LayerQuantizers(
            k=KQuantizer(upper=u, lower=(-u * 0.9).astype(np.float32), lut=lut.copy()),
            v=VQuantizer(lut=lut.copy()),
        ))
    qs = QuantizerSet(layers=layers, bits=bits, sparsity_threshold=0.99,
                      cap_outliers=True, first_few_fp16=5)

    dcfg = DeployConfig.create(
        bits=bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
        max_len=ctx + steps + 5, sink=5,
    )
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)

    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, ctx), 0, cfg.vocab_size)

    # The decode loop must live ON DEVICE (lax.scan): per-dispatch round
    # trips through the remote-execution tunnel are seconds, and
    # block_until_ready is optimistic — only a scanned loop + value fetch
    # measures real device time.
    def timed(loop_fn, *args):
        out = loop_fn(*args)  # compile + first run
        _ = float(out.sum())
        t0 = time.perf_counter()
        out = loop_fn(*args)
        _ = float(out.sum())
        return steps / (time.perf_counter() - t0)

    # NOTE: params/dq are jit *arguments* (closing over them would bake the
    # weights in as constants and blow up compile time)
    # quantized path
    log(f"quant prefill ctx={ctx} bits={bits} ...")
    t0 = time.time()
    qcache = create_cache(dcfg, cfg.n_layers, 1)
    qprefill = jax.jit(
        lambda p, d, c, t: engine.prefill(p, cfg, dcfg, d, c, t)
    )
    qcache, qlogits = qprefill(params, dq, qcache, prompt)
    _ = float(qlogits.sum())
    log(f"quant prefill done in {time.time()-t0:.1f}s; decode ...")

    @jax.jit
    def q_decode_loop(p, d, c, tok):
        def body(carry, i):
            c, tok = carry
            c, logits = engine.decode_step(p, cfg, dcfg, d, c, tok, ctx + i)
            return (c, jnp.argmax(logits, -1).astype(jnp.int32)), logits[0, 0]
        (_, _), outs = jax.lax.scan(
            body, (c, tok), jnp.arange(steps, dtype=jnp.int32)
        )
        return outs

    tok0 = jnp.argmax(qlogits, -1).astype(jnp.int32)
    q_tps = timed(q_decode_loop, params, dq, qcache, tok0)
    log(f"quant decode {q_tps:.2f} tok/s")

    # fp16 baseline
    t0 = time.time()
    fcache = baseline_fp16.create_fp16_cache(cfg, ctx + steps + 5, 1)
    fprefill = jax.jit(lambda p, c, t: baseline_fp16.prefill(p, cfg, c, t))
    fcache, flogits = fprefill(params, fcache, prompt)
    _ = float(flogits.sum())
    log(f"fp16 prefill done in {time.time()-t0:.1f}s; decode ...")

    @jax.jit
    def f_decode_loop(p, c, tok):
        def body(carry, i):
            c, tok = carry
            c, logits = baseline_fp16.decode_step(p, cfg, c, tok, ctx + i)
            return (c, jnp.argmax(logits, -1).astype(jnp.int32)), logits[0, 0]
        (_, _), outs = jax.lax.scan(
            body, (c, tok), jnp.arange(steps, dtype=jnp.int32)
        )
        return outs

    f_tps = timed(f_decode_loop, params, fcache, jnp.argmax(flogits, -1).astype(jnp.int32))
    log(f"fp16 decode {f_tps:.2f} tok/s")

    print(json.dumps({
        "metric": f"decode_toks_per_s_nuq{bits}_ctx{ctx}",
        "value": round(q_tps, 3),
        "unit": "tok/s",
        "vs_baseline": round(q_tps / f_tps, 4),
    }))


if __name__ == "__main__":
    main()
