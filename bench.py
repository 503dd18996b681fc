"""Headline benchmark: quantized-KV decode throughput vs fp16-KV baseline.

Runs on the real TPU chip (the driver invokes this at the end of every
round). Prints ONE JSON line:
  {"metric": ..., "value": tok/s (quantized decode),
   "unit": "tok/s", "vs_baseline": speedup vs fp16-KV decode}

The reference's headline deployment claim is quantized-cache decode at long
context vs an fp16 cache (deployment/llama.py benchmark loop; north star
>=2x at 128K). Model size / context are environment-tunable:
  BENCH_CTX (default 131072), BENCH_STEPS (default 64), BENCH_BITS (default 4)
"""

from __future__ import annotations

import dataclasses
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

    # Headline = LONG-context decode (the reference's deployment claim is
    # long-context decode speed/size vs an fp16 cache; at short context the
    # step is weight-bandwidth-bound and the KV path barely matters).
    # Defaults = the measured-best TPU "speed config" at the north-star
    # context (BASELINE.md: >=2x vs fp16 KV at 128K): int4 hardware-dtype
    # codes + post-RoPE K + static-channel K outliers + no per-token V
    # slots (accuracy row "speed_config_cap0" in benchmarks/ppl_table.py:
    # simulated delta-ppl -0.018 vs fp16 on the trained-checkpoint gate),
    # BT=2048 token blocks (int4 halves VMEM vs nuq3, which OOMed there).
    # The round-1 nuq3 config remains fully benchable via the env knobs.
    ctx = int(os.environ.get("BENCH_CTX", 131072))
    # 64 steps: the int4 cache is zero-built INSIDE the timed jit (axon
    # boundary; see the int4 decode-loop note below) — 16 steps left ~0.3
    # ms/step of one-time build in the per-step figure
    steps = int(os.environ.get("BENCH_STEPS", 64))
    bits = int(os.environ.get("BENCH_BITS", 4))
    n_layers = int(os.environ.get("BENCH_LAYERS", 8))
    sparse = os.environ.get("BENCH_SPARSE", "1") == "1"
    with_fp16 = os.environ.get("BENCH_FP16", "1") == "1"
    batch = int(os.environ.get("BENCH_BATCH", 1))
    dot_bf16 = os.environ.get("BENCH_DOTBF16", "1") == "1"
    blk = int(os.environ.get("BENCH_BT", 2048))
    codes = os.environ.get("BENCH_CODES", "int4")  # nuq | int4 | int8 |
    # int4x2 (exact-density 2-bit pair container; set BENCH_BITS=2)
    post_rope = os.environ.get("BENCH_POSTROPE", "1") == "1"
    k_out = os.environ.get("BENCH_KOUT", "channels")  # slots | channels
    cap = int(os.environ.get("BENCH_CAP", 0))  # outlier slots per side
    # flash_serial (kernel-owned double-buffered DMA) + one 16-head group
    # + 16 residual channels is the measured-best decode config (round 5:
    # 178.7 tok/s = 3.19x fp16 at 128K vs 118.1 = 2.11x for flash/hg4;
    # 61.5 tok/s at 512K int4x2, 32.9 at 1M — NOTES_ROUND5.md). It is
    # only legal on post-RoPE intN storage; hg=16 needs cap0 (9-bit slot
    # index field) — other configs default to the pipelined flash kernel.
    speed_ok = codes != "nuq" and post_rope
    kernel = os.environ.get("BENCH_KERNEL",
                            "flash_serial" if speed_ok else "flash")
    head_group = int(os.environ.get(
        "BENCH_HEADGROUP", 16 if speed_ok and cap == 0 else 4))
    n_kv_pre = int(os.environ.get("BENCH_KVHEADS",
                                  os.environ.get("BENCH_HEADS", 16)))
    while n_kv_pre % head_group:  # DeployConfig.create halves likewise
        head_group //= 2
    # n_kc scales with head_group so the TOTAL residual-channel budget is
    # hg-invariant (channels are selected per group of hg heads)
    n_kc = int(os.environ.get("BENCH_NKC", 4 * head_group // 4))
    n_heads = int(os.environ.get("BENCH_HEADS", 16))
    n_kv = int(os.environ.get("BENCH_KVHEADS", n_heads))  # < heads => GQA
    moe = os.environ.get("BENCH_MOE", "0") == "1"  # DBRX-style MoE FFN
    scheme = f"nuq{bits}" if codes == "nuq" else f"{codes}_{bits}b"
    if post_rope:
        scheme += "_postk"
    if k_out == "channels":
        scheme += "_kch"
    if n_kv != n_heads:
        scheme += f"_gqa{n_heads}x{n_kv}"
    if moe:
        scheme += "_moe"

    # LLaMA-shaped model (random init — zero egress), bf16. BENCH_KVHEADS
    # below BENCH_HEADS benches a Llama-3-style GQA shape — the bytes/step
    # ratio changes materially (KV cache shrinks by heads/kv_heads on BOTH
    # sides, so the quant-vs-fp16 ratio at a given ctx moves toward the
    # weight-bound regime). BENCH_MOE=1 swaps in a DBRX-style fused-Wqkv
    # MoE FFN (reference P4/P6 family) at the same attention shape.
    if moe:
        from kvquant_tpu.models.moe import MoEConfig
        from kvquant_tpu.models.moe import init_params as moe_init

        cfg = MoEConfig(
            vocab_size=32000, d_model=2048, n_layers=n_layers,
            n_heads=n_heads, n_kv_heads=n_kv, d_head=128, d_ff=2816,
            max_seq_len=max(4096, ctx), n_experts=4, top_k=1,
        )
        params = moe_init(jax.random.PRNGKey(0), cfg)
    else:
        cfg = ModelConfig(
            vocab_size=32000, d_model=2048, n_layers=n_layers,
            n_heads=n_heads, n_kv_heads=n_kv, d_head=128, d_ff=5632,
            max_seq_len=max(4096, ctx),
        )
        params = init_params(jax.random.PRNGKey(0), cfg)

    # synthetic calibrated quantizers (NF signposts + random thresholds):
    # throughput does not depend on codebook values
    rng = np.random.default_rng(0)
    # intN storage needs an affine codebook (uniform grid); nuq benches the
    # NF-signpost mux path. Throughput is content-independent either way.
    lut = (nf_signposts(bits) if codes == "nuq"
           else np.linspace(-1, 1, 2 ** bits, dtype=np.float32))
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
        max_len=ctx + steps + 5, sink=5, kernel=kernel,
        include_sparse=sparse, head_group=head_group, dot_bf16=dot_bf16,
        codes=codes, post_rope_k=post_rope, k_outliers=k_out, n_kc=n_kc,
        cap_per_side=cap,
    )
    if kernel == "flash":
        import kvquant_tpu.ops.pallas.flash_decode as _fd
        import kvquant_tpu.ops.deployed as _dep
        # default block-tokens knob for the sweep harness
        _orig = _fd.flash_attention
        def _fa(*a, **kw):
            kw.setdefault("block_tokens", blk)
            return _orig(*a, **kw)
        _fd.flash_attention = _fa
        _fd.flash_decode.__defaults__ = (
            (blk,) + _fd.flash_decode.__defaults__[1:]
        )
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)

    # The decode loop must live ON DEVICE (lax.scan): per-dispatch round
    # trips through the remote-execution tunnel are seconds, and
    # block_until_ready is optimistic — only a scanned loop + value fetch
    # measures real device time.
    # The cache argument is DONATED (the loop writes it in place). Without
    # donation XLA keeps the input buffer AND a working copy — 2x cache
    # memory, which is exactly what blocks 1M-token contexts (measured:
    # "program 9.02G" = a second copy of the 2-bit 1M cache). Donation
    # invalidates the buffer, so each timed call rebuilds the cache first.
    # NOTE: the loop RETURNS the final cache so the donated input aliases
    # an output — donation without a matching output buffer is a no-op and
    # XLA keeps a second full cache ("program 9.02G" at 1M).
    def timed(loop_fn, make_cache, *args):
        c = make_cache()
        out, c = loop_fn(*args, c)  # compile + first run (consumes c)
        _ = float(out.sum())
        del c
        c = make_cache()
        _ = float(c.length.sum())  # sync: cache built before the timer
        t0 = time.perf_counter()
        out, c = loop_fn(*args, c)
        _ = float(out.sum())
        return steps / (time.perf_counter() - t0)

    # Caches are filled synthetically (random packed codes / random fp16
    # K/V): decode throughput does not depend on cache *contents*, and this
    # keeps the bench in the KV-bound regime at long context without paying
    # a full-prompt prefill per run.
    def synth_cache(key):
        # Decode throughput is content-independent (LUT mux, one-hot
        # outlier accumulate, and MXU dots do identical work for any
        # values), so the BIG arrays stay zero-filled — randint generation
        # of multi-GB planes spikes host/eager memory and blocked 1M-token
        # runs. Only the small per-token arrays get nonzero values.
        c = create_cache(dcfg, cfg.n_layers, batch)
        ks = jax.random.split(key, 4)
        return dataclasses.replace(
            c,
            v_scale=jax.random.uniform(ks[0], c.v_scale.shape) + 0.5,
            v_offset=jax.random.normal(ks[1], c.v_offset.shape) * 0.1,
            k_sink=jax.random.normal(ks[2], c.k_sink.shape) * 0.1,
            v_sink=jax.random.normal(ks[3], c.v_sink.shape) * 0.1,
            length=jnp.full_like(c.length, ctx),
        )

    with_quant = os.environ.get("BENCH_QUANT", "1") == "1"

    # NOTE: params/dq are jit *arguments* (closing over them would bake the
    # weights in as constants and blow up compile time)
    q_tps = 0.0
    if with_quant:
        log(f"quant decode ctx={ctx} bits={bits} kernel={kernel} ...")

        from functools import partial

        if codes in ("int4", "int4x2"):
            # int4 arrays cannot cross the jit boundary through the axon
            # tunnel client (S4 aval serialization recurses) — the cache is
            # created INSIDE the jit (content-independent zeros, same as
            # synth_cache) and never returned. Initialization is a one-time
            # ~cache-bytes write inside the timed region (<2% of a 16-step
            # loop at 32K). On a directly-attached TPU the ordinary
            # donated-cache path below works for int4 too.
            @jax.jit
            def q_decode_loop(p, d):
                c = synth_cache(jax.random.PRNGKey(2))
                tok = jnp.zeros((batch,), jnp.int32)
                def body(carry, i):
                    c, tok = carry
                    c, logits = engine.decode_step(
                        p, cfg, dcfg, d, c, tok, ctx + i
                    )
                    return (
                        (c, jnp.argmax(logits, -1).astype(jnp.int32)),
                        logits[0, 0],
                    )
                (c, _), outs = jax.lax.scan(
                    body, (c, tok), jnp.arange(steps, dtype=jnp.int32)
                )
                return outs

            out = q_decode_loop(params, dq)  # compile + first run
            _ = float(out.sum())
            t0 = time.perf_counter()
            out = q_decode_loop(params, dq)
            _ = float(out.sum())
            q_tps = steps / (time.perf_counter() - t0) * batch
        else:
            @partial(jax.jit, donate_argnums=(2,))
            def q_decode_loop(p, d, c):
                tok = jnp.zeros((batch,), jnp.int32)
                def body(carry, i):
                    c, tok = carry
                    c, logits = engine.decode_step(p, cfg, dcfg, d, c, tok, ctx + i)
                    return (c, jnp.argmax(logits, -1).astype(jnp.int32)), logits[0, 0]
                (c, _), outs = jax.lax.scan(
                    body, (c, tok), jnp.arange(steps, dtype=jnp.int32)
                )
                return outs, c

            q_tps = timed(
                q_decode_loop, lambda: synth_cache(jax.random.PRNGKey(2)),
                params, dq,
            ) * batch
        log(f"quant decode {q_tps:.2f} tok/s aggregate (batch {batch})")
    tok0 = jnp.zeros((batch,), jnp.int32)

    # fp16 baseline (skippable: at million-token contexts the fp16 cache
    # no longer fits in HBM — that is the point of this framework).
    # Measured in a FRESH SUBPROCESS: running it in-process after the quant
    # phase measured 3x slower than a fresh run (46.9 vs 135.8 tok/s at
    # 32K) — an in-process artifact that would flatter the quant ratio.
    if with_fp16 and with_quant:
        import subprocess
        env = dict(os.environ, BENCH_QUANT="0", BENCH_FP16="1")
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=3000,
        )
        f_tps = None
        for line in (r.stderr + r.stdout).splitlines():
            if "fp16 decode" in line:
                f_tps = float(line.split("fp16 decode")[1].split("tok/s")[0])
        if f_tps is None:
            log("fp16 subprocess failed; reporting vs_baseline=0\n"
                + r.stderr[-2000:])
            print(json.dumps({
                "metric": f"decode_toks_per_s_{scheme}_{kernel}_ctx{ctx}",
                "value": round(q_tps, 3), "unit": "tok/s", "vs_baseline": 0.0,
            }))
            return
        log(f"fp16 decode {f_tps:.2f} tok/s aggregate (fresh subprocess)")
        print(json.dumps({
            "metric": f"decode_toks_per_s_{scheme}_{kernel}_ctx{ctx}"
                      + (f"_b{batch}" if batch > 1 else ""),
            "value": round(q_tps, 3),
            "unit": "tok/s",
            "vs_baseline": round(q_tps / f_tps, 4),
        }))
        return

    if not with_fp16:
        print(json.dumps({
            "metric": f"decode_toks_per_s_{scheme}_{kernel}_ctx{ctx}",
            "value": round(q_tps, 3),
            "unit": "tok/s",
            "vs_baseline": 0.0,
        }))
        return
    def synth_fcache():
        # zero-filled for the same content-independence reason as
        # synth_cache (a random fp32 intermediate is 2x the cache bytes
        # and OOMs the 128K fp16 baseline before the run even starts)
        fc = baseline_fp16.create_fp16_cache(cfg, ctx + steps + 5, batch)
        return dataclasses.replace(
            fc, length=jnp.full_like(fc.length, ctx),
        )

    from functools import partial as _partial

    @_partial(jax.jit, donate_argnums=(1,))
    def f_decode_loop(p, c):
        tok = jnp.zeros((batch,), jnp.int32)
        def body(carry, i):
            c, tok = carry
            c, logits = baseline_fp16.decode_step(p, cfg, c, tok, ctx + i)
            return (c, jnp.argmax(logits, -1).astype(jnp.int32)), logits[0, 0]
        (c, _), outs = jax.lax.scan(
            body, (c, tok), jnp.arange(steps, dtype=jnp.int32)
        )
        return outs, c

    f_tps = timed(f_decode_loop, synth_fcache, params) * batch
    log(f"fp16 decode {f_tps:.2f} tok/s aggregate")

    print(json.dumps({
        "metric": f"decode_toks_per_s_{scheme}_{kernel}_ctx{ctx}"
                  + (f"_b{batch}" if batch > 1 else ""),
        "value": round(q_tps, 3),
        "unit": "tok/s",
        "vs_baseline": round(q_tps / f_tps, 4),
    }))


if __name__ == "__main__":
    main()
