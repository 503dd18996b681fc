"""Serial-mode flash-kernel latency: the decode-critical number.

bench_kernels.py measures kernels with 30-deep call overlap (operands
independent), which hides per-call DMA behind neighbouring calls' compute.
Real decode is layer-serial: layer n+1's queries depend on layer n's
output, so per-call costs ADD (NOTES_ROUND3 "serial-latency wall"). This
harness measures exactly that regime: a lax.scan chain where each flash
call's query block is derived from the previous call's output, over the
SAME cache buffers, with operands passed through the scan carry (see
NOTES_ROUND3 measurement artifact: closed-over zeros are rematerialized
inside the loop and inflate apparent bandwidth).

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/serial_kernel_bench.py \
      [--ctx 524288] [--bits 2] [--codes int4x2] [--bt 1024] [--steps 64]

Prints ms/call and effective HBM GB/s over the compressed cache bytes.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from kvquant_tpu.cache import DeployConfig
    from kvquant_tpu.models import ModelConfig
    from kvquant_tpu.ops.pallas.flash_decode import flash_attention

    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=524288)
    ap.add_argument("--bits", type=int, default=2)
    ap.add_argument("--codes", default="int4x2")
    ap.add_argument("--kv_heads", type=int, default=16)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--bt", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--layers", type=int, default=8,
                    help="distinct layer indices cycled in the chain")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    D, Hkv, H = 128, args.kv_heads, args.heads
    B, L = args.batch, args.layers
    dcfg = DeployConfig.create(
        bits=args.bits, n_kv_heads=Hkv, d_head=D, max_len=args.ctx + 8,
        codes=args.codes, post_rope_k=True, k_outliers="channels",
        cap_per_side=0, head_group=4, kernel="flash",
    )
    mcfg = ModelConfig(
        vocab_size=256, d_model=H * D, n_layers=L, n_heads=H,
        n_kv_heads=Hkv, d_head=D, d_ff=4 * H * D, max_seq_len=args.ctx + 8,
    )
    Tc = dcfg.cache_tokens
    S = dcfg.sink
    J = dcfg.n_slots
    G = H // Hkv
    key = jax.random.PRNGKey(0)

    cdt = dcfg.code_dtype
    hp = Hkv // 2 if args.codes == "int4x2" else Hkv
    kp = jax.random.randint(key, (L, B, hp, Tc, D), -8, 8, jnp.int32).astype(cdt)
    vp = jax.random.randint(key, (L, B, hp, Tc, D), -8, 8, jnp.int32).astype(cdt)
    ow = jax.random.normal(key, (L, B, dcfg.n_groups, J, Tc), jnp.float32)
    vsc = jnp.abs(jax.random.normal(key, (L, B, Tc))) + 0.5
    voff = jax.random.normal(key, (L, B, Tc)) * 0.01
    k_range = jnp.abs(jax.random.normal(key, (L, Hkv, D))) + 0.5
    k_offset = jax.random.normal(key, (L, Hkv, D)) * 0.01
    k_sink = jax.random.normal(key, (L, B, Hkv, S, D), jnp.float32)
    v_sink = jax.random.normal(key, (L, B, Hkv, S, D), jnp.float32)
    lut = jnp.linspace(-1.0, 1.0, 2 ** args.bits, dtype=jnp.float32)
    k_lut = jnp.tile(lut, (L, 1))
    v_lut = jnp.tile(lut, (L, 1))
    k_ressc = jnp.abs(jax.random.normal(key, (L, Hkv * D)))
    pos = jnp.full((B,), args.ctx - 2, jnp.int32)
    q0 = jax.random.normal(key, (B, Hkv, G, D), jnp.float32)

    def call(q, li):
        return flash_attention(
            q, kp, vp, ow, k_range, k_offset, vsc, voff, k_sink, v_sink,
            k_lut, v_lut, li, pos, dcfg, mcfg,
            block_tokens=args.bt, k_ressc=k_ressc,
        )

    @jax.jit
    def chain(q0, kp, vp, ow, vsc, voff):
        # operands enter via function args (not closure) so XLA cannot
        # rematerialize them inside the loop
        def body(q, li):
            out = call(q, li)
            # cheap serial dependency: next q derives from this out
            q2 = out * 1e-6 + q0
            return q2, None
        q, _ = jax.lax.scan(
            body, q0, jnp.arange(L, dtype=jnp.int32)
        )
        return q

    # warm up (compile)
    r = chain(q0, kp, vp, ow, vsc, voff)
    r.block_until_ready()

    t0 = time.perf_counter()
    n_rep = max(1, args.steps // L)
    for _ in range(n_rep):
        r = chain(q0, kp, vp, ow, vsc, voff)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / (n_rep * L)

    code_bytes = {"nuq": args.bits * D * Hkv / 8.0,
                  "int4": D * Hkv / 2.0, "int8": float(D * Hkv),
                  "int4x2": D * Hkv / 4.0}[args.codes]
    live_rows = (dcfg.n_kc + 2 * dcfg.cap_per_side
                 if dcfg.k_outliers == "channels" else 4 * dcfg.cap_per_side)
    bytes_step = B * args.ctx * (2 * code_bytes
                                 + dcfg.n_groups * live_rows * 4 + 8)
    print(f"serial flash call: {dt * 1e3:.3f} ms/layer  "
          f"({bytes_step / dt / 1e9:.0f} GB/s effective over live bytes)")
    print(f"  config: ctx={args.ctx} codes={args.codes} bits={args.bits} "
          f"BT={args.bt} Hkv={Hkv} B={B}")


if __name__ == "__main__":
    main()
