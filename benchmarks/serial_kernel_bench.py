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
      [--ctx 524288] [--bits 2] [--codes int4x2] [--bt 1024] [--steps 64] \
      [--kernel flash|flash_serial]

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
    from kvquant_tpu.ops.pallas.flash_serial import flash_serial_decode

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
    ap.add_argument("--kernel", default="flash",
                    choices=["flash", "flash_serial"])
    ap.add_argument("--hg", type=int, default=4, help="head_group")
    ap.add_argument("--dot_bf16", type=int, default=1)
    args = ap.parse_args()

    D, Hkv, H = 128, args.kv_heads, args.heads
    B, L = args.batch, args.layers
    dcfg = DeployConfig.create(
        bits=args.bits, n_kv_heads=Hkv, d_head=D, max_len=args.ctx + 8,
        codes=args.codes, post_rope_k=True, k_outliers="channels",
        cap_per_side=0, head_group=args.hg, kernel=args.kernel,
        dot_bf16=bool(args.dot_bf16),
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
    # Big cache operands are ZERO-filled: decode kernel time is
    # content-independent (same DMA bytes, same MXU work for any values —
    # see bench.py synth_cache note), and random generation materializes an
    # int32 intermediate 8x the int4 size, which OOMs HBM at 512K+ (16.06G
    # of 15.75G measured). int4 arrays cannot cross the axon-tunnel jit
    # boundary (S4 aval serialization recurses — bench.py int4 note), so
    # the code planes are created INSIDE the jitted chain and threaded
    # through the scan CARRY, which forces XLA to keep them materialized
    # across iterations (NOTES_ROUND3 measurement artifact).
    code_shape = (L, B, hp, Tc, D)
    ow = jnp.zeros((L, B, dcfg.n_groups, J, Tc), jnp.float32)
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

    attn_fn = (flash_serial_decode if args.kernel == "flash_serial"
               else flash_attention)

    @jax.jit
    def chain(q0, ow, vsc, voff):
        # non-code operands enter via function args (not closure) so XLA
        # cannot rematerialize them inside the loop; the intN code planes
        # are built here (zeros, content-independent) and ride the scan
        # CARRY — carried loop state is materialized once and aliased in
        # place, never re-broadcast per step.
        kp = jnp.zeros(code_shape, cdt)
        vp = jnp.zeros(code_shape, cdt)

        def body(carry, li):
            q, kp, vp = carry
            out = attn_fn(
                q, kp, vp, ow, k_range, k_offset, vsc, voff, k_sink,
                v_sink, k_lut, v_lut, li, pos, dcfg, mcfg,
                block_tokens=args.bt, k_ressc=k_ressc,
            )
            # cheap serial dependency: next q derives from this out
            q2 = out * 1e-6 + q0
            return (q2, kp, vp), None
        # ALL repetitions live inside one dispatch: per-call round trips
        # through the axon remote-execution tunnel are milliseconds-to-
        # seconds and would otherwise pollute the per-layer figure
        (q, _, _), _ = jax.lax.scan(
            body, (q0, kp, vp),
            jnp.tile(jnp.arange(L, dtype=jnp.int32), args.steps // L),
        )
        return q

    # warm up (compile)
    r = chain(q0, ow, vsc, voff)
    r.block_until_ready()

    n_calls = (args.steps // L) * L
    t0 = time.perf_counter()
    r = chain(q0, ow, vsc, voff)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / n_calls

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
          f"BT={args.bt} Hkv={Hkv} B={B} kernel={args.kernel} "
          f"hg={args.hg} bf16={args.dot_bf16}")


if __name__ == "__main__":
    main()
