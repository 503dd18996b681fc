"""Manual-DMA serial decode kernel (ops/pallas/flash_serial.py): must match
the XLA oracle datapath on the deployed speed storage modes (post-RoPE
intN/int4x2, channels or capped-slot outliers), including GQA shapes and
sink-only early steps. Same oracle treatment as test_int4x2."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvquant_tpu import engine
from kvquant_tpu.cache import DeployConfig, create_cache, deployed_from_quantizers
from kvquant_tpu.models import TINY_LLAMA, TINY_GQA, init_params
from kvquant_tpu.quant.calibration import collect_kv_activations, fit_quantizers


def _setup(cfg, bits, **dkw):
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    cal = jax.random.randint(jax.random.PRNGKey(7), (2, 40), 0, cfg.vocab_size)
    k_acts, v_acts = collect_kv_activations(params, cfg, [cal])
    qs = fit_quantizers(
        k_acts, v_acts, bits=bits, sparsity_threshold=0.99, cap_outliers=True,
        first_few_fp16=5, sample_seqlen=40, kmeans_iters=10, mode="uniform",
    )
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)

    def mk(kernel, codes, **kw):
        merged = dict(dkw)
        merged.update(kw)
        return DeployConfig.create(
            bits=bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
            max_len=69, sink=5, kernel=kernel, dot_bf16=False, codes=codes,
            head_group=2, post_rope_k=True, **merged,
        )

    return params, dq, mk


def _run_decode(params, cfg, dcfg, dq, tokens):
    cache = create_cache(dcfg, cfg.n_layers, 1)
    step = jax.jit(
        lambda c, tok, pos: engine.decode_step(params, cfg, dcfg, dq, c, tok, pos)
    )
    outs = []
    for t in range(tokens.shape[1]):
        cache, logits = step(cache, tokens[:, t], jnp.int32(t))
        outs.append(logits)
    return cache, np.asarray(jnp.stack(outs, axis=1))


@pytest.mark.parametrize("cfg", [TINY_LLAMA, TINY_GQA], ids=["mha", "gqa"])
@pytest.mark.parametrize(
    "codes,bits,kw",
    [
        ("int4x2", 2, dict(k_outliers="channels", n_kc=2, cap_per_side=0)),
        ("int4", 4, dict(k_outliers="channels", n_kc=2, cap_per_side=0)),
        ("int4", 3, dict(k_outliers="slots", cap_per_side=2)),
    ],
    ids=["x2-speed", "int4-speed", "int4-slots"],
)
def test_flash_serial_matches_xla(cfg, codes, bits, kw):
    """Full 30-token trajectory (covers sink-only steps, first live block,
    and block crossings) through the serial kernel vs the XLA oracle."""
    params, dq, mk = _setup(cfg, bits)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (1, 30), 0, cfg.vocab_size
    )
    _, logits_x = _run_decode(params, cfg, mk("xla", codes, **kw), dq, tokens)
    _, logits_s = _run_decode(
        params, cfg, mk("flash_serial", codes, **kw), dq, tokens
    )
    np.testing.assert_allclose(logits_s, logits_x, atol=3e-4, rtol=1e-4)


def test_flash_serial_matches_flash_pipelined():
    """Serial kernel == pipelined flash kernel on the int4x2 speed config
    (identical math, different pipeline ownership)."""
    cfg = TINY_LLAMA
    params, dq, mk = _setup(cfg, 2)
    kw = dict(k_outliers="channels", n_kc=2, cap_per_side=0)
    tokens = jax.random.randint(
        jax.random.PRNGKey(3), (1, 25), 0, cfg.vocab_size
    )
    _, lf = _run_decode(params, cfg, mk("flash", "int4x2", **kw), dq, tokens)
    _, ls = _run_decode(
        params, cfg, mk("flash_serial", "int4x2", **kw), dq, tokens
    )
    np.testing.assert_allclose(ls, lf, atol=3e-4, rtol=1e-4)


def test_flash_serial_batched_unequal_positions():
    """B=2 with unequal per-slot positions exercises the kernel's
    per-batch grid dimension (pos_ref[b], per-b nt_live, per-b DMA
    slices) directly — plus head_group == n_kv_heads (the single-group
    configuration the round-5 headline bench runs)."""
    from kvquant_tpu.cache import DeployConfig
    from kvquant_tpu.models.config import ModelConfig
    from kvquant_tpu.ops.packing import store_codes_int
    from kvquant_tpu.ops.pallas.flash_serial import flash_serial_decode
    from kvquant_tpu.ops.pallas.flash_decode import flash_attention

    L, B, Hkv, G, D, bits = 2, 2, 4, 1, 16, 4
    Tc, S = 512, 5
    mcfg = ModelConfig(vocab_size=64, d_model=Hkv * D, n_layers=L,
                       n_heads=Hkv * G, n_kv_heads=Hkv, d_head=D, d_ff=32,
                       max_seq_len=Tc + 64)

    def mkd(hg):
        return DeployConfig.create(
            bits=bits, n_kv_heads=Hkv, d_head=D, max_len=Tc + S, sink=S,
            kernel="flash_serial", dot_bf16=False, head_group=hg,
            codes="int4", post_rope_k=True, k_outliers="channels",
            n_kc=hg, cap_per_side=0,
        )

    ks = jax.random.split(jax.random.PRNGKey(5), 14)
    codes4 = lambda k: store_codes_int(
        jax.random.randint(k, (L, B, Hkv, Tc, D), 0, 16), bits,
        jnp.int4,
    )
    kp, vp = codes4(ks[1]), codes4(ks[2])
    mk_args = lambda dcfg: (
        jax.random.normal(ks[0], (B, Hkv, G, D), jnp.float32),
        kp, vp,
        jax.random.normal(ks[3], (L, B, Hkv // dcfg.head_group,
                                  dcfg.n_slots, Tc)) * 0.1,
        jax.random.uniform(ks[5], (L, Hkv, D)) + 0.5,
        jax.random.normal(ks[6], (L, Hkv, D)) * 0.1,
        jax.random.uniform(ks[7], (L, B, Tc)) + 0.5,
        jax.random.normal(ks[8], (L, B, Tc)) * 0.1,
        jax.random.normal(ks[9], (L, B, Hkv, S, D)),
        jax.random.normal(ks[10], (L, B, Hkv, S, D)),
        jnp.stack([jnp.linspace(-1.0, 1.0, 2**bits)] * L),
        jnp.stack([jnp.linspace(-1.0, 1.0, 2**bits)] * L),
    )
    # unequal per-slot positions: slot 0 deep in block 2, slot 1 in the
    # first live block (different nt_live per b)
    pos = jnp.array([457, 37], jnp.int32)
    ressc = jax.random.uniform(ks[13], (L, Hkv * D))

    for hg in (2, Hkv):
        dcfg = mkd(hg)
        args = mk_args(dcfg)
        got = flash_serial_decode(*args, jnp.int32(1), pos, dcfg, mcfg,
                                  block_tokens=256, k_ressc=ressc)
        want = flash_attention(*args, jnp.int32(1), pos, dcfg, mcfg,
                               block_tokens=256, k_ressc=ressc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
