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
