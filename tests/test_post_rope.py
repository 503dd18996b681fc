"""Post-RoPE K storage (DeployConfig.post_rope_k): keys quantized AFTER
rotary embedding so the deployed kernel does zero rotation work.

The oracle chain must hold exactly as for the pre-RoPE default: simulated
(post-rope hook) == deployed XLA == flash kernel, across storage formats.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvquant_tpu import engine
from kvquant_tpu.cache import DeployConfig, create_cache, deployed_from_quantizers
from kvquant_tpu.models import (
    TINY_LLAMA, TINY_GQA, init_params, forward, simquant_from_quantizers,
)
from kvquant_tpu.quant.calibration import collect_kv_activations, fit_quantizers


def _setup(cfg, bits=4, max_len=69, codes="int4", mode="uniform"):
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    cal = jax.random.randint(jax.random.PRNGKey(7), (2, 40), 0, cfg.vocab_size)
    # calibrate on ROPED key activations — the post-rope scheme's signal
    k_acts, v_acts = collect_kv_activations(params, cfg, [cal], rope_k=True)
    qs = fit_quantizers(
        k_acts, v_acts, bits=bits, sparsity_threshold=0.99, cap_outliers=True,
        first_few_fp16=5, sample_seqlen=40, kmeans_iters=10, mode=mode,
    )
    qs.meta["post_rope_k"] = True
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)

    def mk(kernel):
        return DeployConfig.create(
            bits=bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
            max_len=max_len, sink=5, kernel=kernel, dot_bf16=False,
            codes=codes, post_rope_k=True,
        )

    return params, qs, dq, mk


def _run_decode(params, cfg, dcfg, dq, tokens, batch=1):
    cache = create_cache(dcfg, cfg.n_layers, batch)
    step = jax.jit(
        lambda c, tok, pos: engine.decode_step(params, cfg, dcfg, dq, c, tok, pos)
    )
    outs = []
    for t in range(tokens.shape[1]):
        cache, logits = step(cache, tokens[:, t], jnp.int32(t))
        outs.append(logits)
    return cache, np.asarray(jnp.stack(outs, axis=1))


def test_decode_matches_simulated_post_rope():
    """Token-by-token deployed decode under post-rope storage must follow
    the simulated post-rope-hook forward (the correctness oracle)."""
    cfg = TINY_LLAMA
    params, qs, dq, mk = _setup(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 40), 0, cfg.vocab_size)

    sq = simquant_from_quantizers(qs, v_mode="topk", n_kv_heads=cfg.n_kv_heads)
    assert sq.config.post_rope_k  # picked up from the artifact meta
    sim_logits, _ = forward(params, cfg, tokens, simquant=sq)

    _, got = _run_decode(params, cfg, mk("xla"), dq, tokens)
    diff = np.abs(got - np.asarray(sim_logits))
    assert np.quantile(diff, 0.5) < 5e-3, np.quantile(diff, 0.5)
    assert diff.max() < 0.25, diff.max()
    agree = np.mean(
        np.argmax(got, -1) == np.argmax(np.asarray(sim_logits), -1)
    )
    assert agree > 0.95, agree


# fast tier keeps the cross pair (int4-mha, nuq-gqa); the other diagonal
# is exhaustive-tier
@pytest.mark.parametrize("cfg,codes", [
    pytest.param(TINY_LLAMA, "int4", id="int4-mha"),
    pytest.param(TINY_GQA, "nuq", id="nuq-gqa"),
    pytest.param(TINY_GQA, "int4", id="int4-gqa", marks=pytest.mark.slow),
    pytest.param(TINY_LLAMA, "nuq", id="nuq-mha", marks=pytest.mark.slow),
])
def test_flash_post_rope_single_step_tight(cfg, codes):
    params, qs, dq, mk0 = _setup(cfg, codes=codes,
                                 mode="uniform" if codes != "nuq" else "nuq")
    tokens = jax.random.randint(jax.random.PRNGKey(5), (1, 21), 0, cfg.vocab_size)
    cache, _ = _run_decode(params, cfg, mk0("xla"), dq, tokens[:, :20])

    def one(kernel):
        _, logits = engine.decode_step(
            params, cfg, mk0(kernel), dq, cache, tokens[:, 20], jnp.int32(20)
        )
        return np.asarray(logits)

    np.testing.assert_allclose(one("flash"), one("xla"), atol=2e-4, rtol=1e-4)


def test_post_rope_prefill_matches_decode():
    cfg = TINY_LLAMA
    params, qs, dq, mk = _setup(cfg, max_len=200)
    dcfg = mk("xla")
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 150), 0, cfg.vocab_size)
    cache_d, logits_d = _run_decode(params, cfg, dcfg, dq, tokens)
    cache_p, logits_p = engine.prefill_quantized(
        params, cfg, dcfg, dq, create_cache(dcfg, cfg.n_layers, 1), tokens,
        chunk=128,
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), logits_d[:, -1], atol=2e-3, rtol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(cache_p.k_planes.astype(jnp.int8))[..., : 150 - dcfg.sink, :],
        np.asarray(cache_d.k_planes.astype(jnp.int8))[..., : 150 - dcfg.sink, :],
    )


@pytest.mark.slow
def test_fp16_prefill_then_decode_post_rope():
    """prefill (fp16 trajectory, parallel pack of roped keys) + decode."""
    cfg = TINY_LLAMA
    params, qs, dq, mk = _setup(cfg, max_len=80)
    dcfg = mk("flash")
    prompt = jax.random.randint(jax.random.PRNGKey(4), (2, 40), 0, cfg.vocab_size)
    gcfg = engine.GenerateConfig(max_new_tokens=6)
    toks, _ = engine.generate(params, cfg, dcfg, dq, prompt, gcfg)
    assert toks.shape == (2, 6)
    # same prompt through the xla kernel: early tokens must agree
    toks_x, _ = engine.generate(params, cfg, mk("xla"), dq, prompt, gcfg)
    assert (np.asarray(toks)[:, :3] == np.asarray(toks_x)[:, :3]).all()
