"""Full-model engine tests: prefill + scanned decode over the packed cache
must agree with the simulated-quantization forward (the correctness oracle),
and generation must be static-shape and deterministic."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvquant_tpu import engine
from kvquant_tpu.cache import DeployConfig, create_cache, deployed_from_quantizers
from kvquant_tpu.models import TINY_LLAMA, init_params, forward, simquant_from_quantizers
from kvquant_tpu.models.config import ModelConfig
from kvquant_tpu.quant.calibration import collect_kv_activations, fit_quantizers


@pytest.fixture(scope="module")
def setup():
    cfg = TINY_LLAMA
    # fp32 params so the deployed and simulated paths agree to fp32 tolerance
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # calibrate on a DIFFERENT stream than we evaluate: calibration thresholds
    # coincide exactly with calibration-data values (trimmed max), making
    # outlier membership of those very values flip on fp noise
    cal_tokens = jax.random.randint(jax.random.PRNGKey(7), (2, 40), 0, cfg.vocab_size)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 40), 0, cfg.vocab_size)
    k_acts, v_acts = collect_kv_activations(params, cfg, [cal_tokens])
    qs = fit_quantizers(
        k_acts, v_acts, bits=4, sparsity_threshold=0.99, cap_outliers=True,
        first_few_fp16=5, sample_seqlen=40, kmeans_iters=10,
    )
    dcfg = DeployConfig.create(
        bits=4, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head, max_len=69,
        sink=5,
    )
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)
    sq = simquant_from_quantizers(qs, v_mode="topk", n_kv_heads=cfg.n_kv_heads)
    return cfg, params, tokens, dcfg, dq, sq


class TestEngineEquivalence:
    def test_pure_decode_matches_simulated_forward(self, setup):
        # Token-by-token decode from an empty cache follows the same
        # quantized-trajectory as the simulated forward, so logits must agree
        # to fp32 tolerance. (Prefill packs K/V from the full-precision
        # prompt trajectory — the reference's flash-attn prompt phase — so it
        # matches only at the ppl level; see test_deployed_ppl below.)
        cfg, params, tokens, dcfg, dq, sq = setup
        T = tokens.shape[1]

        sim_logits, _ = forward(params, cfg, tokens, simquant=sq)

        cache = create_cache(dcfg, cfg.n_layers, 1)
        step = jax.jit(
            lambda c, tok, pos: engine.decode_step(
                params, cfg, dcfg, dq, c, tok, pos
            )
        )
        got = []
        for t in range(T):
            cache, logits = step(cache, tokens[:, t], jnp.int32(t))
            got.append(logits)
        got = jnp.stack(got, axis=1)  # (1, T, V): predictions for pos 1..T
        # per-token V ranges are defined by the token's own (cap+1)-th extreme,
        # so the boundary element is an exact tie: fp noise between the two
        # compiled programs flips it between exact-outlier and quantized.
        # Sparse moderate diffs are therefore expected; wiring bugs would give
        # large diffs everywhere — assert the bulk is tight and the tail small.
        # (flips propagate through the trajectory, so later positions carry a
        # small perturbation everywhere — judge bulk, tail, and decisions)
        diff = np.abs(np.asarray(got) - np.asarray(sim_logits))
        assert np.quantile(diff, 0.5) < 5e-3, np.quantile(diff, 0.5)
        assert diff.max() < 0.25, diff.max()
        agree = np.mean(
            np.argmax(np.asarray(got), -1) == np.argmax(np.asarray(sim_logits), -1)
        )
        assert agree > 0.95, agree

    def test_deployed_ppl_close_to_simulated(self, setup):
        cfg, params, tokens, dcfg, dq, sq = setup
        from kvquant_tpu.evals import perplexity

        sim_ppl = perplexity(params, cfg, tokens, simquant=sq)
        dep_ppl = engine.deployed_ppl(params, cfg, dcfg, dq, tokens)
        # token 0 isn't scored in the deployed loop; allow small slack
        assert abs(np.log(dep_ppl) - np.log(sim_ppl)) < 0.15

    def test_generate_shapes_and_determinism(self, setup):
        cfg, params, tokens, dcfg, dq, sq = setup
        gcfg = engine.GenerateConfig(max_new_tokens=8)
        out1, cache = engine.generate(params, cfg, dcfg, dq, tokens[:, :16], gcfg)
        out2, _ = engine.generate(params, cfg, dcfg, dq, tokens[:, :16], gcfg)
        assert out1.shape == (1, 8)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        assert int(cache.length[0]) == 16 + 8

    def test_generate_sampled(self, setup):
        cfg, params, tokens, dcfg, dq, sq = setup
        gcfg = engine.GenerateConfig(max_new_tokens=4, temperature=0.8, top_p=0.9)
        out, _ = engine.generate(
            params, cfg, dcfg, dq, tokens[:, :16], gcfg, key=jax.random.PRNGKey(3)
        )
        assert out.shape == (1, 4)
        assert int(out.min()) >= 0 and int(out.max()) < cfg.vocab_size


class TestSlidingWindowDecode:
    def test_matches_simulated_forward(self):
        import dataclasses
        from kvquant_tpu.quant.calibration import collect_kv_activations, fit_quantizers
        cfg = dataclasses.replace(TINY_LLAMA, sliding_window=12)
        params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        cal = jax.random.randint(jax.random.PRNGKey(7), (2, 32), 0, cfg.vocab_size)
        tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 32), 0, cfg.vocab_size)
        k_acts, v_acts = collect_kv_activations(params, cfg, [cal])
        qs = fit_quantizers(k_acts, v_acts, bits=4, cap_outliers=True,
                            first_few_fp16=5, sample_seqlen=32, kmeans_iters=8)
        dcfg = DeployConfig.create(bits=4, n_kv_heads=cfg.n_kv_heads,
                                   d_head=cfg.d_head, max_len=37, sink=5)
        dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)
        sq = simquant_from_quantizers(qs, n_kv_heads=cfg.n_kv_heads)

        sim_logits, _ = forward(params, cfg, tokens, simquant=sq)
        cache = create_cache(dcfg, cfg.n_layers, 1)
        got = []
        step = jax.jit(lambda c, t, p: engine.decode_step(params, cfg, dcfg, dq, c, t, p))
        for t in range(tokens.shape[1]):
            cache, logits = step(cache, tokens[:, t], jnp.int32(t))
            got.append(logits)
        diff = np.abs(np.asarray(jnp.stack(got, 1)) - np.asarray(sim_logits))
        assert np.quantile(diff, 0.5) < 5e-3, np.quantile(diff, 0.5)
        assert diff.max() < 0.3, diff.max()


class TestQuantizedPrefill:
    def test_matches_pure_decode_exactly(self, setup):
        """Chunked quantized-trajectory prefill must reproduce the token-by-
        token decode trajectory: same cache contents, same next logits."""
        import dataclasses as dc
        cfg, params, tokens, dcfg, dq, sq = setup
        # dot_bf16 off so both paths contract identically
        dcfg = dc.replace(dcfg, dot_bf16=False, max_len=261 + dcfg.sink)
        T = tokens.shape[1]

        # path A: token-by-token decode
        cache_a = create_cache(dcfg, cfg.n_layers, 1)
        step = jax.jit(
            lambda c, tok, pos: engine.decode_step(params, cfg, dcfg, dq, c, tok, pos)
        )
        for t in range(T):
            cache_a, logits_a = step(cache_a, tokens[:, t], jnp.int32(t))

        # path B: chunked quantized prefill (chunk 128, T=40 -> 1 padded chunk)
        cache_b = create_cache(dcfg, cfg.n_layers, 1)
        cache_b, logits_b = engine.prefill_quantized(
            params, cfg, dcfg, dq, cache_b, tokens, chunk=128
        )

        # the same trajectory modulo V-range boundary ties (the token's own
        # (r+1)-th extreme defines its range, so fp noise between the two
        # differently-fused programs can flip boundary elements between
        # exact-outlier and quantized — same brittleness as the sim oracle)
        diff = np.abs(np.asarray(logits_b) - np.asarray(logits_a))
        assert np.median(diff) < 5e-3, np.median(diff)
        assert diff.max() < 0.25, diff.max()
        assert int(np.argmax(np.asarray(logits_b))) == int(
            np.argmax(np.asarray(logits_a))
        )
        # exact agreement on the sink prefix (no quantization there)
        for name in ["k_sink", "v_sink"]:
            np.testing.assert_allclose(
                np.asarray(getattr(cache_a, name)),
                np.asarray(getattr(cache_b, name)), atol=2e-5, rtol=1e-4,
                err_msg=name,
            )

    def test_decode_continues_after_quantized_prefill(self, setup):
        import dataclasses as dc
        cfg, params, tokens, dcfg, dq, sq = setup
        dcfg = dc.replace(dcfg, max_len=261 + dcfg.sink)
        cache = create_cache(dcfg, cfg.n_layers, 1)
        cache, logits = engine.prefill_quantized(
            params, cfg, dcfg, dq, cache, tokens, chunk=128
        )
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        cache, nxt = engine.decode_step(
            params, cfg, dcfg, dq, cache, tok, jnp.int32(tokens.shape[1])
        )
        assert bool(jnp.isfinite(nxt).all())


class TestGenerateQuantizedPrefillMode:
    def test_generate_with_quantized_prefill(self, setup):
        import dataclasses as dc
        cfg, params, tokens, dcfg, dq, sq = setup
        dcfg = dc.replace(dcfg, max_len=261 + dcfg.sink)
        out, cache = engine.generate(
            params, cfg, dcfg, dq, tokens[:, :20],
            engine.GenerateConfig(max_new_tokens=4),
            prefill_mode="quantized",
        )
        assert out.shape == (1, 4)
        assert int(cache.length[0]) == 24
