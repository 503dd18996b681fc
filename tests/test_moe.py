"""DBRX-style MoE model tests: fused-Wqkv slicing, top-k routing,
calibration -> simulated ppl, and deployed decode through the shared engine
(beyond-reference: the reference only simulates DBRX quantization)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvquant_tpu import engine
from kvquant_tpu.cache import DeployConfig, deployed_from_quantizers
from kvquant_tpu.evals import perplexity
from kvquant_tpu.models import moe, simquant_from_quantizers, get_forward
from kvquant_tpu.quant.calibration import collect_kv_activations, fit_quantizers


@pytest.fixture(scope="module")
def setup():
    cfg = moe.TINY_MOE
    params = moe.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 48), 0, cfg.vocab_size)
    return cfg, params, tokens


class TestMoEForward:
    def test_shapes_and_dispatch(self, setup):
        cfg, params, tokens = setup
        assert get_forward(cfg) is moe.forward
        logits, aux = moe.forward(params, cfg, tokens, capture_kv=True)
        assert logits.shape == (2, 48, cfg.vocab_size)
        assert bool(jnp.isfinite(logits).all())
        assert aux["k_acts"].shape == (cfg.n_layers, 2, 48, cfg.kv_hidden)

    def test_causality(self, setup):
        cfg, params, tokens = setup
        l1, _ = moe.forward(params, cfg, tokens)
        l2, _ = moe.forward(params, cfg, tokens.at[:, 30:].set(1))
        np.testing.assert_allclose(
            np.asarray(l1[:, :30]), np.asarray(l2[:, :30]), atol=1e-4, rtol=1e-3
        )

    def test_router_topk_sparsity(self, setup):
        cfg, params, tokens = setup
        # routing weights: only top_k experts nonzero per token
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.d_model))
        lp = jax.tree.map(lambda a: a[0], params["layers"])
        logits = (x @ lp["w_router"]).astype(jnp.float32)
        top_vals, _ = jax.lax.top_k(logits, cfg.top_k)
        w = jax.nn.softmax(
            jnp.where(logits >= top_vals[..., -1:], logits, -jnp.inf), -1
        )
        nonzero = (np.asarray(w) > 1e-9).sum(-1)
        assert (nonzero == cfg.top_k).all()


class TestMoEQuantPipeline:
    def test_calibrate_simulate_deploy(self, setup):
        cfg, params, tokens = setup
        cal = jax.random.randint(jax.random.PRNGKey(7), (2, 48), 0, cfg.vocab_size)
        k_acts, v_acts = collect_kv_activations(params, cfg, [cal])
        qs = fit_quantizers(
            k_acts, v_acts, bits=4, cap_outliers=True, first_few_fp16=5,
            sample_seqlen=48, kmeans_iters=8,
        )
        sq = simquant_from_quantizers(qs, n_kv_heads=cfg.n_kv_heads)

        ppl_fp = perplexity(params, cfg, tokens[:1])
        ppl_q = perplexity(params, cfg, tokens[:1], simquant=sq)
        assert np.isfinite(ppl_q) and ppl_q > 0
        assert ppl_q < ppl_fp * 1.5 + 50

        # deployed decode through the shared engine (GQA kv heads)
        dcfg = DeployConfig.create(
            bits=4, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
            max_len=69, sink=5,
        )
        dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)
        dep = engine.deployed_ppl(params, cfg, dcfg, dq, tokens[:1])
        sim = perplexity(params, cfg, tokens[:1], simquant=sq)
        assert abs(np.log(dep) - np.log(sim)) < 0.2, (dep, sim)

        out, cache = engine.generate(
            params, cfg, dcfg, dq, tokens[:1, :16],
            engine.GenerateConfig(max_new_tokens=4),
        )
        assert out.shape == (1, 4)


class TestMoEQuantizedPrefill:
    def test_prefill_quantized_moe(self, setup):
        cfg, params, tokens = setup
        import dataclasses
        from kvquant_tpu.quant.calibration import collect_kv_activations, fit_quantizers
        cal = jax.random.randint(jax.random.PRNGKey(9), (1, 48), 0, cfg.vocab_size)
        k_acts, v_acts = collect_kv_activations(params, cfg, [cal])
        qs = fit_quantizers(k_acts, v_acts, bits=4, cap_outliers=True,
                            first_few_fp16=5, sample_seqlen=48, kmeans_iters=5)
        dcfg = DeployConfig.create(bits=4, n_kv_heads=cfg.n_kv_heads,
                                   d_head=cfg.d_head, max_len=261 + 5, sink=5)
        dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)
        from kvquant_tpu.cache import create_cache
        cache = create_cache(dcfg, cfg.n_layers, 1)
        cache, logits = engine.prefill_quantized(
            params, cfg, dcfg, dq, cache, tokens[:1], chunk=128
        )
        assert bool(jnp.isfinite(logits).all())
        cache, nxt = engine.decode_step(
            params, cfg, dcfg, dq, cache,
            jnp.argmax(logits, -1).astype(jnp.int32), jnp.int32(tokens.shape[1]),
        )
        assert bool(jnp.isfinite(nxt).all())
