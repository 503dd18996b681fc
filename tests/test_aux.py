"""Auxiliary subsystem tests: Q-Norm end-to-end, batched decode, cache
checkpoint round-trip, profiling helpers."""

import numpy as np
import jax
import jax.numpy as jnp

from kvquant_tpu import engine, cache_io
from kvquant_tpu.cache import DeployConfig, create_cache, deployed_from_quantizers
from kvquant_tpu.models import TINY_LLAMA, init_params, simquant_from_quantizers
from kvquant_tpu.quant.calibration import collect_kv_activations, fit_quantizers
from kvquant_tpu.utils.profiling import cost_analysis, device_timed


def _calibrated(qnorm=False, bits=3, mode="nuq"):
    cfg = TINY_LLAMA
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    cal = jax.random.randint(jax.random.PRNGKey(7), (2, 40), 0, cfg.vocab_size)
    k_acts, v_acts = collect_kv_activations(params, cfg, [cal])
    qs = fit_quantizers(
        k_acts, v_acts, bits=bits, cap_outliers=True, first_few_fp16=5,
        sample_seqlen=40, kmeans_iters=8, qnorm=qnorm, mode=mode,
    )
    return cfg, params, qs


class TestQNorm:
    def test_qnorm_plumbing_end_to_end(self):
        """Q-Norm (reference :533-550) must flow from calibration through
        both the simulated config and the deployed decode LUT."""
        cfg, params, qs = _calibrated(qnorm=True)
        assert all(lq.k.normscale is not None for lq in qs.layers)

        sq = simquant_from_quantizers(qs, n_kv_heads=cfg.n_kv_heads)
        assert sq.config.qnorm

        dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)
        # lut_dec differs from lut_enc exactly by the affine
        enc = np.asarray(dq.k_lut_enc)
        dec = np.asarray(dq.k_lut_dec)
        ns = np.array([lq.k.normscale for lq in qs.layers])[:, None]
        no = np.array([lq.k.normoffset for lq in qs.layers])[:, None]
        np.testing.assert_allclose(dec, enc * ns + no, rtol=1e-5)

        # and the engine still matches the simulated oracle at the ppl level
        from kvquant_tpu.evals import perplexity

        tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 32), 0, cfg.vocab_size)
        dcfg = DeployConfig.create(bits=3, n_kv_heads=cfg.n_kv_heads,
                                   d_head=cfg.d_head, max_len=37, sink=5)
        sim = perplexity(params, cfg, tokens, simquant=sq)
        dep = engine.deployed_ppl(params, cfg, dcfg, dq, tokens)
        assert abs(np.log(dep) - np.log(sim)) < 0.25, (dep, sim)


class TestBatchedDecode:
    def test_generate_batch2(self):
        """The reference asserts batch size 1 (modeling_llama.py:1525);
        batched decode is native here."""
        cfg, params, qs = _calibrated()
        dcfg = DeployConfig.create(bits=3, n_kv_heads=cfg.n_kv_heads,
                                   d_head=cfg.d_head, max_len=37, sink=5)
        dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)
        prompts = jax.random.randint(jax.random.PRNGKey(2), (2, 12), 0, cfg.vocab_size)
        out, cache = engine.generate(
            params, cfg, dcfg, dq, prompts, engine.GenerateConfig(max_new_tokens=4)
        )
        assert out.shape == (2, 4)
        # batch rows must be independent: row 0 alone gives the same tokens
        out0, _ = engine.generate(
            params, cfg, dcfg, dq, prompts[:1], engine.GenerateConfig(max_new_tokens=4)
        )
        np.testing.assert_array_equal(np.asarray(out[:1]), np.asarray(out0))


class TestCacheIO:
    def test_roundtrip(self, tmp_path):
        cfg, params, qs = _calibrated()
        dcfg = DeployConfig.create(bits=3, n_kv_heads=cfg.n_kv_heads,
                                   d_head=cfg.d_head, max_len=37, sink=5)
        dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)
        tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 16), 0, cfg.vocab_size)
        cache = create_cache(dcfg, cfg.n_layers, 1)
        cache, logits = engine.prefill(params, cfg, dcfg, dq, cache, tokens)

        p = str(tmp_path / "cache.npz")
        cache_io.save_cache(p, cache, dcfg)
        cache2, dcfg2 = cache_io.load_cache(p)
        assert dcfg2 == dcfg
        for a, b in zip(jax.tree.leaves(cache), jax.tree.leaves(cache2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # resuming decode from the restored cache gives identical logits
        _, l1 = engine.decode_step(params, cfg, dcfg, dq, cache,
                                   tokens[:, -1], jnp.int32(16))
        _, l2 = engine.decode_step(params, cfg, dcfg, dq, cache2,
                                   tokens[:, -1], jnp.int32(16))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


class TestProfiling:
    def test_cost_analysis_and_timing(self):
        f = lambda x: jnp.sum(x * 2.0)[None]
        x = jnp.ones((128, 128))
        ca = cost_analysis(f, x)
        assert isinstance(ca, dict)
        dt = device_timed(f, x, iters=5)
        assert dt > 0


class TestNFMode:
    def test_nf_calibration_end_to_end(self):
        """NormalFloat mode (reference quant_fn_nf / --nf): signpost LUTs
        instead of k-means codebooks, same deployed datapath."""
        from kvquant_tpu.quant.nuq import nf_signposts
        from kvquant_tpu.evals import perplexity

        cfg = TINY_LLAMA
        params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        cal = jax.random.randint(jax.random.PRNGKey(7), (2, 40), 0, cfg.vocab_size)
        k_acts, v_acts = collect_kv_activations(params, cfg, [cal])
        qs = fit_quantizers(
            k_acts, v_acts, bits=4, cap_outliers=True, first_few_fp16=5,
            sample_seqlen=40, mode="nf",
        )
        np.testing.assert_allclose(
            qs.layers[0].k.lut, np.sort(nf_signposts(4)), atol=1e-6
        )
        sq = simquant_from_quantizers(qs, n_kv_heads=cfg.n_kv_heads)
        tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 32), 0, cfg.vocab_size)
        ppl = perplexity(params, cfg, tokens, simquant=sq)
        assert np.isfinite(ppl) and ppl > 0


class TestCacheIOInt4:
    def test_int4_roundtrip(self, tmp_path):
        """int4 containers widen to int8 on disk and restore bit-exact."""
        cfg, params, qs = _calibrated(mode="uniform")
        dcfg = DeployConfig.create(bits=4, n_kv_heads=cfg.n_kv_heads,
                                   d_head=cfg.d_head, max_len=37, sink=5,
                                   codes="int4")
        dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)
        tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 16), 0,
                                    cfg.vocab_size)
        cache = create_cache(dcfg, cfg.n_layers, 1)
        cache, _ = engine.prefill(params, cfg, dcfg, dq, cache, tokens)

        p = str(tmp_path / "cache4.npz")
        cache_io.save_cache(p, cache, dcfg)
        cache2, dcfg2 = cache_io.load_cache(p)
        assert dcfg2 == dcfg
        assert str(cache2.k_planes.dtype) == "int4"
        _, l1 = engine.decode_step(params, cfg, dcfg, dq, cache,
                                   tokens[:, -1], jnp.int32(16))
        _, l2 = engine.decode_step(params, cfg, dcfg, dq, cache2,
                                   tokens[:, -1], jnp.int32(16))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
