"""Model + calibration + Fisher + simulated-quant end-to-end tests (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvquant_tpu.models import (
    TINY_LLAMA,
    TINY_GQA,
    init_params,
    forward,
    make_kv_probes,
    rope_cos_sin,
    apply_rope,
    simquant_from_quantizers,
)
from kvquant_tpu.fisher import fisher_info, clm_loss
from kvquant_tpu.quant.calibration import collect_kv_activations, fit_quantizers
from kvquant_tpu.evals import perplexity


@pytest.fixture(scope="module")
def tiny():
    cfg = TINY_LLAMA
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, cfg.vocab_size)
    return cfg, params, tokens


class TestForward:
    def test_shapes_and_finite(self, tiny):
        cfg, params, tokens = tiny
        logits, aux = forward(params, cfg, tokens)
        assert logits.shape == (2, 64, cfg.vocab_size)
        assert bool(jnp.isfinite(logits).all())

    def test_causality(self, tiny):
        cfg, params, tokens = tiny
        logits1, _ = forward(params, cfg, tokens)
        perturbed = tokens.at[:, 40:].set(0)
        logits2, _ = forward(params, cfg, perturbed)
        np.testing.assert_allclose(
            np.asarray(logits1[:, :40]), np.asarray(logits2[:, :40]),
            atol=1e-3, rtol=1e-2,
        )
        assert not np.allclose(np.asarray(logits1[:, 40:]), np.asarray(logits2[:, 40:]))

    def test_gqa(self):
        cfg = TINY_GQA
        params = init_params(jax.random.PRNGKey(0), cfg)
        tokens = jnp.zeros((1, 16), jnp.int32)
        logits, _ = forward(params, cfg, tokens)
        assert logits.shape == (1, 16, cfg.vocab_size)
        assert bool(jnp.isfinite(logits).all())

    def test_capture_kv_shapes(self, tiny):
        cfg, params, tokens = tiny
        _, aux = forward(params, cfg, tokens, capture_kv=True)
        assert aux["k_acts"].shape == (cfg.n_layers, 2, 64, cfg.kv_hidden)
        assert aux["v_acts"].shape == (cfg.n_layers, 2, 64, cfg.kv_hidden)


class TestRope:
    def test_rope_zero_position_identity(self):
        cfg = TINY_LLAMA
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 2, cfg.d_head))
        cos, sin = rope_cos_sin(jnp.zeros((1, 1), jnp.int32), cfg)
        np.testing.assert_allclose(np.asarray(apply_rope(x, cos, sin)), np.asarray(x), atol=1e-6)

    def test_rope_preserves_norm(self):
        cfg = TINY_LLAMA
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 2, cfg.d_head))
        cos, sin = rope_cos_sin(jnp.array([[5, 100, 1000]], jnp.int32), cfg)
        y = apply_rope(x, cos, sin)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-5,
        )

    def test_rope_scaling_shrinks_angles(self):
        cfg = TINY_LLAMA
        import dataclasses
        cfg2 = dataclasses.replace(cfg, rope_scaling=2.0)
        c1, s1 = rope_cos_sin(jnp.array([[10]], jnp.int32), cfg2)
        c2, s2 = rope_cos_sin(jnp.array([[5]], jnp.int32), cfg)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)

    def test_relative_rotation_identity(self):
        """rope(q,i)·rope(k,j) must equal rope(q,i-j)·k — the identity the
        fused QK kernel's absolute-position key rotation relies on."""
        cfg = TINY_LLAMA
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 1, cfg.d_head))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, cfg.d_head))
        i, j = 37, 11
        ci, si = rope_cos_sin(jnp.array([[i]]), cfg)
        cj, sj = rope_cos_sin(jnp.array([[j]]), cfg)
        cd, sd = rope_cos_sin(jnp.array([[i - j]]), cfg)
        lhs = jnp.sum(apply_rope(q, ci, si) * apply_rope(k, cj, sj))
        rhs = jnp.sum(apply_rope(q, cd, sd) * k)
        np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


class TestFisher:
    def test_probe_grads_match_loss_sensitivity(self, tiny):
        cfg, params, tokens = tiny
        fk, fv = fisher_info(params, cfg, [tokens])
        assert fk.shape == (cfg.n_layers, 128, cfg.kv_hidden)
        assert float(jnp.sum(fk)) > 0 and float(jnp.sum(fv)) > 0
        assert bool(jnp.isfinite(fk).all()) and bool(jnp.isfinite(fv).all())

    def test_probes_are_neutral(self, tiny):
        cfg, params, tokens = tiny
        base = clm_loss(params, cfg, tokens)
        probed = clm_loss(params, cfg, tokens, kv_probes=make_kv_probes(cfg, 2, 64))
        # fp32 probes promote the bf16 k/v activations, so numerics shift at
        # the promotion level, not exactness
        np.testing.assert_allclose(float(base), float(probed), rtol=1e-3)


class TestSimQuantE2E:
    @pytest.mark.parametrize("bits", [4, 2])
    def test_calibrate_then_eval(self, tiny, bits):
        cfg, params, tokens = tiny
        k_acts, v_acts = collect_kv_activations(params, cfg, [tokens])
        fk, fv = fisher_info(params, cfg, [tokens])
        qs = fit_quantizers(
            k_acts, v_acts, bits=bits, sparsity_threshold=0.99,
            cap_outliers=True, first_few_fp16=5, sample_seqlen=64,
            fisher_k=fk, fisher_v=fv, kmeans_iters=15,
        )
        assert len(qs) == cfg.n_layers
        sq = simquant_from_quantizers(qs)
        ppl_fp = perplexity(params, cfg, tokens[:1])
        ppl_q = perplexity(params, cfg, tokens[:1], simquant=sq)
        assert np.isfinite(ppl_q) and ppl_q > 0
        # random-init tiny model: quantized ppl should stay in the ballpark
        assert ppl_q < ppl_fp * 1.5 + 50

    def test_more_bits_less_reconstruction_error(self, tiny):
        """4-bit codebooks must reconstruct K/V activations better than
        2-bit (ppl on a random-init model is noise; MSE is the invariant)."""
        from kvquant_tpu.models.llama import simquant_k, simquant_v

        cfg, params, tokens = tiny
        k_acts, v_acts = collect_kv_activations(params, cfg, [tokens])
        mses = {}
        for bits in (2, 4):
            qs = fit_quantizers(
                k_acts, v_acts, bits=bits, cap_outliers=True,
                first_few_fp16=5, sample_seqlen=64, kmeans_iters=15,
            )
            sq = simquant_from_quantizers(qs)
            err = 0.0
            for i in range(cfg.n_layers):
                arrs = jax.tree.map(lambda a: a[i], sq.arrays)
                kd = simquant_k(k_acts[i][None], arrs, sq.config)
                vd = simquant_v(v_acts[i][None], arrs, sq.config)
                err += float(jnp.mean((kd[0] - k_acts[i]) ** 2))
                err += float(jnp.mean((vd[0] - v_acts[i]) ** 2))
            mses[bits] = err
        assert mses[4] < mses[2]


class TestChunkedAttention:
    def test_chunked_matches_full(self):
        # fp32 params: the full path keeps probs in the param dtype, so bf16
        # runs differ at the 2^-8 level between the two formulations
        cfg = TINY_LLAMA
        params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, cfg.vocab_size)
        full, _ = forward(params, cfg, tokens)
        chunked, _ = forward(params, cfg, tokens, attn_chunk=16)
        np.testing.assert_allclose(
            np.asarray(chunked), np.asarray(full), atol=1e-4, rtol=1e-3
        )

    def test_chunked_sliding_window(self):
        import dataclasses
        from kvquant_tpu.models import TINY_LLAMA
        cfg = dataclasses.replace(TINY_LLAMA, sliding_window=24)
        params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 64), 0, cfg.vocab_size)
        full, _ = forward(params, cfg, tokens)
        chunked, _ = forward(params, cfg, tokens, attn_chunk=16)
        np.testing.assert_allclose(
            np.asarray(chunked), np.asarray(full), atol=1e-4, rtol=1e-4
        )


class TestPercentileVMode:
    def test_percentile_mode_runs_and_differs_from_topk(self):
        """Reference simulated-eval V semantics (get_outliers_dynamic,
        simquant_module_quantizer.py:80): percentile-threshold dynamic
        outliers instead of the deployed topk rule."""
        import dataclasses
        from kvquant_tpu.models.llama import simquant_v
        from kvquant_tpu.quant.calibration import fit_quantizers

        cfg = TINY_LLAMA
        params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 32), 0, cfg.vocab_size)
        k_acts, v_acts = collect_kv_activations(params, cfg, [tokens])
        qs = fit_quantizers(k_acts, v_acts, bits=3, cap_outliers=True,
                            first_few_fp16=5, sample_seqlen=32, kmeans_iters=5)
        sq_topk = simquant_from_quantizers(qs, v_mode="topk",
                                           n_kv_heads=cfg.n_kv_heads)
        sq_pct = simquant_from_quantizers(qs, v_mode="percentile",
                                          n_kv_heads=cfg.n_kv_heads)
        v = v_acts[0][None]
        arrs = jax.tree.map(lambda a: a[0], sq_topk.arrays)
        out_t = simquant_v(v, arrs, sq_topk.config)
        out_p = simquant_v(v, arrs, sq_pct.config)
        assert bool(jnp.isfinite(out_t).all()) and bool(jnp.isfinite(out_p).all())
        # (at tiny channel counts both rules can select the same elements,
        # so value inequality is not asserted)
        ppl = perplexity(params, cfg, tokens, simquant=sq_pct)
        assert np.isfinite(ppl)
