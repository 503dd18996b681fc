"""Pallas kernel equivalence tests (interpret mode on CPU): the fused
dequant+RoPE+QK^T and score*V kernels must agree exactly with the XLA
reference datapath — the framework's kernel correctness oracle
(SURVEY.md §4: deployed == simulated)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvquant_tpu.cache import DeployConfig
from kvquant_tpu.models import ModelConfig
from kvquant_tpu.models.llama import rope_cos_sin
from kvquant_tpu.ops import deployed
from kvquant_tpu.ops.packing import pack_codes
from kvquant_tpu.ops.pallas import qk_fused, pv_fused
from kvquant_tpu.quant.nuq import nf_signposts


HKV, DH, G = 2, 16, 2
MCFG = ModelConfig(
    vocab_size=64, d_model=64, n_layers=1, n_heads=HKV * G, n_kv_heads=HKV,
    d_head=DH, d_ff=64, max_seq_len=512, rope_scaling=2.0,
)


EXACT = dict(dot_bf16=False)  # bit-level comparisons vs the fp32 XLA path


def make_inputs(bits, Tc=256, seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 2**bits, size=(HKV, Tc, DH)).astype(np.int32)
    planes = pack_codes(jnp.array(codes), bits)  # (HKV, bits, TW, DH)
    lut = jnp.asarray(np.sort(nf_signposts(bits)))
    k_range = jnp.array(np.abs(rng.normal(size=(HKV, DH))).astype(np.float32) + 0.5)
    k_offset = jnp.array(rng.normal(size=(HKV, DH)).astype(np.float32) * 0.1)
    return codes, planes, lut, k_range, k_offset


class TestQKFused:
    @pytest.mark.parametrize("bits", [2, 3, 4])
    def test_matches_xla_reference(self, bits):
        codes, planes, lut, k_range, k_offset = make_inputs(bits)
        Tc = codes.shape[1]
        dcfg = DeployConfig.create(
            bits=bits, n_kv_heads=HKV, d_head=DH, max_len=Tc + 5, sink=5,
            **EXACT,
        )
        rng = np.random.default_rng(1)
        q = jnp.array(rng.normal(size=(HKV, G, DH)).astype(np.float32))

        got = qk_fused(q, planes, None, k_range, k_offset, lut, dcfg, MCFG)

        # XLA reference: dequant, rope at absolute positions, contract
        deq = jnp.take(lut, codes) * k_range[:, None, :] + k_offset[:, None, :]
        ck, sk = rope_cos_sin(
            dcfg.sink + jnp.arange(Tc, dtype=jnp.int32), MCFG
        )  # (Tc, DH)
        kx = deq * ck[None] + deployed.rotate_half_axis(deq, axis=-1) * sk[None]
        want = jnp.einsum("hgd,htd->hgt", q, kx)

        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4
        )

    def test_small_block_fallback(self):
        # Tc = 256 exercises BT == Tc (the minimum legal block)
        codes, planes, lut, k_range, k_offset = make_inputs(4, Tc=256)
        dcfg = DeployConfig.create(
            bits=4, n_kv_heads=HKV, d_head=DH, max_len=261, sink=5, **EXACT,
        )
        q = jnp.ones((HKV, G, DH), jnp.float32)
        got = qk_fused(q, planes, None, k_range, k_offset, lut, dcfg,
                       MCFG, block_tokens=256)
        assert got.shape == (HKV, G, 256)
        assert bool(jnp.isfinite(got).all())


class TestPVFused:
    @pytest.mark.parametrize("bits", [2, 3, 4])
    def test_matches_xla_reference(self, bits):
        codes, planes, lut, _, _ = make_inputs(bits, seed=3)
        Tc = codes.shape[1]
        dcfg = DeployConfig.create(
            bits=bits, n_kv_heads=HKV, d_head=DH, max_len=Tc + 5, sink=5,
            **EXACT,
        )
        rng = np.random.default_rng(4)
        probs = jax.nn.softmax(
            jnp.array(rng.normal(size=(HKV, G, Tc)).astype(np.float32)), -1
        )
        v_scale = jnp.array(np.abs(rng.normal(size=Tc)).astype(np.float32) + 0.1)
        v_offset = jnp.array(rng.normal(size=Tc).astype(np.float32) * 0.1)

        got = pv_fused(probs, planes, v_scale, v_offset, None, lut, dcfg)

        deq = jnp.take(lut, codes) * v_scale[:, None] + v_offset[:, None]
        want = jnp.einsum("hgt,htd->hgd", probs, deq)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
        )


class TestDecodePallasVsXla:
    """Full decode_attention with kernel='pallas' vs 'xla' must agree."""

    # two-pass legacy kernels: bit-level coverage lives in TestQKFused/
    # TestPVFused; the full-decode cross-check is exhaustive-tier
    @pytest.mark.slow
    @pytest.mark.parametrize("bits", [4, 2])
    def test_decode_attention(self, bits):
        import dataclasses
        from kvquant_tpu.cache import create_cache, deployed_from_quantizers
        from kvquant_tpu.quant.artifacts import (
            KQuantizer, VQuantizer, LayerQuantizers, QuantizerSet,
        )

        rng = np.random.default_rng(5)
        C = HKV * DH
        u = (np.abs(rng.normal(size=C)) * 2 + 1).astype(np.float32)
        lut = nf_signposts(bits)
        qs = QuantizerSet(
            layers=[LayerQuantizers(
                k=KQuantizer(upper=u, lower=(-u * 0.9).astype(np.float32), lut=lut),
                v=VQuantizer(lut=lut.copy()),
            )],
            bits=bits, sparsity_threshold=0.99, cap_outliers=True,
            first_few_fp16=5,
        )
        dq = deployed_from_quantizers(qs, HKV, DH)
        lq = dq.layer(0)

        d_x = DeployConfig.create(bits=bits, n_kv_heads=HKV, d_head=DH,
                                  max_len=133, sink=5, kernel="xla",
                                  dot_bf16=False)
        d_p = dataclasses.replace(d_x, kernel="pallas")

        B, T = 2, 12
        q = jnp.array(rng.normal(size=(B, T, HKV * G, DH)).astype(np.float32))
        k = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32) * 2)
        v = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))

        cache_x = create_cache(d_x, 1, B).layer(0)
        cache_p = create_cache(d_p, 1, B).layer(0)
        for t in range(T):
            cache_x, out_x = deployed.decode_attention(
                cache_x, lq, d_x, MCFG, q[:, t], k[:, t], v[:, t], jnp.int32(t)
            )
            cache_p, out_p = deployed.decode_attention(
                cache_p, lq, d_p, MCFG, q[:, t], k[:, t], v[:, t], jnp.int32(t)
            )
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_x), atol=1e-4, rtol=1e-3
        )
        for fa, fb in zip(jax.tree.leaves(cache_x), jax.tree.leaves(cache_p)):
            np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-5)


class TestBf16Dots:
    def test_bf16_contraction_close_to_fp32(self):
        """Default kernels contract in bf16 (fp32 accumulate) — same input
        precision class as the reference's fp16 CUDA matmuls; verify the
        error stays at the bf16 level."""
        import dataclasses
        codes, planes, lut, k_range, k_offset = make_inputs(3)
        Tc = codes.shape[1]
        exact = DeployConfig.create(
            bits=3, n_kv_heads=HKV, d_head=DH, max_len=Tc + 5, sink=5,
            **EXACT,
        )
        fast = dataclasses.replace(exact, dot_bf16=True)
        q = jnp.array(np.random.default_rng(8).normal(
            size=(HKV, G, DH)).astype(np.float32))
        a = qk_fused(q, planes, None, k_range, k_offset, lut, exact, MCFG)
        b = qk_fused(q, planes, None, k_range, k_offset, lut, fast, MCFG)
        scale = float(jnp.abs(a).max())
        assert float(jnp.abs(a - b).max()) < 2e-2 * scale
