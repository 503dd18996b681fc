"""Hardware intN code storage (DeployConfig.codes "int4"/"int8").

The int path must be semantically IDENTICAL to nuq storage whenever the
codebook is affine (uniform calibration): same codes, same reconstruction.
Covers: store/load roundtrip, XLA datapath equivalence vs nuq storage,
flash-kernel vs XLA agreement under int storage, quantized prefill, and
the affine-codebook guard.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvquant_tpu import engine
from kvquant_tpu.cache import (
    DeployConfig, create_cache, deployed_from_quantizers, affine_lut_coeffs,
    cache_bytes,
)
from kvquant_tpu.models import TINY_LLAMA, TINY_GQA, init_params
from kvquant_tpu.ops.packing import store_codes_int, load_codes_int
from kvquant_tpu.quant.calibration import collect_kv_activations, fit_quantizers


def _setup(cfg, bits=4, max_len=69, mode="uniform", **dkw):
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    cal = jax.random.randint(jax.random.PRNGKey(7), (2, 40), 0, cfg.vocab_size)
    k_acts, v_acts = collect_kv_activations(params, cfg, [cal])
    qs = fit_quantizers(
        k_acts, v_acts, bits=bits, sparsity_threshold=0.99, cap_outliers=True,
        first_few_fp16=5, sample_seqlen=40, kmeans_iters=10, mode=mode,
    )
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)

    def mk(kernel, codes):
        return DeployConfig.create(
            bits=bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
            max_len=max_len, sink=5, kernel=kernel, dot_bf16=False,
            codes=codes, **dkw,
        )

    return params, dq, mk


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


@pytest.mark.parametrize("codes,bits", [("int4", 4), ("int4", 3), ("int8", 4)])
def test_store_roundtrip(codes, bits):
    dtype = {"int4": jnp.int4, "int8": jnp.int8}[codes]
    c = jnp.arange(2**bits, dtype=jnp.int32).reshape(1, -1)
    back = load_codes_int(store_codes_int(c, bits, dtype), bits)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(c))


@pytest.mark.parametrize("codes", ["int4", "int8"])
def test_int_xla_matches_nuq_uniform(codes):
    """With a uniform codebook, nuq storage and intN storage hold the SAME
    codes and reconstruct through the same lut_lookup math — trajectories
    must agree tightly (same compiled math, different container layout)."""
    cfg = TINY_LLAMA
    params, dq, mk = _setup(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 30), 0, cfg.vocab_size)

    _, logits_nuq = _run_decode(params, cfg, mk("xla", "nuq"), dq, tokens)
    _, logits_int = _run_decode(params, cfg, mk("xla", codes), dq, tokens)
    np.testing.assert_allclose(logits_int, logits_nuq, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("cfg", [TINY_LLAMA, TINY_GQA], ids=["mha", "gqa"])
def test_flash_int_single_step_tight(cfg):
    """One step from an identical warm cache under int4 storage: the flash
    kernel's affine dequant (convert + fma with folded codebook) must match
    the XLA lut_lookup reconstruction tightly."""
    params, dq, mk = _setup(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(5), (1, 21), 0, cfg.vocab_size)
    cache, _ = _run_decode(params, cfg, mk("xla", "int4"), dq, tokens[:, :20])

    def one(kernel):
        dcfg = mk(kernel, "int4")
        _, logits = engine.decode_step(
            params, cfg, dcfg, dq, cache, tokens[:, 20], jnp.int32(20)
        )
        return np.asarray(logits)

    np.testing.assert_allclose(one("flash"), one("xla"), atol=2e-4, rtol=1e-4)


def test_flash_int_trajectory(codes="int4"):
    cfg = TINY_LLAMA
    params, dq, mk = _setup(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 40), 0, cfg.vocab_size)
    _, logits_x = _run_decode(params, cfg, mk("xla", codes), dq, tokens)
    _, logits_f = _run_decode(params, cfg, mk("flash", codes), dq, tokens)
    diff = np.abs(logits_f - logits_x)
    assert np.quantile(diff, 0.5) < 5e-3, np.quantile(diff, 0.5)
    assert diff.max() < 0.25, diff.max()
    assert np.mean(np.argmax(logits_f, -1) == np.argmax(logits_x, -1)) > 0.95


def test_int_quantized_prefill_matches_decode():
    """Chunked quantized prefill under int4 storage follows the identical
    trajectory to token-by-token decode (same quantize math, block writes)."""
    cfg = TINY_LLAMA
    params, dq, mk = _setup(cfg, max_len=200)
    dcfg = mk("xla", "int4")
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 150), 0, cfg.vocab_size)

    cache_d, logits_d = _run_decode(params, cfg, dcfg, dq, tokens)
    cache_p, logits_p = engine.prefill_quantized(
        params, cfg, dcfg, dq, create_cache(dcfg, cfg.n_layers, 1), tokens,
        chunk=128,
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), logits_d[:, -1], atol=2e-3, rtol=1e-3
    )
    # the packed containers must agree exactly on filled positions
    np.testing.assert_array_equal(
        np.asarray(cache_p.k_planes.astype(jnp.int8))[..., : 150 - dcfg.sink, :],
        np.asarray(cache_d.k_planes.astype(jnp.int8))[..., : 150 - dcfg.sink, :],
    )


def test_affine_guard():
    lut = np.stack([np.linspace(-1, 1, 16, dtype=np.float32)] * 2)
    a, b = affine_lut_coeffs(lut)
    np.testing.assert_allclose(a, [-1, -1], atol=1e-6)
    np.testing.assert_allclose(b, [2 / 15] * 2, atol=1e-6)
    bad = lut.copy()
    bad[1, 7] += 0.05
    with pytest.raises(ValueError):
        affine_lut_coeffs(bad)


def test_nuq_codebook_rejected_for_int():
    """Fisher-weighted k-means codebooks are not affine; the guard must
    catch them before deploy."""
    cfg = TINY_LLAMA
    params, dq, _ = _setup(cfg, mode="nuq")
    with pytest.raises(ValueError):
        affine_lut_coeffs(np.asarray(dq.k_lut_dec))


def test_cache_bytes_accounting():
    common = dict(bits=4, n_kv_heads=8, d_head=64, max_len=2048, sink=5)
    b_nuq = cache_bytes(DeployConfig.create(**common), 2, 1)
    b_int4 = cache_bytes(DeployConfig.create(codes="int4", **common), 2, 1)
    b_int8 = cache_bytes(DeployConfig.create(codes="int8", **common), 2, 1)
    assert b_int4["packed"] == b_nuq["packed"]  # 4-bit planes == int4
    assert b_int8["packed"] == 2 * b_int4["packed"]


def test_intn_nuq_codebook_guarded_at_deploy():
    """codes='int4' + a k-means (non-affine) codebook must raise at every
    eager deploy entry, not silently mis-dequantize in the flash kernel
    (fold_affine fits the codebook's ENDPOINTS; a non-affine lut would
    diverge from the XLA lut_lookup path by O(0.1) logits)."""
    cfg = TINY_LLAMA
    params, dq, _ = _setup(cfg, mode="nuq")

    def mk(kernel):
        return DeployConfig.create(
            bits=4, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
            max_len=69, sink=5, kernel=kernel, dot_bf16=False, codes="int4",
        )

    cache = create_cache(mk("flash"), cfg.n_layers, 1)
    tok = jnp.zeros((1,), jnp.int32)
    for kernel in ("flash", "xla"):
        with pytest.raises(ValueError, match="affine"):
            engine.decode_step(params, cfg, mk(kernel), dq, cache, tok,
                               jnp.int32(0))
    with pytest.raises(ValueError, match="affine"):
        engine.prefill_quantized(
            params, cfg, mk("flash"), dq, cache,
            jnp.zeros((1, 10), jnp.int32), chunk=128)
