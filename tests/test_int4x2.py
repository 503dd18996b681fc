"""Exact-density 2-bit storage (DeployConfig.codes "int4x2").

Two 2-bit codes per int4 element via head pairing (ops/packing.py
pair_codes_int4x2). Semantics must be IDENTICAL to nuq bit-plane storage
of the same (affine) codebook: same codes, same reconstruction — the
container layout and the kernel's distributed-dot dequant are the only
differences. This is the storage mode behind the reference's flagship
2-bit claim (1M context on one device at usable speed, README.md:12 /
lwm/README.md:5), so it gets the full oracle treatment: XLA-vs-nuq,
flash-vs-XLA, prefill-vs-decode, plus the container byte accounting.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvquant_tpu import engine
from kvquant_tpu.cache import (
    DeployConfig, create_cache, deployed_from_quantizers, cache_bytes,
)
from kvquant_tpu.models import TINY_LLAMA, TINY_GQA, init_params
from kvquant_tpu.ops.packing import pair_codes_int4x2, unpair_codes_int4x2
from kvquant_tpu.quant.calibration import collect_kv_activations, fit_quantizers


def _setup(cfg, max_len=69, **dkw):
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    cal = jax.random.randint(jax.random.PRNGKey(7), (2, 40), 0, cfg.vocab_size)
    k_acts, v_acts = collect_kv_activations(params, cfg, [cal])
    qs = fit_quantizers(
        k_acts, v_acts, bits=2, sparsity_threshold=0.99, cap_outliers=True,
        first_few_fp16=5, sample_seqlen=40, kmeans_iters=10, mode="uniform",
    )
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)

    def mk(kernel, codes, **kw):
        merged = dict(dkw)
        merged.update(kw)
        return DeployConfig.create(
            bits=2, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
            max_len=max_len, sink=5, kernel=kernel, dot_bf16=False,
            codes=codes, head_group=2, **merged,
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


def test_pair_unpair_roundtrip():
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, size=(3, 4, 6, 16)), jnp.int32)
    # codes (B, H, T, D); pair expects head axis -2, container is
    # (B, H/2, T, D) with head axis -3
    arr = jnp.moveaxis(pair_codes_int4x2(jnp.moveaxis(codes, 1, -2)), -2, 1)
    assert arr.shape == (3, 2, 6, 16) and str(arr.dtype) == "int4"
    back = unpair_codes_int4x2(arr)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(codes))


def test_container_range():
    """All 16 code pairs land inside the int4 range and invert exactly."""
    c = jnp.stack(jnp.meshgrid(jnp.arange(4), jnp.arange(4)), 0).reshape(2, 16)
    arr = pair_codes_int4x2(c.T[:, :, None].astype(jnp.int32))  # (16, 1, 1)
    vals = np.asarray(arr.astype(jnp.int32)).ravel()
    assert vals.min() >= -8 and vals.max() <= 7
    back = unpair_codes_int4x2(arr[:, None])  # (16, 2, 1, 1)
    np.testing.assert_array_equal(
        np.asarray(back).reshape(16, 2), np.asarray(c.T)
    )


def test_int4x2_xla_matches_nuq():
    """Same affine codebook, same codes: the XLA datapath under int4x2
    storage must reproduce the nuq bit-plane trajectory."""
    cfg = TINY_LLAMA
    params, dq, mk = _setup(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 30), 0, cfg.vocab_size)
    _, logits_nuq = _run_decode(params, cfg, mk("xla", "nuq"), dq, tokens)
    _, logits_x2 = _run_decode(params, cfg, mk("xla", "int4x2"), dq, tokens)
    np.testing.assert_allclose(logits_x2, logits_nuq, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("cfg", [TINY_LLAMA, TINY_GQA], ids=["mha", "gqa"])
@pytest.mark.parametrize("post_k", [False, True], ids=["prerope", "postrope"])
def test_flash_int4x2_single_step_tight(cfg, post_k):
    """One step from an identical warm cache: the flash kernel's paired
    unpack (distributed even-head dots) must match the XLA unpair +
    lut_lookup reconstruction tightly."""
    params, dq, mk = _setup(cfg, post_rope_k=post_k)
    tokens = jax.random.randint(jax.random.PRNGKey(5), (1, 21), 0, cfg.vocab_size)
    cache, _ = _run_decode(params, cfg, mk("xla", "int4x2"), dq, tokens[:, :20])

    def one(kernel):
        dcfg = mk(kernel, "int4x2")
        _, logits = engine.decode_step(
            params, cfg, dcfg, dq, cache, tokens[:, 20], jnp.int32(20)
        )
        return np.asarray(logits)

    np.testing.assert_allclose(one("flash"), one("xla"), atol=2e-4, rtol=1e-4)


def test_flash_int4x2_speed_config_trajectory():
    """The 2-bit speed config (post-RoPE K + static-channel K outliers +
    no V slots): full flash trajectory vs the XLA oracle."""
    cfg = TINY_LLAMA
    params, dq, mk = _setup(
        cfg, post_rope_k=True, k_outliers="channels", n_kc=2, cap_per_side=0,
    )
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 40), 0, cfg.vocab_size)
    _, logits_x = _run_decode(params, cfg, mk("xla", "int4x2"), dq, tokens)
    _, logits_f = _run_decode(params, cfg, mk("flash", "int4x2"), dq, tokens)
    diff = np.abs(logits_f - logits_x)
    assert np.quantile(diff, 0.5) < 5e-3, np.quantile(diff, 0.5)
    assert diff.max() < 0.25, diff.max()
    assert np.mean(np.argmax(logits_f, -1) == np.argmax(logits_x, -1)) > 0.95


def test_int4x2_quantized_prefill_matches_decode():
    cfg = TINY_LLAMA
    params, dq, mk = _setup(cfg, max_len=200)
    dcfg = mk("xla", "int4x2")
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


def test_int4x2_density_and_constraints():
    common = dict(n_kv_heads=8, d_head=64, max_len=2048, sink=5)
    b_nuq2 = cache_bytes(DeployConfig.create(bits=2, **common), 2, 1)
    b_x2 = cache_bytes(
        DeployConfig.create(bits=2, codes="int4x2", **common), 2, 1
    )
    b_int4 = cache_bytes(
        DeployConfig.create(bits=4, codes="int4", **common), 2, 1
    )
    # exact 2-bit density: equals the nuq 2-bit planes, half the int4 bytes
    assert b_x2["packed"] == b_nuq2["packed"]
    assert b_x2["packed"] * 2 == b_int4["packed"]
    # container arrays: head axis halves
    c = create_cache(
        DeployConfig.create(bits=2, codes="int4x2", **common), 2, 1
    )
    assert c.k_planes.shape[2] == 4 and str(c.k_planes.dtype) == "int4"

    with pytest.raises(AssertionError):
        DeployConfig.create(bits=3, codes="int4x2", **common)
    with pytest.raises(AssertionError):
        DeployConfig.create(bits=2, codes="int4x2", n_kv_heads=3,
                            d_head=64, max_len=128, sink=5)
