"""Flash-decode kernel (single-pass online-softmax) vs the XLA reference
datapath: identical append semantics (bit-identical cache) and matching
attention/logits, across MHA, GQA, sliding-window, and per-sample-position
(continuous batching) regimes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvquant_tpu import engine
from kvquant_tpu.cache import DeployConfig, create_cache, deployed_from_quantizers
from kvquant_tpu.models import TINY_LLAMA, TINY_GQA, init_params
from kvquant_tpu.quant.calibration import collect_kv_activations, fit_quantizers


def _setup(cfg, bits=3, max_len=69, **dkw):
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    cal = jax.random.randint(jax.random.PRNGKey(7), (2, 40), 0, cfg.vocab_size)
    k_acts, v_acts = collect_kv_activations(params, cfg, [cal])
    qs = fit_quantizers(
        k_acts, v_acts, bits=bits, sparsity_threshold=0.99, cap_outliers=True,
        first_few_fp16=5, sample_seqlen=40, kmeans_iters=10,
    )
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)

    def mk(kernel):
        return DeployConfig.create(
            bits=bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
            max_len=max_len, sink=5, kernel=kernel, dot_bf16=False, **dkw,
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


@pytest.mark.parametrize("cfg", [TINY_LLAMA, TINY_GQA], ids=["mha", "gqa"])
def test_flash_matches_xla_decode(cfg):
    params, dq, mk = _setup(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 40), 0, cfg.vocab_size)

    cache_x, logits_x = _run_decode(params, cfg, mk("xla"), dq, tokens)
    cache_f, logits_f = _run_decode(params, cfg, mk("flash"), dq, tokens)

    # attention differs by online-softmax summation order; those tiny logit
    # deltas feed back into later projections where V-range boundary ties
    # can flip outlier membership (see test_engine.py for the same effect
    # between compiled programs) — so judge bulk, tail, and decisions.
    # Tight single-step agreement is test_flash_single_step_tight; exact
    # append equality is test_append_paths_identical.
    diff = np.abs(logits_f - logits_x)
    assert np.quantile(diff, 0.5) < 5e-3, np.quantile(diff, 0.5)
    assert diff.max() < 0.25, diff.max()
    assert np.mean(np.argmax(logits_f, -1) == np.argmax(logits_x, -1)) > 0.95


@pytest.mark.parametrize("cfg", [TINY_LLAMA, TINY_GQA], ids=["mha", "gqa"])
def test_flash_single_step_tight(cfg):
    """One step from an identical warm cache: append is shared code, so the
    only difference is kernel attention math — agreement must be tight."""
    params, dq, mk = _setup(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(5), (1, 21), 0, cfg.vocab_size)
    cache, _ = _run_decode(params, cfg, mk("xla"), dq, tokens[:, :20])

    def one(kernel):
        dcfg = mk(kernel)
        _, logits = engine.decode_step(
            params, cfg, dcfg, dq, cache, tokens[:, 20], jnp.int32(20)
        )
        return np.asarray(logits)

    np.testing.assert_allclose(one("flash"), one("xla"), atol=2e-4, rtol=1e-4)


def test_append_paths_identical():
    """append_token_flash (row writes into (L,...) arrays) must produce the
    exact same cache as decode_attention's per-layer append on identical
    inputs — bit-level, since both run the same quantize_{k,v} math."""
    from kvquant_tpu.ops import deployed

    cfg = TINY_LLAMA
    params, dq, mk = _setup(cfg)
    dcfg = mk("xla")
    B = 2
    C = cfg.n_kv_heads * cfg.d_head
    cache = create_cache(dcfg, cfg.n_layers, B)
    key = jax.random.PRNGKey(9)
    k_new = jax.random.normal(key, (B, C), jnp.float32)
    v_new = jax.random.normal(jax.random.fold_in(key, 1), (B, C), jnp.float32)
    q = jax.random.normal(jax.random.fold_in(key, 2),
                          (B, cfg.n_heads, cfg.d_head), jnp.float32)
    pos = jnp.array([7, 2], jnp.int32)  # one packed, one in the sink
    li = 1

    lq = dq.layer(li)
    cache_l = cache.layer(li)
    ref_cache, _ = deployed.decode_attention(
        cache_l, lq, dcfg, cfg, q, k_new, v_new, pos
    )

    arrs = {
        f: getattr(cache, f)
        for f in ("k_planes", "v_planes", "kv_out", "v_scale", "v_offset",
                  "k_sink", "v_sink")
    }
    got = deployed.append_token_flash(
        arrs, lq, dcfg, cfg, k_new, v_new, pos, jnp.int32(li)
    )
    for f in arrs:
        np.testing.assert_array_equal(
            np.asarray(got[f][li]), np.asarray(getattr(ref_cache, f)),
            err_msg=f,
        )
        # other layers untouched
        np.testing.assert_array_equal(
            np.asarray(got[f][1 - li]), np.asarray(getattr(cache, f)[1 - li]),
            err_msg=f + " (other layer)",
        )


def test_flash_sliding_window():
    import dataclasses

    cfg = dataclasses.replace(TINY_LLAMA, sliding_window=24)
    params, dq, mk = _setup(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 40), 0, cfg.vocab_size)
    _, logits_x = _run_decode(params, cfg, mk("xla"), dq, tokens)
    _, logits_f = _run_decode(params, cfg, mk("flash"), dq, tokens)
    diff = np.abs(logits_f - logits_x)
    assert np.quantile(diff, 0.5) < 5e-3 and diff.max() < 0.25, (
        np.quantile(diff, 0.5), diff.max()
    )


def test_flash_per_sample_positions():
    # two slots decoding at different positions (the serving regime)
    cfg = TINY_LLAMA
    params, dq, mk = _setup(cfg)
    B = 2
    toks = jax.random.randint(jax.random.PRNGKey(3), (B, 30), 0, cfg.vocab_size)

    def run(kernel):
        dcfg = mk(kernel)
        cache = create_cache(dcfg, cfg.n_layers, B)
        step = jax.jit(
            lambda c, tok, pos: engine.decode_step(
                params, cfg, dcfg, dq, c, tok, pos
            )
        )
        # warm both slots to different depths: slot 1 starts 10 tokens later
        pos = jnp.array([0, 0], jnp.int32)
        logits = None
        for t in range(20):
            active = jnp.array([True, t >= 10])
            tok = jnp.where(active, toks[:, t], 0)
            cache, logits = step(cache, tok, pos)
            pos = pos + active.astype(jnp.int32)
        return np.asarray(logits)

    lx = run("xla")
    lf = run("flash")
    diff = np.abs(lf - lx)
    assert np.quantile(diff, 0.5) < 5e-3 and diff.max() < 0.25, (
        np.quantile(diff, 0.5), diff.max()
    )


@pytest.mark.parametrize("hg", [2, 4])
def test_flash_head_group_matches_xla(hg):
    """Grouped outlier tiles (hg kv heads share one 8-slot tile, 9-bit
    head|dim index): flash and XLA paths must still agree."""
    cfg = TINY_LLAMA  # 4 kv heads
    params, dq, _ = _setup(cfg)

    def mk(kernel):
        return DeployConfig.create(
            bits=3, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
            max_len=69, sink=5, kernel=kernel, dot_bf16=False,
            head_group=hg,
        )

    tokens = jax.random.randint(jax.random.PRNGKey(8), (1, 21), 0, cfg.vocab_size)
    cache, _ = _run_decode(params, cfg, mk("xla"), dq, tokens[:, :20])

    def one(kernel):
        _, logits = engine.decode_step(
            params, cfg, mk(kernel), dq, cache, tokens[:, 20], jnp.int32(20)
        )
        return np.asarray(logits)

    np.testing.assert_allclose(one("flash"), one("xla"), atol=2e-4, rtol=1e-4)


def test_head_group_compression_ratio():
    """head_group=4 must push the 3-bit cache below the reference's 4.8x
    claim territory (VERDICT round-1 item 2: >= 4.6x; reference
    lwm/README.md:5)."""
    from kvquant_tpu.cache import cache_bytes

    dcfg = DeployConfig.create(
        bits=3, n_kv_heads=16, d_head=128, max_len=32768 + 21, sink=5,
        head_group=4,
    )
    acct = cache_bytes(dcfg, n_layers=8, batch=1)
    assert acct["ratio"] >= 4.6, acct
    # and per-(token, layer) outlier bytes now sit BELOW the reference's
    # global 42-slot rows (42 fp16 vals + 42 int32 idx ≈ 252B)
    per_token = acct["outliers"] / (8 * dcfg.cache_tokens)
    assert per_token <= 252, per_token


@pytest.mark.parametrize("cfg", [TINY_LLAMA, TINY_GQA], ids=["mha", "gqa"])
def test_flash_block_prefill_matches_xla(cfg):
    """Blockwise quantized prefill through the flash kernel (per-row causal
    masking in-kernel) must match block_attention's XLA path."""
    params, dq, mk = _setup(cfg, max_len=300)
    tokens = jax.random.randint(jax.random.PRNGKey(11), (2, 200), 0, cfg.vocab_size)

    def run(kernel):
        dcfg = mk(kernel)
        cache = create_cache(dcfg, cfg.n_layers, 2)
        cache, logits = engine.prefill_quantized(
            params, cfg, dcfg, dq, cache, tokens, chunk=128
        )
        return cache, np.asarray(logits)

    cache_x, lx = run("xla")
    cache_f, lf = run("flash")
    # later chunks' projections depend on earlier chunks' attention output,
    # so caches agree only to trajectory tolerance (codes are robust)
    np.testing.assert_array_equal(
        np.asarray(cache_x.k_planes), np.asarray(cache_f.k_planes)
    )
    diff = np.abs(lf - lx)
    assert np.quantile(diff, 0.5) < 5e-3 and diff.max() < 0.25, (
        np.quantile(diff, 0.5), diff.max()
    )


def test_flash_bf16_compute_path():
    """dot_bf16=True switches all in-kernel elementwise work to bf16 (the
    arithmetic mux / relu-one-hot variants) — must agree with the fp32
    kernel to bf16 tolerance on a single step from a warm cache."""
    cfg = TINY_LLAMA
    params, dq, mk = _setup(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(6), (1, 21), 0, cfg.vocab_size)
    cache, _ = _run_decode(params, cfg, mk("xla"), dq, tokens[:, :20])

    import dataclasses

    def one(dcfg):
        _, logits = engine.decode_step(
            params, cfg, dcfg, dq, cache, tokens[:, 20], jnp.int32(20)
        )
        return np.asarray(logits)

    ref = one(mk("flash"))
    got = one(dataclasses.replace(mk("flash"), dot_bf16=True))
    # bf16 relative error ~2^-8 through a couple of layers
    np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.05)
    assert np.argmax(got) == np.argmax(ref)


def test_flash_no_sparse_no_sink():
    cfg = TINY_LLAMA
    params, dq, mk = _setup(cfg)

    def mk2(kernel):
        return DeployConfig.create(
            bits=3, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
            max_len=40, sink=0, kernel=kernel, include_sparse=False,
            dot_bf16=False,
        )

    tokens = jax.random.randint(jax.random.PRNGKey(4), (1, 24), 0, cfg.vocab_size)
    _, logits_x = _run_decode(params, cfg, mk2("xla"), dq, tokens)
    _, logits_f = _run_decode(params, cfg, mk2("flash"), dq, tokens)
    diff = np.abs(logits_f - logits_x)
    assert np.quantile(diff, 0.5) < 5e-3 and diff.max() < 0.25, (
        np.quantile(diff, 0.5), diff.max()
    )


@pytest.mark.parametrize("codes,bits", [("nuq", 3), ("int4", 4)])
def test_append_uniform_matches_vmapped(codes, bits):
    """A scalar ``pos`` takes the batch-wide in-place append; a (B,) pos
    vmaps per-b row writes (which XLA lowers to full-array copies — the
    scalar form exists to avoid that at B > 1). Same position => bit-equal
    caches, at a sink position and at a packed position."""
    from kvquant_tpu.ops import deployed

    cfg = TINY_GQA
    params, dq, mk = _setup(cfg, bits=bits)
    dcfg = mk("flash") if codes == "nuq" else DeployConfig.create(
        bits=bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
        max_len=69, sink=5, kernel="flash", dot_bf16=False, codes="int4",
    )
    if codes == "int4":
        # int container needs an affine codebook
        from kvquant_tpu.quant.calibration import (
            collect_kv_activations, fit_quantizers,
        )
        cal = jax.random.randint(
            jax.random.PRNGKey(7), (2, 40), 0, cfg.vocab_size)
        k_acts, v_acts = collect_kv_activations(params, cfg, [cal])
        qs = fit_quantizers(
            k_acts, v_acts, bits=bits, sparsity_threshold=0.99,
            cap_outliers=True, first_few_fp16=5, sample_seqlen=40,
            kmeans_iters=10, mode="uniform",
        )
        dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)

    B = 3
    C = cfg.n_kv_heads * cfg.d_head
    key = jax.random.PRNGKey(11)
    k_new = jax.random.normal(key, (B, C), jnp.float32)
    v_new = jax.random.normal(jax.random.fold_in(key, 1), (B, C), jnp.float32)
    cache = create_cache(dcfg, cfg.n_layers, B)
    FIELDS = ("k_planes", "v_planes", "kv_out", "v_scale", "v_offset",
              "k_sink", "v_sink")
    arrs = {f: getattr(cache, f) for f in FIELDS}

    for pos_val in (3, 12):  # sink row / packed row
        uni = deployed.append_token_flash(
            arrs, dq.layer(1), dcfg, cfg, k_new, v_new,
            jnp.int32(pos_val), jnp.int32(1))
        perb = deployed.append_token_flash(
            arrs, dq.layer(1), dcfg, cfg, k_new, v_new,
            jnp.full((B,), pos_val, jnp.int32), jnp.int32(1))
        for f in FIELDS:
            np.testing.assert_array_equal(
                np.asarray(uni[f]), np.asarray(perb[f]), err_msg=f)


def test_prefill_segmented_scan_matches_single():
    """max_scan_chunks splits the device-side chunk scan into bounded host
    dispatches (long prefills in one dispatch got the TPU worker killed);
    any segmentation must be bit-identical to the single-scan path."""
    cfg = TINY_LLAMA
    params, dq, mk = _setup(cfg, max_len=600)
    dcfg = mk("flash")
    tokens = jax.random.randint(
        jax.random.PRNGKey(3), (2, 540), 0, cfg.vocab_size)

    def run(seg):
        return engine.prefill_quantized(
            params, cfg, dcfg, dq, create_cache(dcfg, cfg.n_layers, 2),
            tokens, chunk=128, max_scan_chunks=seg)

    cache_1, logits_1 = run(None)
    for seg in (1, 2):  # 4 rest-chunks: even split and remainder split
        cache_s, logits_s = run(seg)
        np.testing.assert_array_equal(
            np.asarray(logits_s), np.asarray(logits_1), err_msg=f"seg={seg}")
        for f in ("k_planes", "v_planes", "kv_out", "v_scale", "v_offset",
                  "k_sink", "v_sink"):
            np.testing.assert_array_equal(
                np.asarray(getattr(cache_s, f)),
                np.asarray(getattr(cache_1, f)), err_msg=f"{f} seg={seg}")
