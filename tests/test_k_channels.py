"""Static-channel K outliers (DeployConfig.k_outliers="channels").

KVQuant's own observation (paper §3.1; reference
quant/simquant_module_quantizer.py per-channel K handling) is that K
outliers concentrate in a few fixed channels. The "channels" mode exploits
that TPU-natively: instead of per-token fixed-budget encoded slots (which
the kernel must densify with VPU one-hot work every step), calibration
picks n_kc STATIC channels per head group and the cache stores the full
residual there densely — reconstruction at those channels is EXACT for
every token, and the kernel applies them with two small MXU contractions.

Invariants tested here:
- reconstruction at the selected channels is exact (to fp32 rounding),
  and untouched elsewhere;
- flash kernel == XLA datapath in channels mode (decode, warm single
  step, blockwise prefill), across head groups, intN codes, post-RoPE
  storage, and cap_per_side=0 (V slots disabled);
- deployed reconstruction == the simulated-quant hook (the oracle);
- the paged pool path agrees with contiguous flash;
- layout: n_kc=4 + cap=2 fills the same 8-row tile as the default slots
  scheme (no compression regression).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvquant_tpu import engine
from kvquant_tpu.cache import (
    DeployConfig, create_cache, deployed_from_quantizers, k_channel_onehot,
)
from kvquant_tpu.models import TINY_LLAMA, TINY_GQA, init_params
from kvquant_tpu.models.llama import simquant_k
from kvquant_tpu.ops import deployed
from kvquant_tpu.quant.calibration import collect_kv_activations, fit_quantizers


def _setup(cfg, bits=3, max_len=69, codes="nuq", **dkw):
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    cal = jax.random.randint(jax.random.PRNGKey(7), (2, 40), 0, cfg.vocab_size)
    k_acts, v_acts = collect_kv_activations(params, cfg, [cal])
    qs = fit_quantizers(
        k_acts, v_acts, bits=bits, sparsity_threshold=0.99, cap_outliers=True,
        first_few_fp16=5, sample_seqlen=40, kmeans_iters=10,
        mode="uniform" if codes != "nuq" else "nuq",
    )
    assert qs.layers[0].k.ressc is not None  # calibration emits the signal
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)

    def mk(kernel, **kw):
        merged = dict(dkw)
        merged.update(kw)
        return DeployConfig.create(
            bits=bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
            max_len=max_len, sink=5, kernel=kernel, dot_bf16=False,
            codes=codes, k_outliers="channels", **merged,
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


# ---------------------------------------------------------------------------
# reconstruction semantics
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("hg", [1, 2])
def test_channels_reconstruction_exact_at_selected(hg):
    """prefill_pack -> dequant_k_full: exact (fp32-rounding) recovery at
    each group's selected channels, dense-only dequant elsewhere."""
    cfg = TINY_LLAMA
    params, qs, dq, mk = _setup(cfg, max_len=37)
    dcfg = mk("xla", head_group=hg)
    lq = dq.layer(0)
    C = cfg.n_kv_heads * cfg.d_head
    key = jax.random.PRNGKey(3)
    T0 = 37
    k = jax.random.normal(key, (1, T0, C), jnp.float32) * 2.0
    v = jax.random.normal(jax.random.fold_in(key, 1), (1, T0, C), jnp.float32)

    cache = create_cache(dcfg, 1, 1).layer(0)
    new = deployed.prefill_pack(cache, lq, dcfg, cfg, k, v)
    deq = np.asarray(deployed.dequant_k_full(new, lq, dcfg))  # (1,Hkv,Tc,D)
    dense = np.asarray(
        deployed.dequant_k_full(new, lq, dcfg, with_outliers=False)
    )

    sel = np.asarray(k_channel_onehot(lq.k_ressc, dcfg))  # (G,n_kc,hg*D)
    chmask = sel.sum(axis=1).reshape(C) > 0  # (C,) exactly n_kc per group
    assert chmask.sum() == dcfg.n_kc * dcfg.n_groups

    S, Tp = dcfg.sink, T0 - dcfg.sink
    want = np.asarray(k[0, S:]).reshape(Tp, cfg.n_kv_heads, cfg.d_head)
    got = deq[0, :, :Tp].transpose(1, 0, 2)  # (Tp, Hkv, D)
    m = chmask.reshape(cfg.n_kv_heads, cfg.d_head)
    # exact where selected (deq + (x - deq) in fp32: <= 1 ulp of the sum)
    np.testing.assert_allclose(
        got[:, m], want[:, m], rtol=1e-6, atol=1e-5
    )
    # untouched elsewhere: identical to dense-only dequant
    np.testing.assert_array_equal(
        got[:, ~m], dense[0, :, :Tp].transpose(1, 0, 2)[:, ~m]
    )


def test_channels_matches_simulated_hook():
    """Deployed channels reconstruction == the simulated-quant hook run
    with the same static selection (sink off on both sides)."""
    from kvquant_tpu.models.llama import simquant_from_quantizers

    cfg = TINY_GQA
    params, qs, dq, mk = _setup(cfg, max_len=37)
    hg = 2
    dcfg = dataclasses.replace(mk("xla", head_group=hg), sink=0)
    lq = dq.layer(0)
    C = cfg.n_kv_heads * cfg.d_head
    k = jax.random.normal(jax.random.PRNGKey(5), (1, 32, C), jnp.float32) * 2

    codes, words = deployed.quantize_k(k, lq, dcfg)
    # reconstruct directly from the quantize_k outputs
    from kvquant_tpu.quant.nuq import lut_lookup
    deq = lut_lookup(lq.k_lut_dec, codes) * lq.k_range + lq.k_offset
    sel = k_channel_onehot(lq.k_ressc, dcfg)
    dense = jnp.einsum("btgn,gnc->btgc", words, sel)
    rec = (
        deq.reshape(1, 32, C)
        + dense.reshape(1, 32, dcfg.n_groups, hg * cfg.d_head).reshape(1, 32, C)
    )

    sq = simquant_from_quantizers(
        qs, n_kv_heads=cfg.n_kv_heads, head_group=hg,
        k_outliers="channels", n_kc=dcfg.n_kc,
    )
    arrs0 = jax.tree.map(lambda a: a[0], sq.arrays)
    scfg = dataclasses.replace(sq.config, first_few_fp16=0)
    sim = simquant_k(k, arrs0, scfg)

    np.testing.assert_allclose(
        np.asarray(rec), np.asarray(sim), rtol=1e-5, atol=1e-5
    )


def test_channels_layout_same_tile_as_slots():
    """n_kc=4 + cap_per_side=2 packs into the same 8-row fp32 tile as the
    default slots scheme — identical cache bytes."""
    from kvquant_tpu.cache import cache_bytes

    common = dict(bits=3, n_kv_heads=16, d_head=128, max_len=4096, sink=5,
                  head_group=4)
    a = DeployConfig.create(k_outliers="slots", **common)
    b = DeployConfig.create(k_outliers="channels", n_kc=4, **common)
    assert a.n_slots == b.n_slots == 8
    assert b.slots_per_kind == 4
    assert cache_bytes(a, 8, 1) == cache_bytes(b, 8, 1)


# ---------------------------------------------------------------------------
# kernel equivalence
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cfg,hg", [(TINY_LLAMA, 1), (TINY_LLAMA, 4),
                                    (TINY_GQA, 2)],
                         ids=["mha-hg1", "mha-hg4", "gqa-hg2"])
def test_flash_channels_matches_xla_decode(cfg, hg):
    params, qs, dq, mk = _setup(cfg, head_group=hg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 40), 0, cfg.vocab_size)
    _, lx = _run_decode(params, cfg, mk("xla"), dq, tokens)
    _, lf = _run_decode(params, cfg, mk("flash"), dq, tokens)
    diff = np.abs(lf - lx)
    assert np.quantile(diff, 0.5) < 5e-3 and diff.max() < 0.25, (
        np.quantile(diff, 0.5), diff.max()
    )


def test_flash_channels_single_step_tight():
    cfg = TINY_LLAMA
    params, qs, dq, mk = _setup(cfg, head_group=4)
    tokens = jax.random.randint(jax.random.PRNGKey(5), (1, 21), 0, cfg.vocab_size)
    cache, _ = _run_decode(params, cfg, mk("xla"), dq, tokens[:, :20])

    def one(kernel):
        _, logits = engine.decode_step(
            params, cfg, mk(kernel), dq, cache, tokens[:, 20], jnp.int32(20)
        )
        return np.asarray(logits)

    np.testing.assert_allclose(one("flash"), one("xla"), atol=2e-4, rtol=1e-4)


def test_flash_channels_int4_postrope():
    """The speed-of-light branch (post-RoPE intN codes + channels): the
    score correction rides as two extra MXU dots — must agree with XLA."""
    cfg = TINY_LLAMA
    params, qs, dq, mk = _setup(cfg, bits=4, codes="int4",
                                head_group=4, post_rope_k=True)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 40), 0, cfg.vocab_size)
    _, lx = _run_decode(params, cfg, mk("xla"), dq, tokens)
    _, lf = _run_decode(params, cfg, mk("flash"), dq, tokens)
    diff = np.abs(lf - lx)
    assert np.quantile(diff, 0.5) < 5e-3 and diff.max() < 0.25, (
        np.quantile(diff, 0.5), diff.max()
    )


def test_flash_channels_cap0_no_v_slots():
    """cap_per_side=0 in channels mode: V outlier slots fully disabled —
    kv_out carries only the n_kc K residual rows."""
    cfg = TINY_LLAMA
    params, qs, dq, mk = _setup(cfg, head_group=4, cap_per_side=0)
    dcfg = mk("xla")
    assert dcfg.slots_per_kind == dcfg.n_kc
    tokens = jax.random.randint(jax.random.PRNGKey(4), (1, 30), 0, cfg.vocab_size)
    _, lx = _run_decode(params, cfg, dcfg, dq, tokens)
    _, lf = _run_decode(params, cfg, mk("flash"), dq, tokens)
    diff = np.abs(lf - lx)
    assert np.quantile(diff, 0.5) < 5e-3 and diff.max() < 0.25, (
        np.quantile(diff, 0.5), diff.max()
    )


def test_flash_channels_nkc8_padded_layout():
    """n_kc=8 + cap=2 -> 12 rows: K rows [0:8), V slots [8:12) — the array
    carries exactly the live rows (n_slots is no longer tile-padded) and
    both paths must agree on the larger-than-8 row count."""
    cfg = TINY_LLAMA
    params, qs, dq, mk = _setup(cfg, head_group=4, n_kc=8)
    dcfg = mk("xla")
    assert (dcfg.n_slots, dcfg.slots_per_kind) == (12, 8)
    tokens = jax.random.randint(jax.random.PRNGKey(6), (1, 30), 0, cfg.vocab_size)
    _, lx = _run_decode(params, cfg, dcfg, dq, tokens)
    _, lf = _run_decode(params, cfg, mk("flash"), dq, tokens)
    diff = np.abs(lf - lx)
    assert np.quantile(diff, 0.5) < 5e-3 and diff.max() < 0.25, (
        np.quantile(diff, 0.5), diff.max()
    )


def test_flash_channels_block_prefill_matches_xla():
    cfg = TINY_LLAMA
    params, qs, dq, mk = _setup(cfg, max_len=300, head_group=4)
    tokens = jax.random.randint(jax.random.PRNGKey(11), (2, 200), 0,
                                cfg.vocab_size)

    def run(kernel):
        dcfg = mk(kernel)
        cache = create_cache(dcfg, cfg.n_layers, 2)
        cache, logits = engine.prefill_quantized(
            params, cfg, dcfg, dq, cache, tokens, chunk=128
        )
        return cache, np.asarray(logits)

    cache_x, lx = run("xla")
    cache_f, lf = run("flash")
    np.testing.assert_array_equal(
        np.asarray(cache_x.k_planes), np.asarray(cache_f.k_planes)
    )
    diff = np.abs(lf - lx)
    assert np.quantile(diff, 0.5) < 5e-3 and diff.max() < 0.25, (
        np.quantile(diff, 0.5), diff.max()
    )


@pytest.mark.slow
def test_channels_paged_matches_contiguous():
    from kvquant_tpu.paged import create_paged_pool, paged_decode_step

    PAGE = 256
    cfg = TINY_LLAMA
    params, qs, dq, mk = _setup(
        cfg, bits=4, max_len=PAGE * 2 + 5, codes="int4",
        head_group=4, post_rope_k=True,
    )
    dcfg = dataclasses.replace(mk("flash"), page_tokens=PAGE)
    B, T = 2, PAGE + 24

    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, cfg.vocab_size)
    cache = create_cache(dcfg, cfg.n_layers, B)
    step_c = jax.jit(
        lambda c, tok, pos: engine.decode_step(params, cfg, dcfg, dq, c, tok, pos)
    )
    pool = create_paged_pool(dcfg, cfg.n_layers, n_pages=4, n_slots=B)
    table = jnp.asarray([[3, 1], [0, 2]], jnp.int32)
    act = jnp.ones((B,), bool)
    step_p = jax.jit(
        lambda p, tok, pos: paged_decode_step(
            params, cfg, dcfg, dq, p, table, tok, pos, act
        )
    )
    check_at = {0, 5, PAGE - 1, PAGE, PAGE + 3, T - 1}
    for t in range(T):
        posv = jnp.full((B,), t, jnp.int32)
        cache, lc = step_c(cache, tokens[:, t], jnp.int32(t))
        pool, lp = step_p(pool, tokens[:, t], posv)
        if t in check_at:
            np.testing.assert_allclose(
                np.asarray(lp), np.asarray(lc), atol=2e-4, rtol=1e-4,
                err_msg=f"step {t}",
            )
