"""Paged KV cache: page-table-indirected flash decode + PagedServer.

Ground truth is the contiguous flash path: a paged pool whose pages are
allocated OUT OF ORDER must produce the identical decode trajectory, and
the paged server's interleaved completions must match isolated generation.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvquant_tpu import engine, paged
from kvquant_tpu.cache import DeployConfig, create_cache, deployed_from_quantizers
from kvquant_tpu.models import TINY_LLAMA, init_params
from kvquant_tpu.paged import (
    PagedServer, create_paged_pool, paged_decode_step,
)
from kvquant_tpu.quant.calibration import collect_kv_activations, fit_quantizers
from kvquant_tpu.serve import Request


PAGE = 256  # small pages so CPU interpret-mode tests cross boundaries fast


def _setup(cfg, bits=4, max_len=2053, codes="int4"):
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    cal = jax.random.randint(jax.random.PRNGKey(7), (2, 40), 0, cfg.vocab_size)
    k_acts, v_acts = collect_kv_activations(params, cfg, [cal])
    qs = fit_quantizers(
        k_acts, v_acts, bits=bits, sparsity_threshold=0.99, cap_outliers=True,
        first_few_fp16=5, sample_seqlen=40, kmeans_iters=10,
        mode="uniform" if codes != "nuq" else "nuq",
    )
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)
    dcfg = DeployConfig.create(
        bits=bits, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head,
        max_len=max_len, sink=5, kernel="flash", dot_bf16=False, codes=codes,
    )
    dcfg = dataclasses.replace(dcfg, page_tokens=PAGE)
    return params, dq, dcfg


@pytest.mark.parametrize("codes", [
    pytest.param("int4", marks=pytest.mark.slow), "nuq"])
def test_paged_matches_contiguous_with_permuted_pages(codes):
    """Decode past one page boundary with slots' pages deliberately
    scattered across the pool: logits must match the contiguous flash
    trajectory step for step."""
    cfg = TINY_LLAMA
    params, dq, dcfg = _setup(cfg, codes=codes)
    B = 2
    T = PAGE + 40  # crosses into the second page

    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, cfg.vocab_size)

    # contiguous reference
    cache = create_cache(dcfg, cfg.n_layers, B)
    step_c = jax.jit(
        lambda c, tok, pos: engine.decode_step(params, cfg, dcfg, dq, c, tok, pos)
    )
    # paged: slot 0 -> pages [3, 1], slot 1 -> pages [0, 2]
    pool = create_paged_pool(dcfg, cfg.n_layers, n_pages=4, n_slots=B)
    table = jnp.asarray([[3, 1], [0, 2]], jnp.int32)
    act = jnp.ones((B,), bool)
    step_p = jax.jit(
        lambda p, tok, pos: paged_decode_step(
            params, cfg, dcfg, dq, p, table, tok, pos, act
        )
    )

    check_at = {0, 1, 5, 6, 100, PAGE + 3, PAGE + 4, T - 1}
    for t in range(T):
        posv = jnp.full((B,), t, jnp.int32)
        cache, lc = step_c(cache, tokens[:, t], jnp.int32(t))
        pool, lp = step_p(pool, tokens[:, t], posv)
        if t in check_at:
            np.testing.assert_allclose(
                np.asarray(lp), np.asarray(lc), atol=2e-4, rtol=1e-4,
                err_msg=f"step {t}",
            )


def test_inactive_slots_write_nothing():
    """A retired slot whose table row aliases another slot's pages must not
    corrupt them (the `active` predicate)."""
    cfg = TINY_LLAMA
    params, dq, dcfg = _setup(cfg)
    B = 2
    pool = create_paged_pool(dcfg, cfg.n_layers, n_pages=2, n_slots=B)
    # both rows point at page 0; slot 1 is INACTIVE
    table = jnp.asarray([[0, 0], [0, 0]], jnp.int32)
    act = jnp.asarray([True, False])
    tokens = jax.random.randint(jax.random.PRNGKey(2), (B, 30), 0, cfg.vocab_size)

    step_p = jax.jit(
        lambda p, tok, pos: paged_decode_step(
            params, cfg, dcfg, dq, p, table, tok, pos, act
        )
    )
    # contiguous single-sequence reference for slot 0
    cache = create_cache(dcfg, cfg.n_layers, 1)
    step_c = jax.jit(
        lambda c, tok, pos: engine.decode_step(params, cfg, dcfg, dq, c, tok, pos)
    )
    for t in range(30):
        posv = jnp.full((B,), t, jnp.int32)
        pool, lp = step_p(pool, tokens[:, t], posv)
        cache, lc = step_c(cache, tokens[:1, t], jnp.int32(t))
    np.testing.assert_allclose(
        np.asarray(lp)[0], np.asarray(lc)[0], atol=2e-4, rtol=1e-4
    )


@pytest.mark.slow
def test_paged_server_matches_isolated_generation():
    cfg = TINY_LLAMA
    params, dq, dcfg = _setup(cfg)

    rng = np.random.default_rng(3)
    reqs = [
        Request(rid=i, prompt=rng.integers(0, cfg.vocab_size, size=n).astype(np.int32),
                max_new_tokens=m)
        for i, (n, m) in enumerate([(12, 6), (25, 5), (18, 7), (9, 4)])
    ]

    # pool with room for only 2 slots / 3 pages: the later requests must
    # wait for retirement and REUSE freed pages
    srv = PagedServer(params, cfg, dcfg, dq, n_pages=3, n_slots=2,
                      max_pages_per_slot=2, admit_mode="sync")
    comps = srv.run(list(reqs), max_steps=200)

    for r in reqs:
        want, _ = engine.generate(
            params, cfg, dcfg, dq, jnp.asarray(r.prompt)[None],
            engine.GenerateConfig(max_new_tokens=r.max_new_tokens),
        )
        got = comps[r.rid].tokens
        assert got == list(np.asarray(want[0])), (r.rid, got, np.asarray(want[0]))
    assert sorted(srv.free) == [0, 1, 2]  # every page returned


@pytest.mark.slow
def test_paged_server_chunked_admission():
    """Non-blocking admission: prompts stream in one quantized-trajectory
    chunk per step; completions must match isolated generation through the
    SAME (quantized) prefill path, and pages must all return."""
    cfg = TINY_LLAMA
    params, dq, dcfg = _setup(cfg)

    rng = np.random.default_rng(4)
    # prompts longer than one admit chunk so admission really interleaves
    reqs = [
        Request(rid=i,
                prompt=rng.integers(0, cfg.vocab_size, size=n).astype(np.int32),
                max_new_tokens=m)
        for i, (n, m) in enumerate([(150, 5), (40, 4), (200, 6)])
    ]

    srv = PagedServer(params, cfg, dcfg, dq, n_pages=4, n_slots=2,
                      max_pages_per_slot=2, admit_mode="chunked",
                      admit_chunk=128)
    comps = srv.run(list(reqs), max_steps=300)

    for r in reqs:
        want, _ = engine.generate(
            params, cfg, dcfg, dq, jnp.asarray(r.prompt)[None],
            engine.GenerateConfig(max_new_tokens=r.max_new_tokens),
            prefill_mode="quantized",
        )
        got = comps[r.rid].tokens
        assert got == list(np.asarray(want[0])), (r.rid, got, np.asarray(want[0]))
    assert sorted(srv.free) == [0, 1, 2, 3]


@pytest.mark.slow
def test_burst_decode_matches_per_step():
    """Device-side decode bursts (run() scans up to ``burst`` greedy steps
    per host round trip) must be TOKEN-IDENTICAL to per-step serving,
    including EOS retirement mid-burst and page reuse afterwards."""
    cfg = TINY_LLAMA
    params, dq, dcfg = _setup(cfg)

    def reqs():
        rng = np.random.default_rng(5)
        return [
            Request(rid=i,
                    prompt=rng.integers(
                        0, cfg.vocab_size, size=n).astype(np.int32),
                    max_new_tokens=m, eos_token_id=eos)
            for i, (n, m, eos) in enumerate(
                [(30, 12, None), (55, 9, 3), (20, 16, None), (41, 7, 3)])
        ]

    def run(burst):
        srv = PagedServer(params, cfg, dcfg, dq, n_pages=4, n_slots=2,
                          max_pages_per_slot=2, admit_mode="chunked",
                          admit_chunk=128, burst=burst)
        comps = srv.run(reqs(), max_steps=300)
        assert sorted(srv.free) == [0, 1, 2, 3]
        return comps

    per_step = run(0)
    bursty = run(8)
    for rid in per_step:
        assert bursty[rid].tokens == per_step[rid].tokens, rid
