"""Continuous-batching server tests: interleaved multi-slot serving must
produce exactly the tokens that isolated greedy generation produces, with
slots at independent positions and mid-flight admission."""

import numpy as np
import jax
import jax.numpy as jnp

from kvquant_tpu import engine, serve
from kvquant_tpu.cache import DeployConfig, deployed_from_quantizers
from kvquant_tpu.models import TINY_LLAMA, init_params
from kvquant_tpu.quant.calibration import collect_kv_activations, fit_quantizers


def _setup():
    cfg = TINY_LLAMA
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    cal = jax.random.randint(jax.random.PRNGKey(7), (2, 40), 0, cfg.vocab_size)
    k_acts, v_acts = collect_kv_activations(params, cfg, [cal])
    qs = fit_quantizers(k_acts, v_acts, bits=4, cap_outliers=True,
                        first_few_fp16=5, sample_seqlen=40, kmeans_iters=8)
    dcfg = DeployConfig.create(bits=4, n_kv_heads=cfg.n_kv_heads,
                               d_head=cfg.d_head, max_len=69, sink=5)
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)
    return cfg, params, dcfg, dq


def test_interleaved_matches_isolated():
    cfg, params, dcfg, dq = _setup()
    rng = np.random.default_rng(0)
    # 3 requests, 2 slots -> the third is admitted mid-flight; different
    # prompt lengths exercise per-sample positions
    prompts = [
        rng.integers(0, cfg.vocab_size, size=n).astype(np.int32)
        for n in (12, 17, 9)
    ]
    n_new = [6, 4, 5]

    # isolated references
    want = []
    for p, n in zip(prompts, n_new):
        out, _ = engine.generate(
            params, cfg, dcfg, dq, jnp.asarray(p)[None],
            engine.GenerateConfig(max_new_tokens=n),
        )
        want.append(list(np.asarray(out)[0]))

    srv = serve.Server(params, cfg, dcfg, dq, n_slots=2)
    results = srv.run([
        serve.Request(rid=i, prompt=p, max_new_tokens=n)
        for i, (p, n) in enumerate(zip(prompts, n_new))
    ])
    for i in range(3):
        assert results[i].tokens == want[i], (i, results[i].tokens, want[i])


def test_eos_retires_slot():
    cfg, params, dcfg, dq = _setup()
    rng = np.random.default_rng(1)
    p = rng.integers(0, cfg.vocab_size, size=10).astype(np.int32)
    # find the greedy first token, then use it as EOS -> single-token output
    out, _ = engine.generate(
        params, cfg, dcfg, dq, jnp.asarray(p)[None],
        engine.GenerateConfig(max_new_tokens=1),
    )
    eos = int(np.asarray(out)[0, 0])
    srv = serve.Server(params, cfg, dcfg, dq, n_slots=1)
    res = srv.run([serve.Request(rid=0, prompt=p, max_new_tokens=8,
                                 eos_token_id=eos)])
    assert res[0].tokens == [eos]
