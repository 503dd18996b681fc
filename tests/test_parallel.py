"""Multi-chip sharding tests on the virtual 8-device CPU mesh: tensor-parallel
weights + head-sharded quantized cache must produce the same numbers as the
single-device path, and the sharded Fisher step must run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvquant_tpu import engine
from kvquant_tpu.cache import DeployConfig, create_cache, deployed_from_quantizers
from kvquant_tpu.fisher.fisher import clm_loss
from kvquant_tpu.models import TINY_LLAMA, init_params
from kvquant_tpu.models import llama
from kvquant_tpu.parallel import (
    make_mesh, shard_params, shard_cache, shard_quant, data_sharding,
)
from kvquant_tpu.quant.artifacts import (
    KQuantizer, VQuantizer, LayerQuantizers, QuantizerSet,
)
from kvquant_tpu.quant.nuq import nf_signposts


def _toy_qs(cfg, bits=4):
    rng = np.random.default_rng(0)
    lut = nf_signposts(bits)
    layers = []
    for _ in range(cfg.n_layers):
        u = (np.abs(rng.normal(size=cfg.kv_hidden)) * 2 + 1).astype(np.float32)
        layers.append(LayerQuantizers(
            k=KQuantizer(upper=u, lower=(-u * 0.9).astype(np.float32), lut=lut.copy()),
            v=VQuantizer(lut=lut.copy()),
        ))
    return QuantizerSet(layers=layers, bits=bits, sparsity_threshold=0.99,
                        cap_outliers=True, first_few_fp16=5)


@pytest.fixture(scope="module")
def setup():
    cfg = TINY_LLAMA  # 4 kv heads -> tp=4
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qs = _toy_qs(cfg)
    dcfg = DeployConfig.create(
        bits=4, n_kv_heads=cfg.n_kv_heads, d_head=cfg.d_head, max_len=69, sink=5,
    )
    dq = deployed_from_quantizers(qs, cfg.n_kv_heads, cfg.d_head)
    return cfg, params, dcfg, dq


class TestShardedDecode:
    def test_matches_single_device(self, setup):
        cfg, params, dcfg, dq = setup
        B = 2
        prompt = jax.random.randint(jax.random.PRNGKey(1), (B, 16), 0, cfg.vocab_size)

        # single-device reference
        cache0 = create_cache(dcfg, cfg.n_layers, B)
        cache0, logits0 = engine.prefill(params, cfg, dcfg, dq, cache0, prompt)
        cache0, dec0 = engine.decode_step(
            params, cfg, dcfg, dq, cache0,
            jnp.argmax(logits0, -1).astype(jnp.int32), jnp.int32(16),
        )

        # sharded: dp=2 x tp=4
        mesh = make_mesh(dp=2, tp=4)
        p_s = shard_params(mesh, params)
        dq_s = shard_quant(mesh, dq)
        cache_s = shard_cache(mesh, create_cache(dcfg, cfg.n_layers, B))
        prompt_s = jax.device_put(prompt, data_sharding(mesh))

        cache_s, logits_s = jax.jit(
            lambda p, d, c, t: engine.prefill(p, cfg, dcfg, d, c, t)
        )(p_s, dq_s, cache_s, prompt_s)
        np.testing.assert_allclose(
            np.asarray(logits_s), np.asarray(logits0), atol=2e-4, rtol=1e-3
        )

        cache_s, dec_s = jax.jit(
            lambda p, d, c, tok: engine.decode_step(p, cfg, dcfg, d, c, tok, jnp.int32(16))
        )(p_s, dq_s, cache_s, jnp.argmax(logits_s, -1).astype(jnp.int32))
        np.testing.assert_allclose(
            np.asarray(dec_s), np.asarray(dec0), atol=2e-4, rtol=1e-3
        )

        # cache contents agree (packed codes exactly; fp arrays to tolerance)
        for f in ["k_planes", "v_planes"]:
            np.testing.assert_array_equal(
                np.asarray(getattr(cache_s, f)), np.asarray(getattr(cache0, f)), f
            )

    def test_sharded_fisher_step(self, setup):
        cfg, params, dcfg, dq = setup
        mesh = make_mesh(dp=2, tp=4)
        p_s = shard_params(mesh, params)
        B, T = 2, 16
        tokens = jax.device_put(
            jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, cfg.vocab_size),
            data_sharding(mesh),
        )

        def fisher_step(params, tokens):
            probes = llama.make_kv_probes(cfg, B, T)
            return jax.grad(
                lambda pr: clm_loss(params, cfg, tokens, kv_probes=pr)
            )(probes)

        grads = jax.jit(fisher_step)(p_s, tokens)
        assert grads["k"].shape == (cfg.n_layers, B, T, cfg.kv_hidden)
        assert bool(jnp.isfinite(grads["k"]).all())
        # must be nontrivial
        assert float(jnp.abs(grads["k"]).max()) > 0


class TestGraftEntry:
    # the driver compile-checks __graft_entry__ every round on its own
    @pytest.mark.slow
    def test_entry_and_dryrun(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        g.dryrun_multichip(8)


def test_flash_attention_under_shard_map():
    """The flash kernel sharded over (dp=2, tp=2) must equal the
    single-device call — head-local attention needs no collectives, and
    the shard_map wrapper keeps GSPMD from all-gathering the packed cache
    around the pallas_call."""
    import numpy as np
    from functools import partial

    from kvquant_tpu.cache import DeployConfig
    from kvquant_tpu.models.config import ModelConfig
    from kvquant_tpu.ops.packing import encode_outlier_words
    from kvquant_tpu.ops.pallas.flash_decode import flash_attention
    from kvquant_tpu.parallel import make_mesh
    from kvquant_tpu.parallel.shardings import flash_attention_sharded

    L, B, Hkv, G, D, bits = 2, 2, 4, 1, 16, 3
    Tc, S, hg = 256, 5, 2
    dcfg = DeployConfig.create(bits=bits, n_kv_heads=Hkv, d_head=D,
                               max_len=Tc + S, sink=S, kernel="flash",
                               dot_bf16=False, head_group=hg)
    mcfg = ModelConfig(vocab_size=64, d_model=Hkv * D, n_layers=L,
                       n_heads=Hkv * G, n_kv_heads=Hkv, d_head=D, d_ff=32,
                       max_seq_len=Tc + 64)
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    TW = Tc // 32
    J = dcfg.n_slots
    args = (
        jax.random.normal(ks[0], (B, Hkv, G, D), jnp.float32),
        jax.random.randint(ks[1], (L, B, Hkv, bits, TW, D), 0, 2**31 - 1),
        jax.random.randint(ks[2], (L, B, Hkv, bits, TW, D), 0, 2**31 - 1),
        encode_outlier_words(
            jax.random.normal(ks[3], (L, B, Hkv // hg, J, Tc)) * 0.1,
            jax.random.randint(ks[4], (L, B, Hkv // hg, J, Tc), 0, hg * 128),
        ),
        jax.random.uniform(ks[5], (L, Hkv, D)) + 0.5,
        jax.random.normal(ks[6], (L, Hkv, D)) * 0.1,
        jax.random.uniform(ks[7], (L, B, Tc)) + 0.5,
        jax.random.normal(ks[8], (L, B, Tc)) * 0.1,
        jax.random.normal(ks[9], (L, B, Hkv, S, D)),
        jax.random.normal(ks[10], (L, B, Hkv, S, D)),
        jnp.sort(jax.random.normal(ks[11], (L, 2**bits)), axis=-1),
    )
    lut = args[-1]
    pos = jnp.array([100, 37], jnp.int32)

    want = flash_attention(*args, lut, jnp.int32(1), pos, dcfg, mcfg)
    mesh = make_mesh(dp=2, tp=2)
    got = jax.jit(
        partial(flash_attention_sharded, mesh, dcfg=dcfg, mcfg=mcfg)
    )(*args, lut, jnp.int32(1), pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_flash_attention_int4_under_shard_map():
    """Same head-sharded shard_map execution with the hardware int4
    container: sharding specs name only leading axes, so the intN layout
    rides the identical wrapper."""
    import numpy as np
    from functools import partial

    from kvquant_tpu.cache import DeployConfig
    from kvquant_tpu.models.config import ModelConfig
    from kvquant_tpu.ops.packing import encode_outlier_words, store_codes_int
    from kvquant_tpu.ops.pallas.flash_decode import flash_attention
    from kvquant_tpu.parallel import make_mesh
    from kvquant_tpu.parallel.shardings import flash_attention_sharded

    L, B, Hkv, G, D, bits = 2, 2, 4, 1, 16, 4
    Tc, S, hg = 256, 5, 2
    dcfg = DeployConfig.create(bits=bits, n_kv_heads=Hkv, d_head=D,
                               max_len=Tc + S, sink=S, kernel="flash",
                               dot_bf16=False, head_group=hg, codes="int4")
    mcfg = ModelConfig(vocab_size=64, d_model=Hkv * D, n_layers=L,
                       n_heads=Hkv * G, n_kv_heads=Hkv, d_head=D, d_ff=32,
                       max_seq_len=Tc + 64)
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    J = dcfg.n_slots
    codes4 = lambda k: store_codes_int(
        jax.random.randint(k, (L, B, Hkv, Tc, D), 0, 16), bits,
        dcfg.code_dtype,
    )
    args = (
        jax.random.normal(ks[0], (B, Hkv, G, D), jnp.float32),
        codes4(ks[1]),
        codes4(ks[2]),
        encode_outlier_words(
            jax.random.normal(ks[3], (L, B, Hkv // hg, J, Tc)) * 0.1,
            jax.random.randint(ks[4], (L, B, Hkv // hg, J, Tc), 0, hg * 128),
        ),
        jax.random.uniform(ks[5], (L, Hkv, D)) + 0.5,
        jax.random.normal(ks[6], (L, Hkv, D)) * 0.1,
        jax.random.uniform(ks[7], (L, B, Tc)) + 0.5,
        jax.random.normal(ks[8], (L, B, Tc)) * 0.1,
        jax.random.normal(ks[9], (L, B, Hkv, S, D)),
        jax.random.normal(ks[10], (L, B, Hkv, S, D)),
        jnp.stack([jnp.linspace(-1.0, 1.0, 2**bits)] * L),  # affine lut
    )
    lut = args[-1]
    pos = jnp.array([100, 37], jnp.int32)

    want = flash_attention(*args, lut, jnp.int32(1), pos, dcfg, mcfg)
    mesh = make_mesh(dp=2, tp=2)
    got = jax.jit(
        partial(flash_attention_sharded, mesh, dcfg=dcfg, mcfg=mcfg)
    )(*args, lut, jnp.int32(1), pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_flash_attention_channels_under_shard_map():
    """Static-channel K outliers under the head-sharded shard_map wrapper:
    k_ressc shards with its heads (P(None, "tp")), so each shard derives
    its LOCAL per-group selection — identical to the global one because
    head groups never straddle tp shards."""
    import numpy as np
    from functools import partial

    from kvquant_tpu.cache import DeployConfig
    from kvquant_tpu.models.config import ModelConfig
    from kvquant_tpu.ops.packing import encode_outlier_words
    from kvquant_tpu.ops.pallas.flash_decode import flash_attention
    from kvquant_tpu.parallel import make_mesh
    from kvquant_tpu.parallel.shardings import flash_attention_sharded

    L, B, Hkv, G, D, bits = 2, 2, 4, 1, 16, 3
    Tc, S, hg = 256, 5, 2
    dcfg = DeployConfig.create(bits=bits, n_kv_heads=Hkv, d_head=D,
                               max_len=Tc + S, sink=S, kernel="flash",
                               dot_bf16=False, head_group=hg,
                               k_outliers="channels", n_kc=4)
    mcfg = ModelConfig(vocab_size=64, d_model=Hkv * D, n_layers=L,
                       n_heads=Hkv * G, n_kv_heads=Hkv, d_head=D, d_ff=32,
                       max_seq_len=Tc + 64)
    ks = jax.random.split(jax.random.PRNGKey(0), 14)
    TW = Tc // 32
    J, spk = dcfg.n_slots, dcfg.slots_per_kind
    # K rows: plain residual values; V rows: encoded slot words
    k_rows = jax.random.normal(ks[3], (L, B, Hkv // hg, spk, Tc)) * 0.1
    v_rows = encode_outlier_words(
        jax.random.normal(ks[4], (L, B, Hkv // hg, J - spk, Tc)) * 0.1,
        jax.random.randint(ks[12], (L, B, Hkv // hg, J - spk, Tc), 0,
                           hg * 128),
    )
    args = (
        jax.random.normal(ks[0], (B, Hkv, G, D), jnp.float32),
        jax.random.randint(ks[1], (L, B, Hkv, bits, TW, D), 0, 2**31 - 1),
        jax.random.randint(ks[2], (L, B, Hkv, bits, TW, D), 0, 2**31 - 1),
        jnp.concatenate([k_rows, v_rows], axis=3),
        jax.random.uniform(ks[5], (L, Hkv, D)) + 0.5,
        jax.random.normal(ks[6], (L, Hkv, D)) * 0.1,
        jax.random.uniform(ks[7], (L, B, Tc)) + 0.5,
        jax.random.normal(ks[8], (L, B, Tc)) * 0.1,
        jax.random.normal(ks[9], (L, B, Hkv, S, D)),
        jax.random.normal(ks[10], (L, B, Hkv, S, D)),
        jnp.sort(jax.random.normal(ks[11], (L, 2**bits)), axis=-1),
    )
    lut = args[-1]
    pos = jnp.array([100, 37], jnp.int32)
    ressc = jax.random.uniform(ks[13], (L, Hkv * D))

    want = flash_attention(*args, lut, jnp.int32(1), pos, dcfg, mcfg,
                           k_ressc=ressc)
    mesh = make_mesh(dp=2, tp=2)
    got = jax.jit(
        partial(flash_attention_sharded, mesh, dcfg=dcfg, mcfg=mcfg,
                k_ressc=ressc)
    )(*args, lut, jnp.int32(1), pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_flash_serial_under_shard_map():
    """The manual-DMA serial decode kernel under the same head-sharded
    shard_map wrapper (dcfg.kernel="flash_serial" dispatch): head-local,
    so the identical specs apply — proven against the unsharded call on
    the int4 channels speed config with unequal per-slot positions."""
    import numpy as np
    from functools import partial

    from kvquant_tpu.cache import DeployConfig
    from kvquant_tpu.models.config import ModelConfig
    from kvquant_tpu.ops.packing import store_codes_int
    from kvquant_tpu.ops.pallas.flash_serial import flash_serial_decode
    from kvquant_tpu.parallel import make_mesh
    from kvquant_tpu.parallel.shardings import flash_attention_sharded

    L, B, Hkv, G, D, bits = 2, 2, 4, 1, 16, 4
    Tc, S, hg = 256, 5, 2
    dcfg = DeployConfig.create(bits=bits, n_kv_heads=Hkv, d_head=D,
                               max_len=Tc + S, sink=S, kernel="flash_serial",
                               dot_bf16=False, head_group=hg, codes="int4",
                               post_rope_k=True, k_outliers="channels",
                               n_kc=4, cap_per_side=0)
    mcfg = ModelConfig(vocab_size=64, d_model=Hkv * D, n_layers=L,
                       n_heads=Hkv * G, n_kv_heads=Hkv, d_head=D, d_ff=32,
                       max_seq_len=Tc + 64)
    ks = jax.random.split(jax.random.PRNGKey(0), 14)
    J = dcfg.n_slots
    codes4 = lambda k: store_codes_int(
        jax.random.randint(k, (L, B, Hkv, Tc, D), 0, 16), bits,
        dcfg.code_dtype,
    )
    args = (
        jax.random.normal(ks[0], (B, Hkv, G, D), jnp.float32),
        codes4(ks[1]),
        codes4(ks[2]),
        jax.random.normal(ks[3], (L, B, Hkv // hg, J, Tc)) * 0.1,
        jax.random.uniform(ks[5], (L, Hkv, D)) + 0.5,
        jax.random.normal(ks[6], (L, Hkv, D)) * 0.1,
        jax.random.uniform(ks[7], (L, B, Tc)) + 0.5,
        jax.random.normal(ks[8], (L, B, Tc)) * 0.1,
        jax.random.normal(ks[9], (L, B, Hkv, S, D)),
        jax.random.normal(ks[10], (L, B, Hkv, S, D)),
        jnp.stack([jnp.linspace(-1.0, 1.0, 2**bits)] * L),
    )
    lut = args[-1]
    pos = jnp.array([100, 37], jnp.int32)
    ressc = jax.random.uniform(ks[13], (L, Hkv * D))

    want = flash_serial_decode(*args, lut, jnp.int32(1), pos, dcfg, mcfg,
                               k_ressc=ressc)
    mesh = make_mesh(dp=2, tp=2)
    got = jax.jit(
        partial(flash_attention_sharded, mesh, dcfg=dcfg, mcfg=mcfg,
                k_ressc=ressc)
    )(*args, lut, jnp.int32(1), pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
