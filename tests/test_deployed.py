"""Deployed-datapath tests: packing round-trips and, critically, exact
agreement between the deployed packed-cache attention and the simulated
quantization path — this framework's correctness oracle (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvquant_tpu.cache import (
    DeployConfig,
    create_cache,
    reset_cache,
    cache_bytes,
    deployed_from_quantizers,
)
from kvquant_tpu.models import ModelConfig
from kvquant_tpu.models.llama import (
    SimQuantParams,
    SimQuantArrays,
    SimQuantConfig,
    simquant_k,
    simquant_v,
    rope_cos_sin,
    apply_rope,
)
from kvquant_tpu.ops.packing import pack_codes, unpack_codes, set_token_codes
from kvquant_tpu.ops import deployed
from kvquant_tpu.quant import (
    KQuantizer,
    VQuantizer,
    LayerQuantizers,
    QuantizerSet,
    weighted_kmeans_1d,
)


# ---------------------------------------------------------------------------
# fixtures: a random calibrated single-layer quantizer
# ---------------------------------------------------------------------------

HKV, DH = 2, 8
C = HKV * DH
MCFG = ModelConfig(
    vocab_size=64, d_model=32, n_layers=1, n_heads=4, n_kv_heads=HKV,
    d_head=DH, d_ff=64, max_seq_len=128,
)


def make_quantizer_set(bits, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(512, C)).astype(np.float32)
    data[:, ::5] *= 4.0  # outlier channels
    t = 1 - (1 - 0.99) / 2
    upper = np.quantile(data, t, axis=0).astype(np.float32)
    lower = np.quantile(data, 1 - t, axis=0).astype(np.float32)
    zp, hr = (upper + lower) / 2, (upper - lower) / 2
    xn = ((data - zp) / hr).reshape(-1)
    xn = xn[np.abs(xn) <= 1.0]
    lut, _ = weighted_kmeans_1d(jnp.array(xn), k=2**bits, iters=20, seed=0)
    lut = np.asarray(lut)
    vdata = rng.normal(size=(512, C)).astype(np.float32)
    vn = vdata / np.abs(vdata).max(axis=1, keepdims=True)
    vlut, _ = weighted_kmeans_1d(jnp.array(vn.reshape(-1)), k=2**bits, iters=20, seed=1)
    return QuantizerSet(
        layers=[
            LayerQuantizers(
                k=KQuantizer(upper=upper, lower=lower, lut=lut),
                v=VQuantizer(lut=np.asarray(vlut)),
            )
        ],
        bits=bits,
        sparsity_threshold=0.99,
        cap_outliers=True,
        first_few_fp16=5,
    )


def setup(bits, max_len=69, sink=5, seed=0):
    qs = make_quantizer_set(bits, seed)
    dcfg = DeployConfig.create(
        bits=bits, n_kv_heads=HKV, d_head=DH, max_len=max_len, sink=sink,
    )
    dq = deployed_from_quantizers(qs, HKV, DH)
    lq = dq.layer(0)
    sq_arrays = SimQuantArrays(
        k_lower=jnp.asarray(qs.layers[0].k.lower),
        k_upper=jnp.asarray(qs.layers[0].k.upper),
        k_lut=jnp.asarray(np.sort(qs.layers[0].k.lut.reshape(-1))),
        v_lut=jnp.asarray(np.sort(qs.layers[0].v.lut.reshape(-1))),
        k_normscale=jnp.float32(1.0), k_normoffset=jnp.float32(0.0),
        v_normscale=jnp.float32(1.0), v_normoffset=jnp.float32(0.0),
    )
    sq_cfg = SimQuantConfig(
        bits=bits, include_sparse=True, sparsity_threshold=0.99,
        cap_per_side=dcfg.cap_per_side, n_kv_heads=HKV,
        v_range_exclude=dcfg.v_range_exclude, first_few_fp16=sink,
        v_mode="topk",
    )
    return dcfg, lq, sq_arrays, sq_cfg


class TestPacking:
    @pytest.mark.parametrize("bits", [2, 3, 4])
    def test_roundtrip(self, bits):
        rng = np.random.default_rng(0)
        codes = rng.integers(0, 2**bits, size=(3, 128, 8)).astype(np.int32)
        planes = pack_codes(jnp.array(codes), bits)
        assert planes.shape == (3, bits, 4, 8)
        out = unpack_codes(planes, bits)
        np.testing.assert_array_equal(np.asarray(out), codes)

    @pytest.mark.parametrize("bits", [2, 3, 4])
    def test_incremental_equals_bulk(self, bits):
        rng = np.random.default_rng(1)
        T = 128
        codes = rng.integers(0, 2**bits, size=(2, HKV, T, DH)).astype(np.int32)
        bulk = pack_codes(jnp.array(codes), bits)  # (2,HKV,bits,4,DH)
        planes = jnp.zeros_like(bulk)
        for t in range(T):
            planes = set_token_codes(planes, jnp.array(codes[:, :, t]), t)
        np.testing.assert_array_equal(np.asarray(planes), np.asarray(bulk))

    def test_set_overwrites(self):
        bits = 4
        planes = jnp.zeros((1, bits, 4, 2), jnp.int32)
        planes = set_token_codes(planes, jnp.full((1, 2), 15), 7)
        planes = set_token_codes(planes, jnp.full((1, 2), 3), 7)
        codes = unpack_codes(planes, bits)
        assert int(codes[0, 7, 0]) == 3 and int(codes[0, 7, 1]) == 3
        assert int(jnp.sum(codes)) == 6


class TestQuantizeTokens:
    @pytest.mark.parametrize("bits", [2, 3, 4])
    def test_k_dense_plus_sparse_matches_sim(self, bits):
        dcfg, lq, arrs, scfg = setup(bits)
        rng = np.random.default_rng(2)
        k = jnp.array(rng.normal(size=(3, C)).astype(np.float32) * 2.0)

        codes, k_words = deployed.quantize_k(k, lq, dcfg)
        deq = (
            jnp.take(lq.k_lut_dec, codes) * lq.k_range + lq.k_offset
        )  # (3, HKV, DH)
        from kvquant_tpu.ops.packing import decode_outlier_words
        ovals, oidx = decode_outlier_words(k_words)
        onehot = (oidx[..., None] == jnp.arange(DH)).astype(np.float32)
        recon = (deq + jnp.einsum("bhj,bhjd->bhd", ovals, onehot)).reshape(3, C)

        # simulated path (no sink so token rows are independent)
        sim = simquant_k(k[:, None, :], arrs,
                         SimQuantConfig(bits=bits, include_sparse=True,
                                        sparsity_threshold=0.99,
                                        cap_per_side=dcfg.cap_per_side,
                                        n_kv_heads=HKV,
                                        first_few_fp16=0, v_mode="topk"))[:, 0]
        # encoded outlier words carry the dim in the low 7 mantissa bits:
        # residual precision ~2^-16 relative
        np.testing.assert_allclose(np.asarray(recon), np.asarray(sim), atol=1e-4)

    @pytest.mark.parametrize("bits", [2, 3, 4])
    def test_v_dense_plus_sparse_matches_sim(self, bits):
        dcfg, lq, arrs, scfg = setup(bits)
        rng = np.random.default_rng(3)
        v = jnp.array(rng.normal(size=(3, C)).astype(np.float32))

        codes, v_words, sc, off = deployed.quantize_v(v, lq, dcfg)
        deq = (
            jnp.take(lq.v_lut_dec, codes) * sc[:, None, None]
            + off[:, None, None]
        )  # (3, HKV, DH)
        from kvquant_tpu.ops.packing import decode_outlier_words
        ovals, oidx = decode_outlier_words(v_words)
        onehot = (oidx[..., None] == jnp.arange(DH)).astype(np.float32)
        recon = (deq + jnp.einsum("bhj,bhjd->bhd", ovals, onehot)).reshape(3, C)

        sim = simquant_v(v[:, None, :], arrs,
                         SimQuantConfig(bits=bits, include_sparse=True,
                                        sparsity_threshold=0.99,
                                        cap_per_side=dcfg.cap_per_side,
                                        n_kv_heads=HKV,
                                        v_range_exclude=dcfg.v_range_exclude,
                                        first_few_fp16=0, v_mode="topk"))[:, 0]
        # encoded outlier words carry the dim in the low 7 mantissa bits:
        # residual precision ~2^-16 relative
        np.testing.assert_allclose(np.asarray(recon), np.asarray(sim), atol=1e-4)


from functools import partial


@partial(jax.jit, static_argnums=(2, 3))
def _decode_step(cache, lq, dcfg, mcfg, q, k, v, pos):
    return deployed.decode_attention(cache, lq, dcfg, mcfg, q, k, v, pos)


def simulated_attention(q, k, v, arrs, scfg, mcfg):
    """Ground truth: fake-quantize K/V, rope, full causal attention.
    q (B,T,H,Dh); k/v (B,T,C). Returns (B,T,H,Dh)."""
    B, T, H, Dh = q.shape
    kq = simquant_k(k, arrs, scfg).reshape(B, T, HKV, Dh)
    vq = simquant_v(v, arrs, scfg).reshape(B, T, HKV, Dh)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    cos, sin = rope_cos_sin(positions, mcfg)
    qr = apply_rope(q.astype(jnp.float32), cos, sin)
    kr = apply_rope(kq.astype(jnp.float32), cos, sin)
    G = H // HKV
    qh = qr.reshape(B, T, HKV, G, Dh)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qh, kr) / (Dh**0.5)
    mask = jnp.tril(jnp.ones((T, T), bool))
    scores = jnp.where(mask[None, None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, vq)
    return out.reshape(B, T, H, Dh)


class TestDecodeEquivalence:
    @pytest.mark.parametrize("bits", [4, 2])
    def test_stepwise_decode_matches_simulated(self, bits):
        dcfg, lq, arrs, scfg = setup(bits, max_len=37 + 5)
        B, T, H = 2, 24, 4
        rng = np.random.default_rng(4)
        q = jnp.array(rng.normal(size=(B, T, H, DH)).astype(np.float32))
        k = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32) * 2)
        v = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))

        ref = simulated_attention(q, k, v, arrs, scfg, MCFG)

        cache = create_cache(dcfg, n_layers=1, batch=B).layer(0)
        outs = []
        for t in range(T):
            cache, o = _decode_step(
                cache, lq, dcfg, MCFG, q[:, t], k[:, t], v[:, t], jnp.int32(t)
            )
            outs.append(o)
        got = jnp.stack(outs, axis=1)
        # outliers are stored fp16 in the cache (as in the reference) while
        # the simulated path keeps them exact -> ~1e-3 differences
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=4e-3, rtol=1e-3
        )

    def test_prefill_then_decode_matches_all_decode(self):
        bits = 3
        dcfg, lq, arrs, scfg = setup(bits, max_len=37 + 5)
        B, T = 1, 20
        rng = np.random.default_rng(5)
        q = jnp.array(rng.normal(size=(B, T, 4, DH)).astype(np.float32))
        k = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32) * 2)
        v = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))

        # path A: decode everything
        cache_a = create_cache(dcfg, 1, B).layer(0)
        for t in range(T - 1):
            cache_a, _ = _decode_step(
                cache_a, lq, dcfg, MCFG, q[:, t], k[:, t], v[:, t], jnp.int32(t)
            )
        cache_a, out_a = _decode_step(
            cache_a, lq, dcfg, MCFG, q[:, -1], k[:, -1], v[:, -1], jnp.int32(T - 1)
        )

        # path B: prefill T-1 tokens, decode the last
        cache_b = create_cache(dcfg, 1, B).layer(0)
        cache_b = deployed.prefill_pack(cache_b, lq, dcfg, MCFG, k[:, :-1], v[:, :-1])
        cache_b, out_b = _decode_step(
            cache_b, lq, dcfg, MCFG, q[:, -1], k[:, -1], v[:, -1], jnp.int32(T - 1)
        )

        for fa, fb in zip(jax.tree.leaves(cache_a), jax.tree.leaves(cache_b)):
            np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_b), atol=1e-5
        )

    def test_reset(self):
        dcfg, lq, _, _ = setup(4)
        cache = create_cache(dcfg, 1, 1).layer(0)
        cache, _ = deployed.decode_attention(
            cache, lq, dcfg, MCFG,
            jnp.ones((1, 4, DH)), jnp.ones((1, C)), jnp.ones((1, C)), 0
        )
        cache = reset_cache(cache)
        assert all(
            float(jnp.abs(leaf).sum()) == 0 for leaf in jax.tree.leaves(cache)
        )

    def test_cache_bytes_ratio(self):
        # per-head tiles (head_group=1): one 8-slot fp32 tile per head is
        # 512B/token vs the reference's global 336B rows -> ~3.98x
        dcfg = DeployConfig.create(
            bits=3, n_kv_heads=32, d_head=128, max_len=2**20, sink=5,
        )
        acct = cache_bytes(dcfg, n_layers=32, batch=1)
        assert acct["ratio"] > 3.9, acct
        # 4-head groups cut outliers to 128B/token: beats the reference's
        # 4.8x claim at 3-bit (lwm/README.md:5)
        dcfg4 = DeployConfig.create(
            bits=3, n_kv_heads=32, d_head=128, max_len=2**20, sink=5,
            head_group=4,
        )
        acct4 = cache_bytes(dcfg4, n_layers=32, batch=1)
        assert acct4["ratio"] > 4.8, acct4


class TestOutlierAddend:
    """The one-hot outlier densification must agree with a numpy scatter."""

    def test_matches_numpy_scatter(self):
        dcfg, lq, arrs, scfg = setup(4, max_len=37 + 5)
        rng = np.random.default_rng(9)
        B, T = 2, 20
        k = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32) * 2)
        v = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
        cache = create_cache(dcfg, 1, B).layer(0)
        cache = deployed.prefill_pack(cache, lq, dcfg, MCFG, k, v)

        from kvquant_tpu.ops.packing import decode_outlier_words
        k_part = cache.kv_out[:, :, : dcfg.slots_per_kind]
        got = deployed._outlier_addend(k_part, dcfg)
        vals, idx = decode_outlier_words(k_part)
        ov = np.asarray(vals)
        oi = np.asarray(idx)
        want = np.zeros(got.shape, np.float32)
        B_, H_, J_, Tc_ = ov.shape
        for b in range(B_):
            for h in range(H_):
                for j in range(J_):
                    for t in range(Tc_):
                        want[b, h, t, oi[b, h, j, t]] += ov[b, h, j, t]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
