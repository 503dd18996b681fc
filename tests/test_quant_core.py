"""Unit tests for the quantization math core (kvquant_tpu.quant)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvquant_tpu.quant import (
    nearest_codes,
    nearest_values,
    nf_signposts,
    dynamic_minmax,
    quant_zp,
    quant_lut,
    outlier_budget_per_side,
    static_outlier_mask,
    dynamic_outlier_mask,
    capped_outlier_mask,
    apply_sink_mask,
    weighted_kmeans_1d,
)


class TestNearest:
    def test_matches_bruteforce_argmin(self):
        rng = np.random.default_rng(0)
        lut = np.sort(rng.normal(size=16)).astype(np.float32)
        x = rng.normal(size=(37, 53)).astype(np.float32) * 2
        codes = np.asarray(nearest_codes(jnp.array(x), jnp.array(lut)))
        brute = np.argmin(np.abs(x[..., None] - lut), axis=-1)
        np.testing.assert_array_equal(codes, brute)
        vals = np.asarray(nearest_values(jnp.array(x), jnp.array(lut)))
        np.testing.assert_array_equal(vals, lut[brute])

    def test_out_of_range_clamps_to_extremes(self):
        lut = jnp.array([-1.0, 0.0, 1.0, 2.0])
        assert nearest_codes(jnp.float32(-50.0), lut) == 0
        assert nearest_codes(jnp.float32(50.0), lut) == 3


class TestNFSignposts:
    @pytest.mark.parametrize("bits", [2, 3, 4, 5])
    def test_structure(self, bits):
        sp = nf_signposts(bits)
        assert sp.shape == (2**bits,)
        assert np.all(np.diff(sp) > 0)
        np.testing.assert_allclose(sp[0], -1.0, atol=1e-6)
        np.testing.assert_allclose(sp[-1], 1.0, atol=1e-6)
        # the merged grid contains an exact zero (ndtri(0.5) == 0)
        assert np.min(np.abs(sp)) < 1e-7

    def test_against_independent_torch_construction(self):
        """Re-derive the published NF4 construction (arXiv:2306.06965 spacing)
        with torch's Normal icdf as an independent oracle."""
        torch = pytest.importorskip("torch")
        from torch.distributions import Normal

        bits = 4
        half = 2 ** (bits - 1)
        dist = Normal(torch.tensor([0.0]), torch.tensor([1.0]))
        lo = 0.5 * (1 / 32 + 1 / 30)
        neg_q = [lo + (0.5 - lo) / (half - 1) * i for i in range(half)]
        hi = 1 - lo
        pos_q = [0.5 + (hi - 0.5) / half * i for i in range(half)] + [hi]
        neg = [dist.icdf(torch.tensor([q])).item() for q in neg_q]
        pos = [dist.icdf(torch.tensor([q])).item() for q in pos_q]
        neg = [(v + abs(neg[-1])) / (abs(neg[0]) - abs(neg[-1])) for v in neg]
        pos = [(v - abs(pos[0])) / (abs(pos[-1]) - abs(pos[0])) for v in pos]
        expected = np.array(neg + pos[1:], dtype=np.float32)
        np.testing.assert_allclose(nf_signposts(bits), expected, atol=1e-5)


class TestQuantZP:
    def test_lossless_at_high_bits(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(64, 32)).astype(np.float32)
        deq = quant_zp(jnp.array(x), bits=16, axis=0, dynamic=True)
        np.testing.assert_allclose(np.asarray(deq), x, atol=2e-4)

    def test_grid_values(self):
        # 2-bit over [0, 3] -> grid {0,1,2,3}
        x = jnp.array([[0.0, 0.4, 1.6, 2.9]])
        deq = quant_zp(x, bits=2, axis=-1, minval=0.0, maxval=3.0)
        np.testing.assert_allclose(np.asarray(deq), [[0.0, 0.0, 2.0, 3.0]])

    def test_outliers_pass_through(self):
        x = jnp.array([[0.0, 100.0, 1.0, 2.0]])
        mask = jnp.array([[False, True, False, False]])
        deq = quant_zp(
            x, bits=2, axis=-1, minval=0.0, maxval=3.0, outlier_mask=mask
        )
        assert deq[0, 1] == 100.0


class TestQuantLUT:
    def test_reconstruction_exact_on_lut_grid(self):
        lut = jnp.array([-1.0, -0.25, 0.3, 1.0])
        # pick values exactly on the dequantized grid: lut * range + offset
        rangeval, offset = 2.0, 0.5
        x = lut * rangeval + offset
        deq = quant_lut(
            x[None, :],
            lut,
            axis=-1,
            minval=offset - rangeval,
            maxval=offset + rangeval,
        )
        np.testing.assert_allclose(np.asarray(deq)[0], np.asarray(x), atol=1e-6)

    def test_dynamic_median_recentering(self):
        # one huge outlier must not skew the dynamic range when masked
        x = jnp.array([[1.0, 2.0, 3.0, 1000.0]])
        mask = jnp.array([[False, False, False, True]])
        mn, mx = dynamic_minmax(x, axis=-1, outlier_mask=mask)
        assert float(mn[0, 0]) == 1.0
        assert float(mx[0, 0]) == 3.0  # median(x)=2.5 replaced the outlier

    def test_sink_tokens_pass_through(self):
        rng = np.random.default_rng(2)
        x = jnp.array(rng.normal(size=(8, 16)).astype(np.float32))
        lut = jnp.array(nf_signposts(2))
        deq = quant_lut(x, lut, axis=-1, dynamic=True, sink=3, token_axis=0)
        np.testing.assert_array_equal(np.asarray(deq)[:3], np.asarray(x)[:3])
        assert not np.allclose(np.asarray(deq)[3:], np.asarray(x)[3:])

    def test_qnorm_affine(self):
        x = jnp.array([[0.0, 1.0]])
        lut = jnp.array([-1.0, 0.0, 0.5, 1.0])
        base = quant_lut(x, lut, axis=-1, minval=-1.0, maxval=1.0)
        scaled = quant_lut(
            x, lut, axis=-1, minval=-1.0, maxval=1.0, normscale=2.0,
            normoffset=0.1,
        )
        np.testing.assert_allclose(
            np.asarray(scaled), np.asarray(base) * 2.0 + 0.1, atol=1e-6
        )


class TestOutliers:
    def test_budget_formula(self):
        assert outlier_budget_per_side(4096, 0.99) == 21
        assert outlier_budget_per_side(1024, 0.99) == 6

    def test_static_mask_strict(self):
        x = jnp.array([[1.0, 2.0, 3.0]])
        m = static_outlier_mask(x, lower=jnp.array([1.0]), upper=jnp.array([2.0]), axis=0)
        np.testing.assert_array_equal(np.asarray(m), [[False, False, True]])

    def test_dynamic_mask_fraction(self):
        rng = np.random.default_rng(3)
        x = jnp.array(rng.normal(size=(16, 4096)).astype(np.float32))
        m = dynamic_outlier_mask(x, thresh=0.99, axis=-1)
        frac = float(jnp.mean(m))
        assert 0.008 < frac < 0.015

    def test_capped_mask_budget(self):
        rng = np.random.default_rng(4)
        c = 512
        x = rng.normal(size=(32, c)).astype(np.float32)
        # per-channel thresholds along token axis 0
        lo = np.quantile(x, 0.02, axis=0)
        hi = np.quantile(x, 0.98, axis=0)
        cap = 5
        mask, rescaled = capped_outlier_mask(jnp.array(x), lo, hi, cap, axis=0)
        per_tok = np.asarray(mask).sum(axis=-1)
        assert per_tok.max() <= 2 * cap
        # every masked element must be a genuine threshold outlier
        genuine = (x < lo[None, :]) | (x > hi[None, :])
        assert np.all(~np.asarray(mask) | genuine)

    def test_capped_mask_keeps_largest(self):
        x = np.zeros((1, 16), np.float32)
        x[0, 3], x[0, 7], x[0, 11] = 10.0, 20.0, -30.0
        lo = np.full(16, -1.0, np.float32)
        hi = np.full(16, 1.0, np.float32)
        mask, _ = capped_outlier_mask(jnp.array(x), lo, hi, 1, axis=0)
        m = np.asarray(mask)[0]
        assert m[7] and m[11] and not m[3]  # cap=1/side: keep ±extremes

    def test_sink_mask(self):
        m = jnp.zeros((6, 4), bool)
        out = apply_sink_mask(m, sink=2, token_axis=0)
        assert bool(jnp.all(out[:2])) and not bool(jnp.any(out[2:]))


class TestWeightedKMeans:
    def test_recovers_separated_clusters(self):
        rng = np.random.default_rng(5)
        centers = np.array([-3.0, -1.0, 2.0, 5.0], np.float32)
        x = (centers[:, None] + 0.01 * rng.normal(size=(4, 500))).reshape(-1)
        got, inertia = weighted_kmeans_1d(jnp.array(x), k=4, iters=25, seed=0)
        np.testing.assert_allclose(np.sort(np.asarray(got)), centers, atol=0.05)
        assert float(inertia) < 1.0

    def test_zero_weight_points_ignored(self):
        x = jnp.array([0.0, 0.1, -0.1, 100.0] * 50)
        w = jnp.array([1.0, 1.0, 1.0, 0.0] * 50)
        got, _ = weighted_kmeans_1d(x, w, k=2, iters=25, seed=0)
        # the zero-weighted 100.0 cluster must not attract a centroid
        assert float(jnp.max(jnp.abs(got))) < 1.0

    def test_fisher_weighting_pulls_centroids(self):
        # two clusters, one with 100x weight: with k=1 the centroid must sit
        # near the heavy cluster
        x = jnp.array([0.0] * 100 + [1.0] * 100)
        w = jnp.array([100.0] * 100 + [1.0] * 100)
        got, _ = weighted_kmeans_1d(x, w, k=1, iters=10, seed=0)
        assert float(got[0]) < 0.02
