"""Native (C++) host packing vs the JAX layout implementation: two
independent encodings of the same cache-format contract must agree
bit-for-bit."""

import numpy as np
import jax.numpy as jnp
import pytest

from kvquant_tpu import native
from kvquant_tpu.ops import packing


@pytest.mark.parametrize("bits", [2, 3, 4])
def test_pack_matches_jax(bits):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 2**bits, size=(3, 256, 16)).astype(np.int32)
    want = np.asarray(packing.pack_codes(jnp.asarray(codes), bits))
    got = native.pack_codes(codes, bits)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bits", [2, 3, 4])
def test_unpack_roundtrip(bits):
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 2**bits, size=(2, 128, 8)).astype(np.int32)
    planes = native.pack_codes(codes, bits)
    back = native.unpack_codes(planes, bits)
    np.testing.assert_array_equal(back, codes)


def test_outlier_words_match_jax():
    rng = np.random.default_rng(2)
    vals = rng.normal(size=(4, 8, 64)).astype(np.float32)
    idx = rng.integers(0, 128, size=(4, 8, 64)).astype(np.int32)
    want = np.asarray(packing.encode_outlier_words(
        jnp.asarray(vals), jnp.asarray(idx)
    ))
    got = native.encode_outliers(vals, idx)
    np.testing.assert_array_equal(got.view(np.uint32), want.view(np.uint32))

    v2, i2 = native.decode_outliers(got)
    np.testing.assert_array_equal(i2, idx)
    # 9-bit index field steals 9 mantissa bits: ~2^-14 relative
    np.testing.assert_allclose(v2, vals, rtol=3e-4, atol=1e-6)


def test_native_lib_builds():
    # the toolchain is baked into this image; the C++ path must be live
    assert native.have_native()
