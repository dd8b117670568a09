"""Bit-exact round-trip property tests for the C++ host codec.

The reference only asserted round-trips in commented-out code
(utils/encodings.py:151, 173-175); here they are permanent tests.
"""

import numpy as np
import pytest

from gsvc_tpu.codec import (
    decode_binary, decode_gaussian_symbols, decode_octree, encode_binary,
    encode_gaussian_symbols, encode_octree, morton_sort_indices,
    native_available,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native codec unavailable")


class TestGaussianANS:
    @pytest.mark.parametrize("seed,n", [(0, 1000), (1, 37), (2, 100_000)])
    def test_roundtrip_exact(self, seed, n):
        rng = np.random.default_rng(seed)
        mu = rng.normal(0, 50, n)
        sigma = rng.uniform(0.3, 30, n)
        syms = np.round(rng.normal(mu, sigma)).astype(np.int32)
        lo, hi = int(syms.min()) - 5, int(syms.max()) + 5
        stream = encode_gaussian_symbols(syms, mu, sigma, lo, hi)
        out = decode_gaussian_symbols(stream, mu, sigma, lo, hi)
        np.testing.assert_array_equal(out, syms)

    def test_rate_close_to_entropy(self):
        rng = np.random.default_rng(3)
        n = 50_000
        sigma = np.full(n, 8.0)
        mu = np.zeros(n)
        syms = np.round(rng.normal(0, 8.0, n)).astype(np.int32)
        stream = encode_gaussian_symbols(syms, mu, sigma, -200, 200)
        bits_per_sym = len(stream) * 8 / n
        entropy = 0.5 * np.log2(2 * np.pi * np.e * 64)
        assert bits_per_sym < entropy * 1.02 + 0.05

    def test_tiny_sigma_and_skew(self):
        """Near-deterministic distributions still round-trip."""
        rng = np.random.default_rng(4)
        n = 500
        mu = rng.normal(0, 1000, n)
        sigma = np.full(n, 1e-9)
        syms = np.round(mu).astype(np.int32)
        lo, hi = int(syms.min()) - 2, int(syms.max()) + 2
        stream = encode_gaussian_symbols(syms, mu, sigma, lo, hi)
        out = decode_gaussian_symbols(stream, mu, sigma, lo, hi)
        np.testing.assert_array_equal(out, syms)
        # near-deterministic => far below 1 bit/symbol
        assert len(stream) * 8 / n < 1.0

    def test_symbols_far_from_mean(self):
        """Symbols in the CDF tail (likelihood floor) still round-trip."""
        n = 64
        mu = np.zeros(n)
        sigma = np.full(n, 0.5)
        syms = np.full(n, 40, np.int32)  # 80 sigma away
        stream = encode_gaussian_symbols(syms, mu, sigma, -50, 50)
        out = decode_gaussian_symbols(stream, mu, sigma, -50, 50)
        np.testing.assert_array_equal(out, syms)


class TestBinaryANS:
    @pytest.mark.parametrize("p,seed", [(0.5, 0), (0.05, 1), (0.93, 2)])
    def test_roundtrip(self, p, seed):
        rng = np.random.default_rng(seed)
        bits = (rng.random(20_000) < p).astype(np.uint8)
        stream = encode_binary(bits, p)
        out = decode_binary(stream, bits.shape[0], p)
        np.testing.assert_array_equal(out, bits)

    def test_rate_matches_bernoulli_entropy(self):
        rng = np.random.default_rng(3)
        p = 0.1
        bits = (rng.random(100_000) < p).astype(np.uint8)
        stream = encode_binary(bits, p)
        h = -(p * np.log2(p) + (1 - p) * np.log2(1 - p))
        assert len(stream) * 8 / bits.shape[0] < h * 1.05 + 0.01


class TestOctree:
    @pytest.mark.parametrize("seed,n,depth", [(0, 1000, 16), (1, 30_000, 16),
                                              (2, 100, 8)])
    def test_roundtrip_as_multiset(self, seed, n, depth):
        rng = np.random.default_rng(seed)
        pts = rng.integers(0, 2 ** depth, (n, 3)).astype(np.uint32)
        stream = encode_octree(pts, depth)
        out = decode_octree(stream, n, depth)
        a = np.sort(pts.view([("x", np.uint32), ("y", np.uint32),
                              ("z", np.uint32)]).ravel())
        b = np.sort(out.view([("x", np.uint32), ("y", np.uint32),
                              ("z", np.uint32)]).ravel())
        np.testing.assert_array_equal(a, b)

    def test_duplicates_preserved(self):
        pts = np.array([[1, 2, 3]] * 5 + [[4, 5, 6]] * 3, np.uint32)
        stream = encode_octree(pts, 8)
        out = decode_octree(stream, 8, 8)
        assert (out == [1, 2, 3]).all(axis=1).sum() == 5
        assert (out == [4, 5, 6]).all(axis=1).sum() == 3

    def test_selection_alignment(self):
        """attributes[selection] must align with decoder point order —
        the contract the whole attribute codec depends on."""
        rng = np.random.default_rng(5)
        n = 5000
        pts = rng.integers(0, 2 ** 16, (n, 3)).astype(np.uint32)
        attrs = rng.normal(size=(n, 4)).astype(np.float32)
        stream = encode_octree(pts, 16)
        decoded = decode_octree(stream, n, 16)
        sel = morton_sort_indices(pts, 16)
        np.testing.assert_array_equal(pts[sel], decoded)
        # attribute streams written in selection order line up 1:1
        assert attrs[sel].shape == (n, 4)

    def test_compression_beats_raw_on_clustered(self):
        rng = np.random.default_rng(6)
        centers = rng.integers(0, 2 ** 16, (20, 3))
        pts = (centers[rng.integers(0, 20, 20_000)]
               + rng.integers(-300, 300, (20_000, 3))).clip(0, 2 ** 16 - 1)
        pts = pts.astype(np.uint32)
        stream = encode_octree(pts, 16)
        raw_bits = 20_000 * 3 * 16
        assert len(stream) * 8 < raw_bits * 0.8
