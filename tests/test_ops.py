"""Unit tests for codec primitives: quantizers, entropy models, embedders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.ops import (
    ste_binary, ste_round, ste_quantize, uniform_noise_quantize,
    quantize_anchor, quantize_anchor_indices, dequantize_anchor,
    gaussian_bits, bernoulli_bits, binary_vxl_size, positional_embedder,
)


class TestSTEBinary:
    def test_forward_sign(self):
        x = jnp.array([-2.0, -0.5, 0.0, 0.3, 1.7])
        out = ste_binary(x)
        np.testing.assert_array_equal(out, [-1.0, -1.0, 1.0, 1.0, 1.0])

    def test_gradient_masked_outside_unit(self):
        g = jax.grad(lambda x: jnp.sum(ste_binary(x) * jnp.arange(1.0, 6.0)))(
            jnp.array([-2.0, -0.5, 0.0, 0.3, 1.7]))
        # grad passes only where |x| <= 1
        np.testing.assert_allclose(g, [0.0, 2.0, 3.0, 4.0, 0.0])


class TestSTERound:
    def test_forward_rounds(self):
        x = jnp.array([0.26, -0.74, 1.09])
        out = ste_round(x, 0.5)
        np.testing.assert_allclose(out, [0.5, -0.5, 1.0], atol=1e-6)

    def test_gradient_passthrough(self):
        g = jax.grad(lambda x: jnp.sum(ste_round(x, 0.5)))(
            jnp.array([0.26, -0.74, 1.09]))
        np.testing.assert_allclose(g, [1.0, 1.0, 1.0])

    def test_quantize_roundtrip_symbols(self):
        x = jnp.array([0.26, -0.74, 1.09])
        q = 0.5
        sym = ste_quantize(x, q, -100, 100)
        np.testing.assert_allclose(sym, [1.0, -1.0, 2.0])
        np.testing.assert_allclose(sym * q, ste_round(x, q), atol=1e-6)


class TestNoiseQuantizer:
    def test_noise_within_half_step(self):
        x = jnp.zeros((1000,))
        out = uniform_noise_quantize(x, 0.2, jax.random.PRNGKey(0))
        assert jnp.all(jnp.abs(out) <= 0.1 + 1e-6)
        assert jnp.std(out) > 0.01


class TestQuantizeAnchor:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        anchors = jnp.asarray(rng.uniform(-1, 1, (100, 3)), jnp.float32)
        min_v = jnp.full((1, 3), -1.1)
        max_v = jnp.full((1, 3), 1.1)
        aq = quantize_anchor(anchors, min_v, max_v)
        interval = (2.2) / (2 ** 16 - 1)
        assert jnp.max(jnp.abs(aq - anchors)) <= interval + 1e-6

    def test_indices_dequantize(self):
        rng = np.random.default_rng(1)
        anchors = jnp.asarray(rng.uniform(-1, 1, (50, 3)), jnp.float32)
        min_v = jnp.full((1, 3), -1.1)
        max_v = jnp.full((1, 3), 1.1)
        idx, interval, mn = quantize_anchor_indices(anchors, min_v, max_v)
        deq = dequantize_anchor(idx, interval, mn)
        aq = quantize_anchor(anchors, min_v, max_v)
        np.testing.assert_allclose(deq, aq, atol=1e-6)

    def test_gradient_passthrough(self):
        anchors = jnp.ones((4, 3)) * 0.3
        min_v, max_v = jnp.full((1, 3), -1.0), jnp.full((1, 3), 1.0)
        g = jax.grad(lambda a: jnp.sum(quantize_anchor(a, min_v, max_v)))(anchors)
        np.testing.assert_allclose(g, np.ones((4, 3)))


class TestGaussianBits:
    def test_matches_analytic_entropy(self):
        """Average bits of N(0,s) data quantized with step q approaches
        h = log2(sqrt(2*pi*e)*s/q) for s >> q."""
        rng = np.random.default_rng(0)
        s, q = 4.0, 0.25
        x = jnp.asarray(np.round(rng.normal(0, s, 200_000) / q) * q, jnp.float32)
        bits = gaussian_bits(x, 0.0, s, q)
        expected = 0.5 * np.log2(2 * np.pi * np.e * (s / q) ** 2)
        assert abs(float(jnp.mean(bits)) - expected) < 0.03

    def test_quantized_form_consistency(self):
        """quantized=True on integer symbols == quantized=False on x*q."""
        rng = np.random.default_rng(1)
        q = 0.2
        sym = jnp.asarray(rng.integers(-10, 10, 500), jnp.float32)
        mean = jnp.asarray(rng.normal(0, 1, 500), jnp.float32)
        scale = jnp.asarray(rng.uniform(0.1, 2, 500), jnp.float32)
        b1 = gaussian_bits(sym, mean, scale, q, quantized=True)
        b2 = gaussian_bits(sym * q, mean, scale, q, quantized=False)
        np.testing.assert_allclose(b1, b2, rtol=5e-3, atol=1e-2)

    def test_likelihood_floor(self):
        bits = gaussian_bits(jnp.array([1000.0]), 0.0, 0.01, 1.0)
        assert float(bits[0]) <= 16.0 + 1e-5  # floored at 2^-16


class TestBernoulliBits:
    def test_values(self):
        x = jnp.array([1.0, -1.0])
        b = bernoulli_bits(x, jnp.array([0.5, 0.5]))
        np.testing.assert_allclose(b, [1.0, 1.0], atol=1e-6)

    def test_binary_vxl_size(self):
        v = jnp.asarray(np.random.default_rng(0).integers(0, 2, 10000),
                        jnp.float32)
        p, bits, mb, n = binary_vxl_size(v)
        assert n == 10000
        assert 9800 < float(bits) < 10100  # ~1 bit/symbol at p=0.5


class TestEmbedder:
    def test_output_dim(self):
        fn, dim = positional_embedder(16, 1)
        assert dim == 33
        out = fn(jnp.ones((5, 1)))
        assert out.shape == (5, 33)

    def test_contents(self):
        fn, _ = positional_embedder(2, 1)
        x = jnp.array([[0.5]])
        out = np.asarray(fn(x))[0]
        np.testing.assert_allclose(
            out,
            [0.5, np.sin(0.5), np.cos(0.5), np.sin(1.0), np.cos(1.0)],
            atol=1e-6)
