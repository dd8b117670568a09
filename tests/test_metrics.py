"""Metric tests: PSNR/SSIM/MS-SSIM sanity and known values."""

import jax.numpy as jnp
import numpy as np

from gsvc_tpu.metrics import psnr, ssim, ms_ssim, l1_loss, ssim_loss


def test_psnr_known_value():
    a = jnp.zeros((3, 8, 8))
    b = jnp.full((3, 8, 8), 0.1)
    assert abs(float(psnr(a, b)) - 20.0) < 1e-3


def test_ssim_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)), jnp.float32)
    assert float(ssim(img, img)) > 0.9999


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (3, 64, 64)), jnp.float32)
    noisy = img + 0.2 * jnp.asarray(rng.normal(size=(3, 64, 64)), jnp.float32)
    s_clean = float(ssim(img, img))
    s_noisy = float(ssim(img, noisy))
    assert s_noisy < s_clean
    assert 0.0 < s_noisy < 0.9


def test_ms_ssim_range():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (3, 192, 192)), jnp.float32)
    noisy = jnp.clip(
        img + 0.05 * jnp.asarray(rng.normal(size=(3, 192, 192)), jnp.float32),
        0, 1)
    v = float(ms_ssim(img, noisy))
    assert 0.5 < v < 1.0
    assert float(ms_ssim(img, img)) > 0.999


def test_losses():
    a = jnp.zeros((3, 16, 16))
    b = jnp.full((3, 16, 16), 0.5)
    assert abs(float(l1_loss(a, b)) - 0.5) < 1e-6
    assert float(ssim_loss(a, a)) < 1e-4
