"""Training losses (reference: utils/loss_utils.py:20-72)."""

from __future__ import annotations

import jax.numpy as jnp

from gsvc_tpu.metrics.image import ssim


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def ssim_loss(pred, target):
    """1 - SSIM."""
    return 1.0 - ssim(pred, target)
