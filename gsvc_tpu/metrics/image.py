"""Image quality metrics in JAX (channel-last [H, W, C] or [N, H, W, C]).

PSNR matches utils/metric_utils.py:11-14; SSIM matches the 11x11
gaussian-window implementation in utils/loss_utils.py:28-72; MS-SSIM is
the standard 5-scale variant (pytorch_msssim defaults used by
utils/metric_utils.py:32-35).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(img1, img2, data_range: float = 1.0):
    err = jnp.mean((img1 - img2) ** 2)
    return 10.0 * jnp.log10((data_range ** 2) / err)


@functools.lru_cache(maxsize=4)
def _gaussian_window(window_size: int, sigma: float):
    # NumPy on purpose: caching a jnp constant would leak tracers between
    # jit traces (converted at the use site instead)
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _ensure_nhwc(img):
    if img.ndim == 3:
        return img[None], True
    return img, False


def _depthwise_blur(img, window):
    """Depthwise 2D conv, SAME padding, per channel."""
    c = img.shape[-1]
    kernel = jnp.tile(jnp.asarray(window)[:, :, None, None],
                      (1, 1, 1, c))  # [kh, kw, 1, C]
    return jax.lax.conv_general_dilated(
        img, kernel,
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _ssim_map(img1, img2, window_size=11, sigma=1.5, c1=0.01 ** 2, c2=0.03 ** 2):
    w = _gaussian_window(window_size, sigma)
    mu1 = _depthwise_blur(img1, w)
    mu2 = _depthwise_blur(img2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _depthwise_blur(img1 * img1, w) - mu1_sq
    s2 = _depthwise_blur(img2 * img2, w) - mu2_sq
    s12 = _depthwise_blur(img1 * img2, w) - mu1_mu2
    luminance = (2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)
    contrast = (2 * s12 + c2) / (s1 + s2 + c2)
    return luminance * contrast, contrast


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    img1, _ = _ensure_nhwc(img1)
    img2, _ = _ensure_nhwc(img2)
    ssim_map, _ = _ssim_map(img1, img2, window_size, sigma)
    return jnp.mean(ssim_map)


def _avg_pool2(img):
    return jax.lax.reduce_window(
        img, 0.0, jax.lax.add,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding="VALID") / 4.0


def ms_ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """5-scale MS-SSIM; inputs should be at least 160px in each dimension."""
    img1, _ = _ensure_nhwc(img1)
    img2, _ = _ensure_nhwc(img2)
    levels = len(_MS_WEIGHTS)
    mcs = []
    for i in range(levels):
        ssim_map, cs_map = _ssim_map(img1, img2, window_size, sigma)
        if i < levels - 1:
            mcs.append(jnp.maximum(jnp.mean(cs_map), 0.0))
            img1 = _avg_pool2(img1)
            img2 = _avg_pool2(img2)
        else:
            final_ssim = jnp.maximum(jnp.mean(ssim_map), 0.0)
    result = final_ssim ** _MS_WEIGHTS[-1]
    for w, cs in zip(_MS_WEIGHTS[:-1], mcs):
        result = result * cs ** w
    return result
