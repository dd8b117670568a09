"""Image quality metrics in JAX — channel-FIRST layout ([C, H, W] or
[N, C, H, W]); W rides the TPU lane dimension (a channels-last [H, W, 3]
layout pads lanes 42x).

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
def _gaussian_1d(window_size: int, sigma: float):
    # NumPy on purpose: caching a jnp constant would leak tracers between
    # jit traces (converted at the use site instead)
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _ensure_nchw(img):
    return img[None] if img.ndim == 3 else img


def _blur1d(x, g, axis):
    """Separable 1D gaussian blur via shift-and-add (SAME, zero pad) —
    pure [*, W]-shaped VPU ops; an XLA depthwise conv with 3 channels on
    the lane dim runs orders of magnitude slower on TPU."""
    k = g.shape[0]
    half = k // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (half, half)
    xp = jnp.pad(x, pad)
    n = x.shape[axis]
    out = None
    for i in range(k):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + n)
        term = float(g[i]) * xp[tuple(sl)]
        out = term if out is None else out + term
    return out


def _depthwise_blur(img, window_size: int, sigma: float):
    """img: [N, C, H, W] -> gaussian-blurred, SAME zero padding."""
    g = _gaussian_1d(window_size, sigma)
    return _blur1d(_blur1d(img, g, axis=3), g, axis=2)


def _ssim_map(img1, img2, window_size=11, sigma=1.5, c1=0.01 ** 2,
              c2=0.03 ** 2):
    mu1 = _depthwise_blur(img1, window_size, sigma)
    mu2 = _depthwise_blur(img2, window_size, sigma)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _depthwise_blur(img1 * img1, window_size, sigma) - mu1_sq
    s2 = _depthwise_blur(img2 * img2, window_size, sigma) - mu2_sq
    s12 = _depthwise_blur(img1 * img2, window_size, sigma) - mu1_mu2
    luminance = (2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)
    contrast = (2 * s12 + c2) / (s1 + s2 + c2)
    return luminance * contrast, contrast


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    img1 = _ensure_nchw(img1)
    img2 = _ensure_nchw(img2)
    ssim_map, _ = _ssim_map(img1, img2, window_size, sigma)
    return jnp.mean(ssim_map)


def _blur1d_valid(x, g, axis):
    """Separable 1D gaussian blur, VALID (no padding): output length
    n - k + 1 along ``axis`` — shift-and-add like _blur1d."""
    k = g.shape[0]
    n = x.shape[axis] - k + 1
    out = None
    for i in range(k):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + n)
        term = float(g[i]) * x[tuple(sl)]
        out = term if out is None else out + term
    return out


def _ssim_map_valid(img1, img2, window_size=11, sigma=1.5, c1=0.01 ** 2,
                    c2=0.03 ** 2):
    g = _gaussian_1d(window_size, sigma)

    def blur(x):
        return _blur1d_valid(_blur1d_valid(x, g, axis=3), g, axis=2)

    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blur(img1 * img1) - mu1_sq
    s2 = blur(img2 * img2) - mu2_sq
    s12 = blur(img1 * img2) - mu1_mu2
    cs_map = (2 * s12 + c2) / (s1 + s2 + c2)
    ssim_map = (2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1) * cs_map
    return ssim_map, cs_map


def _avg_pool2_padded(img):
    """2x2/stride-2 average pool with odd-side zero padding that COUNTS
    the pad in the divisor — the exact pytorch_msssim downsampling
    (F.avg_pool2d(kernel_size=2, padding=s%2, count_include_pad=True))."""
    ph, pw = img.shape[2] % 2, img.shape[3] % 2
    x = jnp.pad(img, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    h2 = x.shape[2] // 2
    w2 = x.shape[3] // 2
    x = x[:, :, :h2 * 2, :w2 * 2]
    x = x.reshape(img.shape[0], img.shape[1], h2, 2, w2, 2)
    return jnp.mean(x, axis=(3, 5))


def ms_ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """5-scale MS-SSIM, algorithm-exact to pytorch_msssim (the library the
    reference reports with, utils/metric_utils.py:6): VALID-padding
    gaussian filtering, relu-clamped per-level cs, odd-padded 2x2 average
    pooling between levels.  Inputs >= 176 px per dimension."""
    img1 = _ensure_nchw(img1)
    img2 = _ensure_nchw(img2)
    levels = len(_MS_WEIGHTS)
    mcs = []
    for i in range(levels):
        ssim_map, cs_map = _ssim_map_valid(img1, img2, window_size, sigma)
        if i < levels - 1:
            mcs.append(jnp.maximum(jnp.mean(cs_map), 0.0))
            img1 = _avg_pool2_padded(img1)
            img2 = _avg_pool2_padded(img2)
        else:
            final_ssim = jnp.maximum(jnp.mean(ssim_map), 0.0)
    result = final_ssim ** _MS_WEIGHTS[-1]
    for w, cs in zip(_MS_WEIGHTS[:-1], mcs):
        result = result * cs ** w
    return result
