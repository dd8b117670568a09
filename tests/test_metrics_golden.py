"""Golden-value tests for SSIM / MS-SSIM.

SSIM is 20% of the training loss (lambda_dssim) and both metrics are
reported on every eval; a silent deviation would skew every fit and every
number.  These tests pin the semantics two ways:

  1. an INDEPENDENT NumPy/scipy oracle implementing, op for op,
     - the reference's training SSIM (utils/loss_utils.py:28-73: 11x11
       sigma-1.5 gaussian window as a full 2D conv, SAME zero padding),
     - pytorch_msssim's ms_ssim (the library the reference reports with,
       utils/metric_utils.py:6: VALID-padding filtering, relu-clamped
       per-level cs, odd-padded count-include-pad 2x2 average pooling);
  2. hard-coded golden values from that oracle on a fixed input, so the
     oracle and the JAX implementation cannot drift together.
"""

import numpy as np
from scipy.signal import convolve2d

from gsvc_tpu.metrics.image import ms_ssim, psnr, ssim

_MS_WEIGHTS = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])


def _window(size=11, sigma=1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g)


def _conv_per_channel(img, win, mode):
    return np.stack([
        convolve2d(img[c], win[::-1, ::-1], mode=mode, boundary="fill")
        for c in range(img.shape[0])])


def oracle_ssim(img1, img2, mode="same"):
    """Reference training SSIM (loss_utils.py) when mode='same'."""
    win = _window()
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu1 = _conv_per_channel(img1, win, mode)
    mu2 = _conv_per_channel(img2, win, mode)
    s1 = _conv_per_channel(img1 * img1, win, mode) - mu1 ** 2
    s2 = _conv_per_channel(img2 * img2, win, mode) - mu2 ** 2
    s12 = _conv_per_channel(img1 * img2, win, mode) - mu1 * mu2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    ssim_map = (2 * mu1 * mu2 + c1) / (mu1 ** 2 + mu2 ** 2 + c1) * cs
    return ssim_map.mean(), cs.mean()


def _oracle_pool(img):
    ph, pw = img.shape[1] % 2, img.shape[2] % 2
    x = np.pad(img, ((0, 0), (ph, ph), (pw, pw)))
    h2, w2 = x.shape[1] // 2, x.shape[2] // 2
    x = x[:, :h2 * 2, :w2 * 2].reshape(img.shape[0], h2, 2, w2, 2)
    return x.mean(axis=(2, 4))


def oracle_msssim(img1, img2):
    """pytorch_msssim ms_ssim, data_range=1, default K/weights."""
    vals = []
    for i in range(5):
        s, cs = oracle_ssim(img1, img2, mode="valid")
        if i < 4:
            vals.append(max(cs, 0.0))
            img1, img2 = _oracle_pool(img1), _oracle_pool(img2)
        else:
            vals.append(max(s, 0.0))
    return float(np.prod(np.array(vals) ** _MS_WEIGHTS))


def _test_pair(h=192, w=256, seed=0):
    """Smooth structured images, deterministic."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(h) / h, np.arange(w) / w, indexing="ij")
    img1 = np.stack([
        0.5 + 0.4 * np.sin(7 * xx + 3 * yy + p) * np.cos(5 * yy - p)
        for p in (0.0, 1.1, 2.3)]).astype(np.float32)
    noise = 0.05 * rng.standard_normal((3, h, w)).astype(np.float32)
    blur = 0.02 * np.roll(img1, 2, axis=2) - 0.02 * img1
    img2 = np.clip(img1 + noise + blur, 0, 1).astype(np.float32)
    img1 = np.clip(img1, 0, 1).astype(np.float32)
    return img1, img2


def test_ssim_matches_oracle():
    img1, img2 = _test_pair()
    got = float(ssim(img1, img2))
    want, _ = oracle_ssim(img1.astype(np.float64), img2.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_msssim_matches_oracle():
    img1, img2 = _test_pair()
    got = float(ms_ssim(img1, img2))
    want = oracle_msssim(img1.astype(np.float64), img2.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_golden_values():
    """Values computed once with the scipy oracle (float64) on the fixed
    test pair; pins today's agreed semantics against joint drift."""
    img1, img2 = _test_pair()
    s, _ = oracle_ssim(img1.astype(np.float64), img2.astype(np.float64))
    m = oracle_msssim(img1.astype(np.float64), img2.astype(np.float64))
    # GOLDEN (do not regenerate casually):
    np.testing.assert_allclose(s, GOLDEN_SSIM, atol=1e-9)
    np.testing.assert_allclose(m, GOLDEN_MSSSIM, atol=1e-9)


def test_identity_and_psnr():
    img1, _ = _test_pair()
    assert float(ssim(img1, img1)) > 0.9999
    assert float(ms_ssim(img1, img1)) > 0.9999
    np.testing.assert_allclose(float(psnr(img1, img1 + 0.01)), 40.0,
                               atol=0.05)


GOLDEN_SSIM = 0.37820330978822125
GOLDEN_MSSSIM = 0.8719789959313423
