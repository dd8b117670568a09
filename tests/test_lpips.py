"""LPIPS structure tests with synthetic weights.

Real pretrained weights cannot be produced in this zero-egress image
(scripts/export_lpips_weights.py documents the one-off export); these
tests pin everything that does not depend on the weight VALUES: the VGG16
topology, the conv orientation (cross-correlation, SAME padding, NHWC),
metric properties (zero at identity, symmetry, positivity), and the
evaluate_video wiring.
"""

import numpy as np
import pytest
from scipy.signal import correlate

from gsvc_tpu.metrics.lpips import _SLICES, _VGG_CONVS, _conv, lpips

# VGG16 conv channel plan (torchvision features indices -> out channels)
_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
_SLICE_OUT = [64, 128, 256, 512, 512]


def synth_weights(seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    w = {}
    cin = 3
    for conv_idx, cout in zip(_VGG_CONVS, _CHANNELS):
        w[f"features.{conv_idx}.weight"] = (
            rng.standard_normal((cout, cin, 3, 3)) * scale
        ).astype(np.float32)
        w[f"features.{conv_idx}.bias"] = np.zeros(cout, np.float32)
        cin = cout
    for k, c in enumerate(_SLICE_OUT):
        w[f"lin{k}.weight"] = np.abs(
            rng.standard_normal((1, c, 1, 1)) * 0.1).astype(np.float32)
    return w


def _imgs(seed=1, h=64, w=64):
    rng = np.random.default_rng(seed)
    a = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    return a, b


def test_conv_matches_scipy_cross_correlation():
    """Torch conv2d semantics = cross-correlation with SAME zero pad."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8, 9, 3)).astype(np.float32)
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    got = np.asarray(_conv(x, w, b))[0]
    want = np.zeros((8, 9, 4), np.float32)
    xp = np.pad(x[0], ((1, 1), (1, 1), (0, 0)))
    for o in range(4):
        acc = np.zeros((8, 9))
        for i in range(3):
            acc += correlate(xp[:, :, i], w[o, i], mode="valid")
        want[:, :, o] = acc + b[o]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lpips_metric_properties():
    w = synth_weights()
    a, b = _imgs()
    d_aa = float(lpips(w, a, a))
    d_ab = float(lpips(w, a, b))
    d_ba = float(lpips(w, b, a))
    assert abs(d_aa) < 1e-6, "identity distance must be 0"
    assert d_ab > 1e-5, "distinct images must have positive distance"
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)
    # stronger corruption -> larger distance
    c = np.clip(a + 0.4 * np.random.default_rng(9).standard_normal(a.shape),
                0, 1).astype(np.float32)
    assert float(lpips(w, a, c)) > d_ab


def test_lpips_requires_weights():
    a, b = _imgs()
    with pytest.raises(RuntimeError):
        lpips(None, a, b)


def test_evaluate_video_reports_lpips():
    from gsvc_tpu.models.gaussians import GenerateMode
    from gsvc_tpu.render.pipeline import make_raster_settings
    from gsvc_tpu.report import evaluate_video
    from tests.test_model import make_state

    cfg, state = make_state(n=64, capacity=64, seed=2)
    settings = make_raster_settings(cfg, 32, 32, tile_h=8, tile_w=16,
                                    gaussian_cap=64, chunk=16)
    gt = np.random.default_rng(0).uniform(
        0, 1, (2, 32, 32, 3)).astype(np.float32)
    res = evaluate_video(
        state, cfg, settings, 32, np.array([0.0, 0.01]), -0.5, -0.5, 30.0,
        gt_images=gt, compute_msssim=False, lpips_weights=synth_weights())
    assert "lpips" in res and np.isfinite(res["lpips"])


def test_proxy_weights_deterministic_and_golden():
    """The committed proxy metric: bit-identical weights per seed and a
    pinned golden distance value (round-2 verdict item 5 fallback — a
    deterministic reduced-channel VGG with pinned activations)."""
    from gsvc_tpu.metrics.lpips import load_lpips_weights, proxy_lpips_weights

    w1 = proxy_lpips_weights()
    w2 = load_lpips_weights("proxy")
    for k in w1:
        np.testing.assert_array_equal(np.asarray(w1[k]), np.asarray(w2[k]))
    # pinned golden: structured image pair, fixed transform
    h = w = 32
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    a = np.stack([np.sin(xx / 5.0), np.cos(yy / 7.0),
                  np.sin((xx + yy) / 9.0)], -1).astype(np.float32) * 0.5 + 0.5
    b = np.roll(a, 3, axis=1) * 0.9
    d_ab = float(lpips(w1, a, b))
    d_aa = float(lpips(w1, a, a))
    assert d_aa < 1e-6
    assert d_ab > 1e-4
    # golden pin (CPU f32, seed 0) recorded at commit time; 1e-3 rel
    # headroom for XLA version drift
    golden = 0.013052504509687424
    assert abs(d_ab - golden) / golden < 1e-3, d_ab
