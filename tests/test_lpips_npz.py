"""Pretrained-LPIPS ingestion path (VERDICT r4 item 7).

No pretrained VGG16 exists in this zero-egress image, so these tests
exercise the exact npz schema scripts/export_lpips_weights.py produces —
full torchvision-VGG16 shapes, randomly initialized — proving that real
exported weights are a drop-in: load_lpips_weights -> lpips() yields
finite, deterministic, metric-like values at published-LPIPS layer
widths (reference: /root/reference/utils/metric_utils.py:41,
/root/reference/lpipsPyTorch/).
"""

import numpy as np
import pytest

from gsvc_tpu.metrics.lpips import (
    _SLICES, _VGG_CONVS, load_lpips_weights, lpips,
)

# torchvision VGG16 conv widths (the real export's shapes)
_VGG16_CHANNELS = (64, 64, 128, 128, 256, 256, 256,
                   512, 512, 512, 512, 512, 512)


def _make_npz(path, seed=0):
    """npz with the exporter's exact key/shape schema at full VGG width."""
    rng = np.random.default_rng(seed)
    out = {}
    in_ch = 3
    for ci, conv_idx in enumerate(_VGG_CONVS):
        oc = _VGG16_CHANNELS[ci]
        out[f"features.{conv_idx}.weight"] = rng.normal(
            0, np.sqrt(2.0 / (in_ch * 9)), (oc, in_ch, 3, 3)
        ).astype(np.float32)
        out[f"features.{conv_idx}.bias"] = np.zeros(oc, np.float32)
        in_ch = oc
    for k, upto in enumerate(_SLICES):
        c = _VGG16_CHANNELS[upto - 1]
        out[f"lin{k}.weight"] = (
            rng.uniform(0.5, 1.5, (1, c, 1, 1)).astype(np.float32) / c)
    np.savez(path, **out)
    return out


@pytest.fixture(scope="module")
def npz_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("lpips") / "lpips_vgg.npz"
    _make_npz(path)
    return str(path)


def test_npz_loads_with_exporter_schema(npz_path):
    w = load_lpips_weights(npz_path)
    assert set(w) == {f"features.{i}.{p}" for i in _VGG_CONVS
                      for p in ("weight", "bias")} | {
                          f"lin{k}.weight" for k in range(5)}
    assert w["features.0.weight"].shape == (64, 3, 3, 3)
    assert w["lin4.weight"].shape == (1, 512, 1, 1)


def test_full_width_lpips_finite_and_metric_like(npz_path):
    w = load_lpips_weights(npz_path)
    rng = np.random.default_rng(3)
    a = rng.random((64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    c = rng.random((64, 64, 3)).astype(np.float32)

    d_self = float(lpips(w, a, a))
    d_near = float(lpips(w, a, b))
    d_far = float(lpips(w, a, c))
    assert np.isfinite([d_self, d_near, d_far]).all()
    assert d_self == pytest.approx(0.0, abs=1e-6)
    assert 0.0 < d_near < d_far


def test_npz_path_deterministic(npz_path, tmp_path):
    w1 = load_lpips_weights(npz_path)
    path2 = tmp_path / "again.npz"
    _make_npz(path2)
    w2 = load_lpips_weights(str(path2))
    a = np.linspace(0, 1, 48 * 48 * 3).reshape(48, 48, 3).astype(np.float32)
    b = a[::-1].copy()
    assert float(lpips(w1, a, b)) == float(lpips(w2, a, b))
