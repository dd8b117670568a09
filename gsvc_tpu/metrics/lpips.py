"""LPIPS perceptual metric (VGG16 backbone) in JAX.

Parity target: the reference's vendored lpipsPyTorch/ + the ``lpips`` pip
package (utils/metric_utils.py:41).  Both require downloaded pretrained
weights; this zero-egress image has none, so the metric is *gated*: the
architecture and distance computation are complete, and weights load from
a user-supplied .npz via ``load_lpips_weights``.

Expected npz keys: ``features.{i}.weight`` / ``features.{i}.bias`` for
the VGG16 conv layers (torchvision layout, [out,in,kh,kw]) and
``lin{k}.weight`` [1, C, 1, 1] for the 5 LPIPS linear heads.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config (torchvision): conv indices and slice boundaries
_VGG_CONVS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_SLICES = [2, 4, 7, 10, 13]      # convs per LPIPS slice (cumulative idx)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


_PROXY_CHANNELS = (16, 16, 32, 32, 64, 64, 64, 128, 128, 128,
                   128, 128, 128)   # VGG16 widths / 4


def proxy_lpips_weights(seed: int = 0) -> Dict[str, jnp.ndarray]:
    """Deterministic reduced-width (VGG16/4) random-feature LPIPS weights.

    No pretrained VGG16 exists in this zero-egress image
    (scripts/export_lpips_weights.py documents the one-off export for a
    connected machine).  Random-feature VGG distances are a documented
    perceptual proxy — the LPIPS paper (Zhang et al., CVPR 2018, Tab. 5)
    shows even UNTRAINED networks under the same normalized-feature
    distance outperform pixel metrics on perceptual judgements.  He-init
    convs, uniform positive linear heads, a fixed PCG64 stream: the same
    seed reproduces bit-identical weights on any platform, so golden
    values can be pinned in CI and proxy numbers are comparable across
    runs.  NOT comparable to published (pretrained-VGG) LPIPS absolute
    values — artifacts must label it ``lpips_kind: proxy-vgg16w4``.
    """
    rng = np.random.default_rng(seed)
    out: Dict[str, jnp.ndarray] = {}
    in_ch = 3
    for ci, conv_idx in enumerate(_VGG_CONVS):
        oc = _PROXY_CHANNELS[ci]
        fan_in = in_ch * 9
        w = rng.normal(0.0, np.sqrt(2.0 / fan_in),
                       (oc, in_ch, 3, 3)).astype(np.float32)
        out[f"features.{conv_idx}.weight"] = jnp.asarray(w)
        out[f"features.{conv_idx}.bias"] = jnp.zeros((oc,), jnp.float32)
        in_ch = oc
    for k, upto in enumerate(_SLICES):
        c = _PROXY_CHANNELS[upto - 1]
        lin = rng.uniform(0.5, 1.5, (1, c, 1, 1)).astype(np.float32) / c
        out[f"lin{k}.weight"] = jnp.asarray(lin)
    return out


def load_lpips_weights(path: str) -> Dict[str, jnp.ndarray]:
    """Load an exported npz, or the deterministic proxy for the sentinel
    path ``"proxy"`` (see proxy_lpips_weights)."""
    if path == "proxy":
        return proxy_lpips_weights()
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def _conv(x, w, b):
    # torch layout [out, in, kh, kw] -> HWIO
    kernel = jnp.transpose(w, (2, 3, 1, 0))
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b[None, None, None, :]


def _vgg_slices(weights, x):
    feats = []
    ci = 0
    for s, upto in enumerate(_SLICES):
        while ci < upto:
            conv_idx = _VGG_CONVS[ci]
            x = _conv(x, weights[f"features.{conv_idx}.weight"],
                      weights[f"features.{conv_idx}.bias"])
            x = jax.nn.relu(x)
            ci += 1
        feats.append(x)
        if s < len(_SLICES) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
    return feats


def lpips(weights: Optional[Dict], img1, img2) -> jnp.ndarray:
    """LPIPS distance between [H,W,3] images in [0,1].

    Raises if ``weights`` is None (no pretrained weights shipped in this
    image — supply an npz via load_lpips_weights)."""
    if weights is None:
        raise RuntimeError(
            "LPIPS needs pretrained VGG16+linear weights; none are "
            "available in this environment. Export them once with "
            "scripts from the lpips project and pass the npz path.")
    def prep(im):
        im = im[None] * 2.0 - 1.0
        return (im - _SHIFT) / _SCALE

    f1 = _vgg_slices(weights, prep(img1))
    f2 = _vgg_slices(weights, prep(img2))
    total = 0.0
    for k, (a, b) in enumerate(zip(f1, f2)):
        a = a / jnp.linalg.norm(a, axis=-1, keepdims=True).clip(1e-10)
        b = b / jnp.linalg.norm(b, axis=-1, keepdims=True).clip(1e-10)
        d = (a - b) ** 2
        lin = weights[f"lin{k}.weight"][0, :, 0, 0]
        total = total + jnp.mean(jnp.sum(d * lin[None, None, None, :],
                                         axis=-1))
    return total
