"""Deterministic host entropy context (codec/detctx.py) vs the jitted
f32 device path: same semantics, f64 vs f32 rounding apart.

The host path replaces the device path inside the codec, so this parity
test is what ties the coded streams back to the rate model the entropy
nets were TRAINED against (models/gaussians.py:calc_entropy_context).
A tiny fraction of anchors may land on a different interpolation corner
(f32 vs f64 floor at a cell boundary) — those legitimately differ, so
the assertion is quantile-based, not elementwise-max.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gsvc_tpu.codec.detctx import det_entropy_context
from gsvc_tpu.models.gaussians import calc_entropy_context
from gsvc_tpu.ops import ste_binary
from tests.test_bitstream import _randomize_state
from tests.test_model import make_state


def test_matches_device_context():
    cfg, state = make_state(n=300, capacity=384, seed=11)
    state = _randomize_state(state, seed=12)

    n = int(state.n_active)
    anchors = np.asarray(state.anchors.anchor)[:n]

    dev = jax.device_get(calc_entropy_context(
        state, cfg, jnp.asarray(anchors), decoded=False))
    host = det_entropy_context(state, cfg, anchors)

    for name in dev._fields:
        d = np.asarray(getattr(dev, name), np.float64)
        h = np.asarray(getattr(host, name), np.float64)
        rel = np.abs(d - h) / (np.abs(d) + 1e-3)
        assert np.quantile(rel, 0.999) < 1e-3, (
            f"{name}: p99.9 rel diff {np.quantile(rel, 0.999):.2e}")
        assert np.median(rel) < 1e-5, (
            f"{name}: median rel diff {np.median(rel):.2e}")


def test_sign_convention_matches_ste_binary():
    # detctx binarizes the hash table with sign(0) -> +1; must agree
    # with ops.ste_binary for every representable input class
    x = jnp.asarray([-2.0, -1e-30, -0.0, 0.0, 1e-30, 3.0], jnp.float32)
    dev = np.asarray(ste_binary(x))
    t = np.sign(np.asarray(x, np.float64))
    host = np.where(t == 0.0, 1.0, t)
    np.testing.assert_array_equal(dev, host)


def test_host_context_is_reproducible():
    # two independent evaluations must be bit-identical (no hidden
    # nondeterminism: threading, BLAS, iteration order)
    cfg, state = make_state(n=128, capacity=128, seed=13)
    state = _randomize_state(state, seed=14)
    anchors = np.asarray(state.anchors.anchor)[:100]
    a = det_entropy_context(state, cfg, anchors)
    b = det_entropy_context(state, cfg, anchors)
    for name in a._fields:
        np.testing.assert_array_equal(np.asarray(getattr(a, name)),
                                      np.asarray(getattr(b, name)))
