"""Densify-threshold calibration (train/calibrate.py)."""

import numpy as np

import pytest

from gsvc_tpu.config import OptimizationConfig
from gsvc_tpu.train.calibrate import (
    calibrate_densify_threshold, candidate_fraction,
)

pytestmark = pytest.mark.slow


def _stats(n=4000, seed=0, interval=100):
    rng = np.random.default_rng(seed)
    denom = np.full((n, 1), interval, np.float32)
    denom[: n // 10] = 1.0  # some unqualified offsets
    grads = np.abs(rng.lognormal(-8.0, 1.0, (n, 1))).astype(np.float32)
    return {"offset_gradient_accum": grads * denom, "offset_denom": denom}


def test_calibrated_threshold_hits_target_fraction():
    opt = OptimizationConfig()
    stats = _stats()
    for target in (0.02, 0.05, 0.10):
        thr = calibrate_densify_threshold(stats, opt, target)
        frac = candidate_fraction(stats, opt, thr)
        assert abs(frac - target) < 0.01, (target, frac, thr)


def test_no_qualified_offsets_keeps_configured_value():
    opt = OptimizationConfig()
    stats = _stats()
    stats["offset_denom"][:] = 0.0
    thr = calibrate_densify_threshold(stats, opt, 0.05)
    assert thr == opt.densify_grad_threshold


def test_fit_autocalibration_fires():
    from gsvc_tpu.framecube import FrameCubeDataset
    from gsvc_tpu.train.fit import GOPFitter
    from tests.test_train import small_config, synthetic_video

    cfg = small_config(iterations=30)
    cfg.optimization.auto_densify_threshold = True
    # make offset qualification easy: the short test fit accumulates only
    # a handful of stat steps before the first densify event
    cfg.optimization.success_threshold = 0.01
    ds = FrameCubeDataset(images=synthetic_video(t=4))
    fitter = GOPFitter(cfg, ds, seed=0)
    thr0 = cfg.optimization.densify_grad_threshold
    fitter.fit(iterations=30, log_every=0)
    assert fitter._threshold_calibrated
    assert cfg.optimization.densify_grad_threshold != thr0
