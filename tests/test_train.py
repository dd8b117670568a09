"""End-to-end training slice: a tiny synthetic GOP must fit.

The reference has no tests; its QA is "the fit reaches sane PSNR"
(SURVEY.md §4).  We make that check explicit and small.
"""

import numpy as np
import pytest

from gsvc_tpu.config import Config, ModelConfig, OptimizationConfig, PipelineConfig
from gsvc_tpu.framecube import FrameCubeDataset
from gsvc_tpu.train.fit import GOPFitter


def synthetic_video(t=6, h=24, w=32, seed=0):
    """Moving smooth blobs — compressible, non-trivial."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    frames = np.zeros((t, h, w, 3), np.float32)
    n_blobs = 3
    cx = rng.uniform(0, w, n_blobs)
    cy = rng.uniform(0, h, n_blobs)
    vel = rng.uniform(-1, 1, (n_blobs, 2))
    col = rng.uniform(0.3, 1.0, (n_blobs, 3))
    for ti in range(t):
        img = np.zeros((h, w, 3), np.float32)
        for b in range(n_blobs):
            bx = cx[b] + vel[b, 0] * ti
            by = cy[b] + vel[b, 1] * ti
            g = np.exp(-(((xx - bx) / 6.0) ** 2 + ((yy - by) / 5.0) ** 2))
            img += g[..., None] * col[b]
        frames[ti] = np.clip(img, 0, 1)
    return frames


def small_config(iterations=60):
    return Config(
        model=ModelConfig(
            anchor_feature_dim=8, n_offsets=4, threshold=0.3,
            time_multi_res=4, offset_multi_res=4,
            log2=6, log2_2D=7, grid_feature_dim=2,
            resolutions_list=(6, 10), resolutions_list_2D=(12, 20)),
        pipeline=PipelineConfig(tile_h=8, tile_w=16, visible_capacity=256,
                                gaussian_chunk=32),
        optimization=OptimizationConfig(
            iterations=iterations, init_anchor_num=300,
            optical_lambda=0.0,
            start_stat=10, update_from=20, update_interval=25,
            update_until=iterations,
            full_precision_training_total=iterations,
            quantized_training_total=0,
            entropy_constrained_train_total=0,
            ste_entropy_constrained_train_total=0),
    )


@pytest.fixture(scope="module")
def fitted():
    frames = synthetic_video()
    ds = FrameCubeDataset(images=frames)
    cfg = small_config(iterations=80)
    fitter = GOPFitter(cfg, ds, seed=0)
    psnr0 = fitter.evaluate(frames=[2])["psnr"]
    report = fitter.fit(log_every=0)
    return fitter, psnr0, report


class TestFitting:
    def test_psnr_improves(self, fitted):
        fitter, psnr0, report = fitted
        psnr1 = fitter.evaluate(frames=[2])["psnr"]
        assert psnr1 > psnr0 + 3.0, (psnr0, psnr1)
        assert psnr1 > 20.0

    def test_densification_ran(self, fitted):
        fitter, _, report = fitted
        # grow/prune happened at least once and invariants held
        z = np.asarray(fitter.state.anchors.anchor[:, 2])
        n = int(fitter.state.n_active)
        assert n > 0
        assert np.all(np.diff(z[:n]) >= 0)
        assert np.all(z[n:] > 1e8)

    def test_checkpoint_shapes_consistent(self, fitted):
        fitter, _, _ = fitted
        k = fitter.gcfg.n_offsets
        cap = fitter.capacity
        assert fitter.state.anchors.feat.shape[0] == cap
        assert fitter.stats.offset_denom.shape[0] == cap * k


@pytest.mark.slow
def test_window_cap_shrinks_after_heavy_prune():
    """Round-2 verdict item 8: after heavy pruning the padded TSW window
    must shrink back (not just grow) and the step must re-jit to the
    smaller shape — a high-water window otherwise pays generation +
    gather cost for dead rows forever (train/fit.py:_maybe_resize_window)."""
    import jax.numpy as jnp

    from gsvc_tpu.train.trainer import TrainStats

    frames = synthetic_video(t=6)
    ds = FrameCubeDataset(images=frames)
    cfg = small_config(iterations=10)
    cfg.optimization.init_anchor_num = 1000
    fitter = GOPFitter(cfg, ds, seed=0)
    old_window = fitter.window_cap
    # precondition: window above the 512 shrink quantum so a halving is
    # observable
    assert old_window >= 1024, old_window

    n = int(fitter.state.n_active)
    k = fitter.gcfg.n_offsets
    cap = fitter.capacity
    # craft stats so adjust_anchors prunes ~90% (opacity_accum below
    # min_opacity * demon with enough observations) and grows nothing
    demon = np.full((cap, 1), 100.0, np.float32)
    opa = np.zeros((cap, 1), np.float32)
    opa[: n // 10] = 100.0
    fitter.stats = TrainStats(
        opacity_accum=jnp.asarray(opa),
        anchor_demon=jnp.asarray(demon),
        offset_gradient_accum=jnp.zeros((cap * k, 1)),
        offset_denom=jnp.ones((cap * k, 1)),
    )
    old_step = fitter.train_step
    res = fitter._densify()
    assert res.n_pruned >= int(0.8 * n), res
    assert fitter.window_cap <= old_window // 2, \
        (old_window, fitter.window_cap)
    assert fitter.train_step is not old_step  # re-jit to the smaller shape
    # the shrunken step still compiles and runs
    report = fitter.fit(iterations=1, log_every=0)
    assert np.isfinite(report.loss)


@pytest.mark.slow
def test_entropy_phase_smoke():
    """Three iterations in ENTROPY mode: rate terms finite, loss finite."""
    frames = synthetic_video(t=4)
    ds = FrameCubeDataset(images=frames)
    cfg = small_config(iterations=3)
    cfg.optimization.full_precision_training_total = 0
    cfg.optimization.quantized_training_total = 0
    cfg.optimization.entropy_constrained_train_total = 3
    cfg.optimization.update_from = 10**9  # no densify
    cfg.optimization.start_stat = 10**9
    fitter = GOPFitter(cfg, ds, seed=0)
    report = fitter.fit(log_every=0)
    assert np.isfinite(report.loss)
    assert report.bit_per_param > 0
