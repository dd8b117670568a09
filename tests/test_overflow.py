"""Overflow reaction: undersized raster capacities must grow, not drop
gaussians silently (splat.py:_bin_gaussians diagnoses; fit.py reacts)."""

import numpy as np

from gsvc_tpu.config import (
    Config, ModelConfig, OptimizationConfig, PipelineConfig,
)
from gsvc_tpu.framecube import FrameCubeDataset
from gsvc_tpu.train.fit import GOPFitter
from tests.test_train import synthetic_video
import pytest


@pytest.mark.slow
def test_fit_grows_capacity_on_overflow():
    cfg = Config(
        model=ModelConfig(
            anchor_feature_dim=8, n_offsets=4, threshold=0.3,
            time_multi_res=4, offset_multi_res=4,
            log2=6, log2_2D=7, grid_feature_dim=2,
            resolutions_list=(6, 10), resolutions_list_2D=(12, 20)),
        # deliberately tiny per-tile capacity: 300 anchors x 4 offsets on a
        # 24x32 frame guarantees > 8 binned gaussians per tile
        pipeline=PipelineConfig(tile_h=8, tile_w=16, visible_capacity=8,
                                gaussian_chunk=8),
        optimization=OptimizationConfig(
            iterations=6, init_anchor_num=300, optical_lambda=0.0,
            start_stat=100, update_from=200, update_interval=100,
            update_until=6,
            full_precision_training_total=6,
            quantized_training_total=0,
            entropy_constrained_train_total=0,
            ste_entropy_constrained_train_total=0),
    )
    ds = FrameCubeDataset(images=synthetic_video(t=4, h=24, w=32))
    fitter = GOPFitter(cfg, ds, seed=0)
    cap0 = fitter.settings.gaussian_cap
    assert cap0 == 8
    fitter.fit(iterations=6, log_every=1)
    assert fitter.settings.gaussian_cap > cap0, \
        "persistent overflow must trigger capacity growth"


def test_no_reaction_without_overflow():
    from tests.test_train import small_config

    cfg = small_config(iterations=4)
    ds = FrameCubeDataset(images=synthetic_video(t=4))
    fitter = GOPFitter(cfg, ds, seed=0)
    cap0 = fitter.settings.gaussian_cap
    fitter.fit(iterations=4, log_every=1)
    assert fitter.settings.gaussian_cap == cap0


def test_cap_shrinks_when_tiles_underfilled():
    from tests.test_train import small_config

    cfg = small_config(iterations=4)
    cfg.pipeline.visible_capacity = 64
    ds = FrameCubeDataset(images=synthetic_video(t=4))
    fitter = GOPFitter(cfg, ds, seed=0)
    import dataclasses
    fitter.settings = dataclasses.replace(fitter.settings, gaussian_cap=256)
    fitter._build_step()
    # five consecutive near-empty logs trigger the shrink
    for i in range(5):
        acted = fitter._react_to_overflow(0, it=i, num_rendered=100)
    assert acted
    assert fitter.settings.gaussian_cap == 128

    # healthy fill does NOT shrink
    fitter2 = GOPFitter(cfg, ds, seed=0)
    fitter2.settings = dataclasses.replace(fitter2.settings,
                                           gaussian_cap=256)
    cap0 = fitter2.settings.gaussian_cap
    for i in range(6):
        fitter2._react_to_overflow(
            0, it=i, num_rendered=200 * fitter2.settings.n_tiles * 4)
    assert fitter2.settings.gaussian_cap == cap0


def test_tile_harmful_overflow_metric():
    """Drops at saturated tiles (final T ~ 0) are harmless; drops at
    tiles with visible transmittance count fully."""
    import jax.numpy as jnp

    from gsvc_tpu.render.splat import RasterSettings, tile_harmful_overflow

    s = RasterSettings(image_height=16, image_width=32, threshold=0.15,
                       tile_h=8, tile_w=16, gaussian_cap=8, chunk=8,
                       tiles_per_gaussian=4)
    assert s.n_tiles == 4
    t_map = jnp.zeros((16, 32), jnp.float32)
    # tile 1 (row 0, col 1) unsaturated at one pixel; tile 3 saturated
    t_map = t_map.at[3, 20].set(0.5)
    dropped = jnp.asarray([0, 7, 0, 9], jnp.int32)
    harmful = int(tile_harmful_overflow(s, t_map, dropped))
    assert harmful == 7  # tile 3's 9 drops are behind saturated pixels

    # non-tile-aligned image: padding pixels must count as saturated
    s2 = RasterSettings(image_height=13, image_width=30, threshold=0.15,
                        tile_h=8, tile_w=16, gaussian_cap=8, chunk=8,
                        tiles_per_gaussian=4)
    t2 = jnp.ones((13, 30), jnp.float32) * 1e-6  # all saturated
    d2 = jnp.asarray([5, 5, 5, 5], jnp.int32)
    assert int(tile_harmful_overflow(s2, t2, d2)) == 0


def test_harmless_overflow_does_not_grow_capacity():
    from tests.test_train import small_config

    cfg = small_config(iterations=2)
    ds = FrameCubeDataset(images=synthetic_video(t=4))
    fitter = GOPFitter(cfg, ds, seed=0)
    cap0 = fitter.settings.gaussian_cap
    # persistent raw overflow, zero harmful: capacities must not move
    for i in range(4):
        acted = fitter._react_to_overflow(10_000, it=i, harmful=0)
        assert not acted
    assert fitter.settings.gaussian_cap == cap0

    # harmful overflow drives growth exactly like raw overflow used to
    acted_any = False
    for i in range(3):
        acted_any |= fitter._react_to_overflow(10_000, it=i, harmful=123)
    assert acted_any
    assert fitter.settings.gaussian_cap > cap0
