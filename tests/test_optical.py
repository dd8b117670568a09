"""Optical-flow loss: alignment across windows + train-step integration."""

import jax
import jax.numpy as jnp
import numpy as np

from gsvc_tpu.config import Config
from gsvc_tpu.framecube import FrameCubeDataset
from gsvc_tpu.train.fit import GOPFitter
from tests.test_train import small_config, synthetic_video
import pytest


def test_optical_loss_zero_when_motion_matches_flow():
    from gsvc_tpu.train.trainer import optical_flow_loss
    from gsvc_tpu.render.pipeline import RenderResults
    from gsvc_tpu.models.gaussians import GeneratedGaussians, RatePack

    rows = 16
    rng = np.random.default_rng(0)
    xy = rng.uniform(-0.3, 0.3, (rows, 2)).astype(np.float32)
    scale, x_min, y_min, w, h = 20.0, -0.5, -0.5, 20, 20

    def mk_render(xy_pos, start):
        anchor = np.zeros((rows, 3), np.float32)
        anchor[:, :2] = xy_pos
        gss = GeneratedGaussians(
            xyz=jnp.asarray(anchor), color=None, opacity=None, scaling=None,
            rot=None, valid=jnp.ones(rows, bool),
            neural_opacity=None,
            anchor_xyz=jnp.asarray(anchor),
            offsets_world=jnp.zeros((rows, 3)),
            rate=RatePack(*(jnp.zeros(()) for _ in range(4))))
        return RenderResults(
            image=None, transmittance=None,
            window_start=jnp.asarray(start, jnp.int32),
            in_window=jnp.ones(rows // 1, bool),
            radii=None, visibility_filter=None,
            selection_mask=jnp.ones(rows, bool),
            neural_opacity=None, scaling=None, num_rendered=None,
            overflow=None, rate=None, gaussians=gss)

    # frame2 gaussians moved by exactly the flow -> loss == 0
    duv_ndc = np.full((rows, 2), 0.01, np.float32)
    r1 = mk_render(xy, 0)
    r2 = mk_render(xy + duv_ndc, 0)
    flow = jnp.full((2, h, w), 0.01 * scale)   # pixels
    loss = optical_flow_loss(r1, r2, flow, x_min, y_min, scale, w, h,
                             n_offsets=1)
    assert float(loss) < 1e-6

    # mismatch -> positive loss
    r2b = mk_render(xy + 2 * duv_ndc, 0)
    loss2 = optical_flow_loss(r1, r2b, flow, x_min, y_min, scale, w, h,
                              n_offsets=1)
    assert float(loss2) > 1e-3


@pytest.mark.slow
def test_train_step_with_optical_loss_compiles():
    frames = synthetic_video(t=4, h=16, w=16)
    # constant small flow
    flows = np.full((3, 2, 16, 16), 0.3, np.float32)
    ds = FrameCubeDataset(images=frames, flows=flows)
    cfg = small_config(iterations=3)
    cfg.optimization.optical_lambda = 5.0
    cfg.optimization.start_stat = 10 ** 9
    cfg.optimization.update_from = 10 ** 9
    fitter = GOPFitter(cfg, ds, seed=0)
    report = fitter.fit(log_every=0)
    assert np.isfinite(report.loss)
    assert np.isfinite(float(report.psnr))
