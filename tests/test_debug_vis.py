"""Debug visualization CLI (parity with reference pipeline/eval.py
debug path): renders scatter PNGs headlessly from a checkpoint."""

import pathlib

import numpy as np
import pytest

from tests.test_train import small_config, synthetic_video


@pytest.mark.slow
def test_debug_vis_cli(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image

    from gsvc_tpu.framecube import FrameCubeDataset
    from gsvc_tpu.train.fit import GOPFitter
    from gsvc_tpu.utils.checkpoint import save_checkpoint

    frames = synthetic_video(t=4)
    src = tmp_path / "frames"
    src.mkdir()
    for i, fr in enumerate(frames):
        Image.fromarray((fr * 255).astype(np.uint8)).save(
            src / f"f_{i:03d}.png")

    cfg = small_config(iterations=3)
    cfg.pipeline.source_path = str(src)
    cfg.pipeline.model_path = str(tmp_path / "model")
    ds = FrameCubeDataset(images=frames)
    fitter = GOPFitter(cfg, ds, seed=0)
    fitter.fit(iterations=3, log_every=0)
    ckpt = tmp_path / "chk.pkl"
    save_checkpoint(str(ckpt), fitter, 3)

    yaml_path = tmp_path / "small.yaml"
    yaml_path.write_text("""
model:
  anchor_feature_dim: 8
  n_offsets: 4
  threshold: 0.3
  time_multi_res: 4
  offset_multi_res: 4
  log2: 6
  log2_2D: 7
  grid_feature_dim: 2
  resolutions_list: [6, 10]
  resolutions_list_2D: [12, 20]
pipeline:
  tile_h: 8
  tile_w: 16
  visible_capacity: 256
  gaussian_chunk: 32
optimization:
  iterations: 3
  init_anchor_num: 300
  optical_lambda: 0.0
""")

    from gsvc_tpu.cli import debug_vis

    debug_vis.main([
        "--model_path", str(tmp_path / "model"),
        "--source_path", str(src),
        "--config_path", str(yaml_path),
        "--checkpoint", str(ckpt),
        "--frame", "0",
        "--out", str(tmp_path / "vis"),
    ])
    out = tmp_path / "vis"
    assert (out / "gaussians_xy_0.png").exists()
    assert (out / "flow_scatter_0.png").exists()
    img = np.asarray(Image.open(out / "gaussians_xy_0.png"))
    assert img.ndim == 3 and (img < 250).any(), "scatter should draw dots"
