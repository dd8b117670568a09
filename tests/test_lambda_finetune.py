"""Lambda fine-tune flow: resume a finished fit under an extended
STE-phase config with a new lambda and a strided decoded eval.

This is the round-4 RD bracket-point recipe at tiny scale
(scripts/rd_r4_finetune.sh / cfgs/cfg_20240919_ft.yaml): the reference
trains each lambda from scratch (train_model.py), but its lambda only
enters the loss through the entropy term, so a warm-started STE-phase
re-equilibration is the minimal faithful adaptation when wall clock is
bounded.
"""

import json

import numpy as np
import pytest
import yaml

from gsvc_tpu.codec import native_available
from tests.test_cli import cfg_file, video_dir  # noqa: F401 (fixtures)

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not native_available(),
                                 reason="native codec unavailable")]


def test_finetune_resume_and_strided_eval(video_dir, cfg_file,  # noqa: F811
                                          tmp_path_factory):
    from gsvc_tpu.cli.train import main as train_main

    root, frames_dir, flow_dir = video_dir
    out = tmp_path_factory.mktemp("base")
    base = train_main([
        "--source_path", str(frames_dir), "--optical_path", str(flow_dir),
        "--model_path", str(out), "--config_path", cfg_file])
    assert base["iterations"] == 6

    # extended config: 4 more STE-entropy iterations past the finished
    # horizon (6 -> 10), exactly how the flagship ft config extends 8000
    # -> 9500 via ste_entropy_constrained_train_total
    cfg = yaml.safe_load(open(cfg_file).read())
    cfg["optimization"]["iterations"] = 10
    cfg["optimization"]["ste_entropy_constrained_train_total"] = 4
    ft_cfg = tmp_path_factory.mktemp("ftcfg") / "ft.yaml"
    ft_cfg.write_text(yaml.safe_dump(cfg))

    ft_out = tmp_path_factory.mktemp("ft")
    res = train_main([
        "--source_path", str(frames_dir), "--optical_path", str(flow_dir),
        "--model_path", str(ft_out), "--config_path", str(ft_cfg),
        "--lmbda", "0.008", "--eval_stride", "2",
        "--checkpoint", str(out / "chkpnt_final.pkl")])

    assert res["iterations"] == 10          # resumed 6 -> 10, not 0 -> 10
    assert res["eval_stride"] == 2
    assert res["eval_frames"] == 2          # 4 frames strided by 2
    assert res["bpp"] > 0
    assert np.isfinite(res["decoded_psnr"])
    on_disk = json.loads((ft_out / "results.json").read_text())
    assert on_disk["eval_stride"] == 2

    # Supervisor relaunch-after-crash path: resuming from the FINAL
    # checkpoint with the same horizon must skip the loop (nothing left
    # to train) and still fall through to encode + results.json — a
    # raise here would make a crashed-after-fit point unfinishable.
    re_out = tmp_path_factory.mktemp("re")
    res2 = train_main([
        "--source_path", str(frames_dir), "--optical_path", str(flow_dir),
        "--model_path", str(re_out), "--config_path", str(ft_cfg),
        "--lmbda", "0.008", "--eval_stride", "2",
        "--checkpoint", str(ft_out / "chkpnt_final.pkl")])
    assert res2["iterations"] == 10
    assert res2["bpp"] > 0
    assert (re_out / "results.json").exists()
