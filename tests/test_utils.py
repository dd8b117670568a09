"""Aux utility tests: PLY round trip, flow viz, checkpointing, huffman."""

import numpy as np

from gsvc_tpu.codec.huffman import (build_canonical_code, huffman_decode,
                                    huffman_encode)
from gsvc_tpu.utils.flow_viz import flow_to_image
from gsvc_tpu.utils.ply import load_gaussian_ply, save_gaussian_ply
import pytest


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n, k, f = 50, 4, 8
    d = {
        "anchor": rng.normal(size=(n, 3)).astype(np.float32),
        "offset": rng.normal(size=(n, k, 3)).astype(np.float32),
        "mask": rng.normal(size=(n, k, 1)).astype(np.float32),
        "feat": rng.normal(size=(n, f)).astype(np.float32),
        "opacity": rng.normal(size=(n, 1)).astype(np.float32),
        "scaling": rng.normal(size=(n, 6)).astype(np.float32),
        "rotation": rng.normal(size=(n, 4)).astype(np.float32),
    }
    p = str(tmp_path / "model.ply")
    save_gaussian_ply(p, d)
    back = load_gaussian_ply(p)
    for key in d:
        np.testing.assert_allclose(back[key], d[key], rtol=1e-6,
                                   err_msg=key)


def test_flow_to_image():
    u = np.linspace(-1, 1, 32)[None, :].repeat(16, 0)
    v = np.linspace(-1, 1, 16)[:, None].repeat(32, 1)
    img = flow_to_image(u, v)
    assert img.shape == (16, 32, 3)
    assert img.dtype == np.uint8
    assert img.std() > 10  # actually colorful


def test_huffman_roundtrip():
    rng = np.random.default_rng(1)
    syms = [int(s) for s in rng.integers(-10, 250, 5000)]
    table = build_canonical_code(syms)
    data = huffman_encode(syms, table)
    out = huffman_decode(data, table, len(syms))
    assert out == syms
    # skewed distribution compresses
    skew = [0] * 9000 + [int(s) for s in rng.integers(0, 50, 1000)]
    rng.shuffle(skew)
    t2 = build_canonical_code(skew)
    d2 = huffman_encode(skew, t2)
    assert len(d2) * 8 < len(skew) * 2


def test_checkpoint_roundtrip(tmp_path):
    from gsvc_tpu.config import Config, ModelConfig, OptimizationConfig, PipelineConfig
    from gsvc_tpu.framecube import FrameCubeDataset
    from gsvc_tpu.train.fit import GOPFitter
    from gsvc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from tests.test_train import small_config, synthetic_video

    frames = synthetic_video(t=4, h=16, w=16)
    ds = FrameCubeDataset(images=frames)
    cfg = small_config(iterations=2)
    cfg.optimization.init_anchor_num = 64
    f1 = GOPFitter(cfg, ds, seed=0)
    f1.fit(log_every=0)
    p = str(tmp_path / "ck.pkl")
    save_checkpoint(p, f1, 2)

    f2 = GOPFitter(cfg, ds, seed=0)
    it = load_checkpoint(p, f2)
    assert it == 2
    np.testing.assert_array_equal(np.asarray(f1.state.anchors.feat),
                                  np.asarray(f2.state.anchors.feat))
    np.testing.assert_array_equal(
        np.asarray(f1.adam.m[0].feat), np.asarray(f2.adam.m[0].feat))
    assert f2.controller.current_iteration == f1.controller.current_iteration


@pytest.mark.slow
def test_checkpoint_resume_continues_fit(tmp_path):
    """A resumed fit must CONTINUE the schedule — absolute iteration
    numbers drive the LR schedules, phase controller, and log labels
    (regression: the loop used to restart at 1 after a restore, replaying
    the LR warmup and over-running the schedule by another `total`)."""
    from gsvc_tpu.framecube import FrameCubeDataset
    from gsvc_tpu.train.fit import GOPFitter
    from gsvc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from tests.test_train import small_config, synthetic_video

    frames = synthetic_video(t=4)
    ds = FrameCubeDataset(images=frames)
    cfg = small_config(iterations=20)

    fa = GOPFitter(cfg, ds, seed=7)
    ra = fa.fit(log_every=5)

    fb = GOPFitter(cfg, ds, seed=7)
    fb.fit(iterations=10, log_every=5)
    p = str(tmp_path / "ck.pkl")
    save_checkpoint(p, fb, 10)
    fc = GOPFitter(cfg, ds, seed=7)
    assert load_checkpoint(p, fc) == 10
    rc = fc.fit(log_every=5)  # continues 11..20

    assert [h["iter"] for h in rc.history] == [15, 20]
    tail = {h["iter"]: h for h in ra.history}
    for h in rc.history:
        assert np.isclose(h["loss"], tail[h["iter"]]["loss"], rtol=2e-3), (
            h, tail[h["iter"]])
    np.testing.assert_allclose(np.asarray(fa.state.anchors.anchor),
                               np.asarray(fc.state.anchors.anchor),
                               atol=1e-4)
