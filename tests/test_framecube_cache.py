"""Disk cache for decoded GOP frames/flows (framecube/frame.py).

The cache exists so a relaunched fit (RD-sweep sequencer, supervisor
resume) skips the PNG decode of a 600-frame 1080p GOP (~20 min on this
1-core host).  Contract: byte-identical f32 frames/flows vs the uncached
loader, manifest-guarded staleness, and compact raw stacks
(``images_u8`` / ``flows_raw``) for the fitter's HBM upload path.
"""

import pickle

import numpy as np
import pytest

from gsvc_tpu.framecube import FrameCubeDataset


@pytest.fixture()
def gop_dir(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    fdir = tmp_path / "frames"
    odir = tmp_path / "flow"
    fdir.mkdir()
    odir.mkdir()
    t, h, w = 5, 24, 32
    for i in range(t):
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        Image.fromarray(img).save(fdir / f"{i:03d}.png")
        if i < t - 1:
            with open(odir / f"{i:03d}.pkl", "wb") as f:
                pickle.dump(rng.normal(size=(2, h, w)).astype(np.float16),
                            f)
    return fdir, odir


def _reference_arrays(ds):
    imgs = np.stack([FrameCubeDataset._load_image(p) for p in ds._paths])
    flows = np.stack([FrameCubeDataset._load_flow(p)
                      for p in ds._flow_paths])
    return imgs, flows


def test_cache_build_and_reload_parity(gop_dir):
    fdir, odir = gop_dir
    ds1 = FrameCubeDataset(str(fdir), str(odir))
    assert (fdir / ".cube_cache/manifest.json").exists()
    ds2 = FrameCubeDataset(str(fdir), str(odir))  # cache hit (mmap)
    ref_imgs, ref_flows = _reference_arrays(ds1)
    for ds in (ds1, ds2):
        assert ds.images.shape == ref_imgs.shape
        assert len(ds.flows) == ref_flows.shape[0]
        for i in range(len(ds)):
            assert np.array_equal(ds.images[i], ref_imgs[i])
        for i in range(len(ds.flows)):
            assert np.array_equal(ds.flows[i], ref_flows[i])
        # slice access (GOP segmentation uses ranges)
        assert np.array_equal(ds.images[1:3], ref_imgs[1:3])
        assert ds.images_u8.dtype == np.uint8
        assert ds.flows_raw.dtype == np.float16
    # the cache dir must not leak into the frame listing
    assert len(ds2._paths) == ref_imgs.shape[0]


def test_cache_invalidation_on_change(gop_dir):
    from PIL import Image

    fdir, odir = gop_dir
    FrameCubeDataset(str(fdir), str(odir))
    # replace a frame with different content (different size)
    big = np.zeros((24, 32, 3), np.uint8)
    big[:, :16] = 255
    Image.fromarray(big).save(fdir / "002.png")
    ds = FrameCubeDataset(str(fdir), str(odir))
    assert np.array_equal(
        ds.images[2], FrameCubeDataset._load_image(fdir / "002.png"))


def test_cache_corrupt_manifest_rebuilds(gop_dir):
    fdir, odir = gop_dir
    FrameCubeDataset(str(fdir), str(odir))
    (fdir / ".cube_cache/manifest.json").write_text("not json {")
    ds = FrameCubeDataset(str(fdir), str(odir))
    assert np.array_equal(ds.images[0],
                          FrameCubeDataset._load_image(ds._paths[0]))


def test_cache_disabled(gop_dir):
    fdir, odir = gop_dir
    ds = FrameCubeDataset(str(fdir), str(odir), cache=False)
    assert not (fdir / ".cube_cache").exists()
    ref_imgs, ref_flows = _reference_arrays(ds)
    assert np.array_equal(ds.images[4], ref_imgs[4])
    assert np.array_equal(ds.flows[0], ref_flows[0])


def test_fitter_uses_compact_stacks(gop_dir):
    """GOPFitter's HBM upload consumes images_u8/flows_raw exactly."""
    fdir, odir = gop_dir
    ds = FrameCubeDataset(str(fdir), str(odir))
    from gsvc_tpu.config import Config
    from gsvc_tpu.train.fit import GOPFitter

    cfg = Config()
    cfg.model.anchor_feature_dim = 8
    cfg.model.n_offsets = 4
    cfg.model.grid_feature_dim = 2
    cfg.model.resolutions_list = (6, 10)
    cfg.model.resolutions_list_2D = (12, 20)
    cfg.optimization.init_anchor_num = 64
    cfg.pipeline.tile_h = 8
    cfg.pipeline.tile_w = 16
    cfg.pipeline.visible_capacity = 128
    cfg.pipeline.gaussian_chunk = 32
    fitter = GOPFitter(cfg, ds, seed=0)
    imgs = np.asarray(fitter.images)
    assert imgs.dtype == np.uint8
    assert np.array_equal(imgs[1],
                          np.transpose(ds.images_u8[1], (2, 0, 1)))
    # flows are stored int8 + per-frame scale (fit.py HBM store);
    # dequantized error bound = scale/2 = max|flow| / 254
    q, s = fitter.flows
    flows0 = np.asarray(q[0], np.float32) * np.asarray(s[0], np.float32)
    ref0 = np.asarray(ds.flows_raw[0], np.float32)
    tol = max(np.abs(ref0).max() / 254.0, 0.01)
    assert np.allclose(flows0, ref0, atol=tol)
