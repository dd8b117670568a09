"""Decode a bitstream directory and render the video.

The honest version of the reference's ``decode.py`` (which actually runs
an eval/debug path — SURVEY.md layer-map naming traps): this is a true
standalone decoder — bitstreams in, frames out; no checkpoint needed.

    python -m gsvc_tpu.cli.decode --bitstream_path out/bitstreams \
        --model_path decoded_out [--source_path frames/ for metrics]
"""

from __future__ import annotations

import argparse
import json
import pathlib

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bitstream_path", type=str, required=True)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--source_path", type=str, default="",
                   help="original frames (optional, for metrics)")
    p.add_argument("--dump_frames", action="store_true")
    p.add_argument("--lpips_weights", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import pickle
    import zlib

    import jax

    from gsvc_tpu.codec.bitstream import conduct_decoding
    from gsvc_tpu.config import ModelConfig
    from gsvc_tpu.framecube import FrameCubeDataset, frame_geometry
    from gsvc_tpu.framecube.frame import frame_z
    from gsvc_tpu.models.gaussians import (
        GaussianConfig, GenerateMode, init_model, update_anchor_bound,
    )
    from gsvc_tpu.render.pipeline import make_raster_settings
    from gsvc_tpu.report import evaluate_video
    from gsvc_tpu.train.fit import compute_window_cap
    from gsvc_tpu.utils.checkpoint import load_streams
    from gsvc_tpu.utils.logging import setup_logging

    log = setup_logging(args.model_path, filename="decode.log")
    streams = load_streams(args.bitstream_path)
    meta = pickle.loads(zlib.decompress(streams["meta.bin"]))
    assert meta.model_config is not None and meta.video_info is not None, \
        "bitstream lacks self-contained decode info"

    mc = ModelConfig(**meta.model_config)
    cfg = GaussianConfig.from_model_config(mc)
    vi = meta.video_info
    w, h, t = vi["width"], vi["height"], vi["num_frames"]
    scale, x_min, y_min, z_min = frame_geometry(w, h, t)

    # template state: same shapes/bounds the encoder used (bounds derive
    # deterministically from the video geometry)
    capacity = max(meta.anchor_num, 8)
    pts = np.random.default_rng(args.seed).uniform(
        -0.1, 0.1, (min(64, capacity), 3)).astype(np.float32)
    template = init_model(jax.random.PRNGKey(args.seed), cfg, pts, capacity,
                          voxel_size=0.001)
    template = update_anchor_bound(template, x_min, y_min, z_min)

    dec_state, meta, dec_time = conduct_decoding(streams, cfg, template,
                                                 capacity=capacity)
    log.info("decoded %d anchors in %.2fs", meta.anchor_num, dec_time)

    frame_zs = np.array([frame_z(i, t, scale) for i in range(t)], np.float32)
    window_cap = compute_window_cap(
        np.asarray(dec_state.anchors.anchor[:, 2]),
        int(dec_state.n_active), frame_zs, cfg.threshold)
    settings = make_raster_settings(cfg, h, w)

    gt = None
    if args.source_path:
        ds = FrameCubeDataset(args.source_path, None)
        gt = ds.images

    dump = str(pathlib.Path(args.model_path) / "frames") \
        if args.dump_frames else None
    lpips_w = None
    if args.lpips_weights:
        from gsvc_tpu.metrics.lpips import load_lpips_weights

        lpips_w = load_lpips_weights(args.lpips_weights)
    ev = evaluate_video(dec_state, cfg, settings, window_cap, frame_zs,
                        x_min, y_min, scale, gt_images=gt,
                        mode=GenerateMode.DECODED, decoded=True,
                        dump_dir=dump, lpips_weights=lpips_w)
    log.info("decode eval: %s", json.dumps(
        {k: v for k, v in ev.items() if not isinstance(v, list)}))
    out = pathlib.Path(args.model_path) / "decode_results.json"
    out.write_text(json.dumps(
        {k: v for k, v in ev.items() if not isinstance(v, list)}, indent=2))
    return ev


if __name__ == "__main__":
    main()
