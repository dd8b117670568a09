"""Stream codec round trip: z-sliced encode from a checkpoint, streaming
decode, frame dump.

Honest-name version of the reference's ``stream_decode.py`` (which
actually *encodes* — it loads a checkpoint, runs the stream codec round
trip and renders decoded frames: SURVEY.md §3.2).  The z-sliced bitstream
is prefix-decodable: each frame needs only the slices within its TSW
window.

    python -m gsvc_tpu.cli.stream --source_path frames/ \
        --model_path out/ --checkpoint out/chkpnt_final.pkl
"""

from __future__ import annotations

import json
import pathlib

from gsvc_tpu.cli.common import base_parser, model_config_dict, resolve_config


def main(argv=None):
    parser = base_parser(__doc__)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--dump_frames", action="store_true")
    args = parser.parse_args(argv)
    cfg = resolve_config(args)

    from gsvc_tpu.codec.bitstream import conduct_decoding, conduct_encoding
    from gsvc_tpu.framecube import FrameCubeDataset
    from gsvc_tpu.models.gaussians import GenerateMode
    from gsvc_tpu.report import bits_per_pixel, evaluate_video
    from gsvc_tpu.train.fit import GOPFitter
    from gsvc_tpu.utils.checkpoint import (load_checkpoint, load_streams,
                                           save_streams)
    from gsvc_tpu.utils.logging import setup_logging

    log = setup_logging(cfg.pipeline.model_path, filename="stream.log")
    dataset = FrameCubeDataset(cfg.pipeline.source_path,
                               cfg.pipeline.optical_path or None)
    fitter = GOPFitter(cfg, dataset, seed=args.seed, log_fn=log.info)
    load_checkpoint(args.checkpoint, fitter)
    log.info("checkpoint loaded")

    streams, meta, bit_info, enc_state, enc_time = conduct_encoding(
        fitter.state, fitter.gcfg, streaming=True,
        model_config=model_config_dict(cfg),
        video_info={"width": dataset.width, "height": dataset.height,
                    "num_frames": dataset.num_frames})
    bs_dir = pathlib.Path(cfg.pipeline.model_path) / "stream_bitstreams"
    total_bytes = save_streams(str(bs_dir), streams)
    bpp = bits_per_pixel(total_bytes * 8, dataset.width, dataset.height,
                         dataset.num_frames)
    log.info("stream-encoded %.3f MB (%.5f bpp) in %.1fs, %d z-slices",
             total_bytes / 2 ** 20, bpp, enc_time,
             len(meta.index_splits or []))

    dec_state, _, dec_time = conduct_decoding(
        streams, fitter.gcfg, enc_state, capacity=fitter.capacity)
    log.info("stream-decoded in %.1fs", dec_time)

    dump = str(pathlib.Path(cfg.pipeline.model_path) / "stream_frames") \
        if args.dump_frames else None
    ev = evaluate_video(
        dec_state, fitter.gcfg, fitter.settings, fitter.window_cap,
        fitter.frame_zs, dataset.x_min, dataset.y_min, dataset.scale,
        gt_images=dataset.images, mode=GenerateMode.DECODED, decoded=True,
        dump_dir=dump)
    results = {"bpp": bpp, "size_mb": total_bytes / 2 ** 20,
               "encode_seconds": enc_time, "decode_seconds": dec_time,
               "psnr": ev.get("psnr"), "ssim": ev.get("ssim"),
               "fps": ev["fps"], "z_slices": len(meta.index_splits or [])}
    log.info("stream results: %s", json.dumps(results))
    out = pathlib.Path(cfg.pipeline.model_path) / "stream_results.json"
    out.write_text(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
