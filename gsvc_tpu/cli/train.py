"""Encode a video by fitting (the reference's train_model.py entry).

Fits a GOP, then performs the encode + decode round trip and evaluates
the decoded model — "training" IS encoding in this codec
(reference call stack: SURVEY.md §3.1).

    python -m gsvc_tpu.cli.train --source_path frames/ \
        --optical_path flow/ --model_path out/ \
        --config_path cfgs/uvg.yaml --lmbda 0.004
"""

from __future__ import annotations

import json
import pathlib

from gsvc_tpu.cli.common import base_parser, model_config_dict, resolve_config


def _train_segmented(args, cfg):
    """Fit one model per GOP segment of a long video (the reference's
    UVG protocol: one model per frames-directory segment).

    Frames are symlinked into per-GOP temp dirs; per-GOP bitstreams land
    in <model_path>/gop_<k>/; aggregate bpp/PSNR goes to results.json."""
    import json
    import os
    import tempfile

    src = pathlib.Path(cfg.pipeline.source_path)
    frames = sorted(p for p in src.iterdir() if p.is_file())
    flow_dir = pathlib.Path(cfg.pipeline.optical_path) \
        if cfg.pipeline.optical_path else None
    flows = sorted(p for p in flow_dir.iterdir()) if flow_dir else []

    g = args.gop_size
    segments = [(i, frames[i:i + g]) for i in range(0, len(frames), g)]
    aggregate = []
    root = pathlib.Path(cfg.pipeline.model_path)
    for start, seg in segments:
        with tempfile.TemporaryDirectory() as td:
            fdir = pathlib.Path(td) / "frames"
            fdir.mkdir()
            for p in seg:
                os.symlink(p.resolve(), fdir / p.name)
            odir = None
            if flows:
                odir = pathlib.Path(td) / "flow"
                odir.mkdir()
                for p in flows[start:start + len(seg) - 1]:
                    os.symlink(p.resolve(), odir / p.name)
            seg_args = ["--source_path", str(fdir),
                        "--model_path", str(root / f"gop_{start:05d}"),
                        "--seed", str(args.seed)]
            if odir is not None:
                seg_args += ["--optical_path", str(odir)]
            if args.config_path:
                seg_args += ["--config_path", args.config_path]
            if args.lmbda is not None:
                seg_args += ["--lmbda", str(args.lmbda)]
            if args.iterations is not None:
                seg_args += ["--iterations", str(args.iterations)]
            aggregate.append(main(seg_args))
    summary = {
        "gops": len(segments),
        "mean_psnr": float(sum(r.get("decoded_psnr") or 0
                               for r in aggregate) / len(aggregate)),
        "mean_bpp": float(sum(r.get("bpp") or 0
                              for r in aggregate) / len(aggregate)),
        "per_gop": aggregate,
    }
    (root / "results.json").write_text(json.dumps(summary, indent=2))
    return summary


class _StridedFrames:
    """Index-mapped view over a (lazy) frame stack: view[i] == base[i*s].

    Keeps the per-frame laziness of FrameCubeDataset.images — slicing
    the lazy view with [::s] would materialize the full f32 stack."""

    def __init__(self, base, stride):
        self.base, self.stride = base, stride

    def __getitem__(self, i):
        return self.base[i * self.stride]


def _codec_eval(state, gcfg, settings, window_cap, capacity, frame_zs,
                dataset, cfg, out_dir, lpips_arg, log, eval_stride=1):
    """Encode -> decode -> evaluate one fitted GOP model.

    Shared by the single-GOP path (main) and the fan-out path
    (_train_gop_parallel); mirrors the reference's post-train flow
    (train_model.py: conduct_encoding/conduct_decoding + report).

    ``eval_stride``: score every Nth frame (uniform subsample) — the
    bitstream/bpp always covers ALL frames; only the metric average is
    subsampled.  Recorded in the results when != 1."""
    import pathlib

    from gsvc_tpu.codec.bitstream import conduct_decoding, conduct_encoding
    from gsvc_tpu.models.gaussians import GenerateMode
    from gsvc_tpu.report import bits_per_pixel, evaluate_video
    from gsvc_tpu.utils.checkpoint import save_streams

    streams, meta, bit_info, enc_state, enc_time = conduct_encoding(
        state, gcfg, model_config=model_config_dict(cfg),
        video_info={"width": dataset.width, "height": dataset.height,
                    "num_frames": dataset.num_frames})
    bs_dir = pathlib.Path(out_dir) / "bitstreams"
    total_bytes = save_streams(str(bs_dir), streams)
    bpp = bits_per_pixel(total_bytes * 8, dataset.width, dataset.height,
                         dataset.num_frames)
    log("encoded %.3f MB (%.5f bpp) in %.1fs"
        % (total_bytes / 2 ** 20, bpp, enc_time))

    dec_state, _, dec_time = conduct_decoding(
        streams, gcfg, enc_state, capacity=capacity)
    log("decoded in %.1fs" % dec_time)

    lpips_w = None
    if lpips_arg:
        from gsvc_tpu.metrics.lpips import load_lpips_weights

        lpips_w = load_lpips_weights(lpips_arg)
    eval_zs = frame_zs
    gt = dataset.images
    if eval_stride > 1:
        eval_zs = frame_zs[::eval_stride]
        gt = _StridedFrames(gt, eval_stride) if gt is not None else None
    ev = evaluate_video(
        dec_state, gcfg, settings, window_cap, eval_zs,
        dataset.x_min, dataset.y_min, dataset.scale,
        gt_images=gt, mode=GenerateMode.DECODED,
        decoded=True, lpips_weights=lpips_w)
    log("decoded eval: psnr=%.2f ssim=%.4f lpips=%s fps=%.1f"
        % (ev.get("psnr", 0), ev.get("ssim", 0),
           ev.get("lpips", "n/a"), ev["fps"]))
    results = dict(bpp=bpp, encode_seconds=enc_time,
                   decode_seconds=dec_time,
                   decoded_psnr=ev.get("psnr"),
                   decoded_ssim=ev.get("ssim"),
                   decoded_ms_ssim=ev.get("ms_ssim"),
                   decoded_lpips=ev.get("lpips"),
                   decode_fps=ev["fps"],
                   size_mb=total_bytes / 2 ** 20)
    if eval_stride > 1:
        results["eval_stride"] = eval_stride
        results["eval_frames"] = len(eval_zs)
    if lpips_arg == "proxy":
        # deterministic random-feature proxy, NOT pretrained-VGG LPIPS —
        # absolute values are not comparable to published curves
        # (metrics/lpips.py:proxy_lpips_weights)
        results["lpips_kind"] = "proxy-vgg16w4"
    return results


def _train_gop_parallel(args, cfg):
    """Fan per-GOP fits over the mesh's dp axis in ONE jitted step
    (parallel/spmd.py:fit_gops) instead of the sequential per-GOP loop —
    the embarrassingly-parallel axis of the UVG protocol as a product
    path.  Each GOP then runs its own encode/decode/eval round trip."""
    import json
    import os
    import tempfile

    import numpy as np

    from gsvc_tpu.framecube import FrameCubeDataset
    from gsvc_tpu.models.gaussians import GaussianConfig
    from gsvc_tpu.parallel.spmd import (fit_gops, make_mesh,
                                        parse_mesh_spec)
    from gsvc_tpu.render.pipeline import make_raster_settings
    from gsvc_tpu.train.fit import compute_window_cap
    from gsvc_tpu.utils.logging import dump_config, setup_logging

    log = setup_logging(cfg.pipeline.model_path)
    dump_config(cfg, cfg.pipeline.model_path)

    src = pathlib.Path(cfg.pipeline.source_path)
    frames = sorted(p for p in src.iterdir() if p.is_file())
    flow_dir = pathlib.Path(cfg.pipeline.optical_path) \
        if cfg.pipeline.optical_path else None
    flows = sorted(p for p in flow_dir.iterdir()) if flow_dir else []
    g = args.gop_size
    segments = [(i, frames[i:i + g]) for i in range(0, len(frames), g)]

    mesh_spec = args.mesh or cfg.pipeline.mesh_shape
    if mesh_spec:
        axes = parse_mesh_spec(mesh_spec)
        mesh = make_mesh(axes["dp"], axes["sp"])
    else:
        mesh = make_mesh(len(segments), 1)
    log.info("GOP fan-out: %d segments over mesh %s", len(segments),
             dict(mesh.shape))

    root = pathlib.Path(cfg.pipeline.model_path)
    with tempfile.TemporaryDirectory() as td:
        datasets = []
        for start, seg in segments:
            fdir = pathlib.Path(td) / f"frames_{start:05d}"
            fdir.mkdir()
            for p in seg:
                os.symlink(p.resolve(), fdir / p.name)
            odir = None
            if flows:
                odir = pathlib.Path(td) / f"flow_{start:05d}"
                odir.mkdir()
                for p in flows[start:start + len(seg) - 1]:
                    os.symlink(p.resolve(), odir / p.name)
            datasets.append(FrameCubeDataset(
                str(fdir), str(odir) if odir else None,
                prefetch=not cfg.pipeline.skip_prefetch,
                cache=False))  # segment dirs are throwaway symlink trees

        states, reports = fit_gops(mesh, cfg, datasets,
                                   iterations=args.iterations,
                                   seed=args.seed, log_fn=log.info)

        gcfg = GaussianConfig.from_model_config(cfg.model)
        d0 = datasets[0]
        settings = make_raster_settings(
            gcfg, d0.height, d0.width, tile_h=cfg.pipeline.tile_h,
            tile_w=cfg.pipeline.tile_w,
            gaussian_cap=cfg.pipeline.visible_capacity or 1024,
            chunk=cfg.pipeline.gaussian_chunk)
        aggregate = []
        for gi, ((start, _), st, ds) in enumerate(zip(segments, states,
                                                      datasets)):
            zs = np.array([(i - ds.num_frames / 2) / ds.scale
                           for i in range(ds.num_frames)], np.float32)
            window_cap = compute_window_cap(
                np.asarray(st.anchors.anchor[:, 2]), int(st.n_active), zs,
                gcfg.threshold)
            out_dir = root / f"gop_{start:05d}"
            out_dir.mkdir(parents=True, exist_ok=True)
            res = {"n_anchors": int(st.n_active),
                   "fit_psnr": (reports[gi][-1]["psnr"] if reports[gi]
                                else None)}
            if not args.skip_codec:
                res.update(_codec_eval(
                    st, gcfg, settings, window_cap,
                    int(st.anchors.anchor.shape[0]), zs, ds, cfg,
                    str(out_dir), args.lpips_weights, log.info,
                    eval_stride=args.eval_stride))
            (out_dir / "results.json").write_text(json.dumps(res,
                                                             indent=2))
            aggregate.append(res)

    summary = {
        "gops": len(segments),
        "mesh": dict(mesh.shape),
        "mean_psnr": float(np.mean([r.get("decoded_psnr") or
                                    r.get("fit_psnr") or 0
                                    for r in aggregate])),
        "mean_bpp": float(np.mean([r.get("bpp") or 0 for r in aggregate])),
        "per_gop": aggregate,
    }
    (root / "results.json").write_text(json.dumps(summary, indent=2))
    log.info("results: %s", json.dumps(summary))
    return summary


def main(argv=None):
    parser = base_parser(__doc__)
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="resume from a training checkpoint")
    parser.add_argument("--checkpoint_iterations", type=int, nargs="*",
                        default=[], help="iterations to checkpoint at")
    parser.add_argument("--eval_every", type=int, default=0)
    parser.add_argument("--skip_codec", action="store_true",
                        help="fit only; skip encode/decode round trip")
    parser.add_argument("--eval_stride", type=int, default=1,
                        help="score every Nth frame in the decoded eval "
                             "(bpp still covers all frames); recorded in "
                             "results.json when != 1")
    parser.add_argument("--profile", type=str, default=None,
                        help="capture a jax.profiler trace into this dir "
                             "for the first ~50 iterations")
    parser.add_argument("--lpips_weights", type=str, default=None,
                        help="npz of VGG16+lin LPIPS weights "
                             "(scripts/export_lpips_weights.py)")
    parser.add_argument("--gop_size", type=int, default=0,
                        help="split long videos into GOPs of this many "
                             "frames, fitting one model per GOP (the "
                             "reference fits UVG per segment)")
    parser.add_argument("--gop_parallel", action="store_true",
                        help="with --gop_size: fit all GOPs concurrently, "
                             "fanned over the mesh dp axis in one jitted "
                             "step (parallel/spmd.py:fit_gops) instead of "
                             "sequentially")
    parser.add_argument("--mesh", type=str, default=None,
                        help="SPMD mesh spec, e.g. 'dp=2,sp=4' (overrides "
                             "pipeline.mesh_shape); anchors are z-slab "
                             "sharded over sp, frame pairs batched over dp")
    args = parser.parse_args(argv)

    cfg = resolve_config(args)

    if args.gop_size:
        if args.gop_parallel:
            return _train_gop_parallel(args, cfg)
        return _train_segmented(args, cfg)

    from gsvc_tpu.codec.estimate import estimate_final_bits
    from gsvc_tpu.framecube import FrameCubeDataset
    from gsvc_tpu.train.fit import GOPFitter
    from gsvc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from gsvc_tpu.utils.logging import MetricsWriter, dump_config, setup_logging

    log = setup_logging(cfg.pipeline.model_path)
    dump_config(cfg, cfg.pipeline.model_path)
    metrics = MetricsWriter(cfg.pipeline.model_path)

    dataset = FrameCubeDataset(cfg.pipeline.source_path,
                               cfg.pipeline.optical_path or None,
                               prefetch=not cfg.pipeline.skip_prefetch)
    log.info("dataset: %dx%d, %d frames", dataset.width, dataset.height,
             dataset.num_frames)

    mesh_spec = args.mesh or cfg.pipeline.mesh_shape
    mesh = None
    if mesh_spec:
        from gsvc_tpu.parallel.spmd import make_mesh, parse_mesh_spec

        axes = parse_mesh_spec(mesh_spec)
        mesh = make_mesh(axes["dp"], axes["sp"])
        log.info("SPMD mesh: dp=%d x sp=%d over %d devices",
                 axes["dp"], axes["sp"], axes["dp"] * axes["sp"])

    fitter = GOPFitter(cfg, dataset, seed=args.seed, log_fn=log.info,
                       mesh=mesh)
    start_iter = 0
    if args.checkpoint:
        start_iter = load_checkpoint(args.checkpoint, fitter)
        log.info("resumed from %s at iteration %d", args.checkpoint,
                 start_iter)

    def log_fn(msg):
        log.info(msg)

    fitter.log = log_fn
    if args.profile:
        import jax

        with jax.profiler.trace(args.profile):
            fitter.fit(iterations=min(50, cfg.optimization.iterations),
                       log_every=0)
        log.info("profiler trace written to %s", args.profile)
    report = fitter.fit(eval_every=args.eval_every, rate_log_every=500,
                        checkpoint_iterations=tuple(
                            args.checkpoint_iterations),
                        checkpoint_dir=cfg.pipeline.model_path,
                        metrics_writer=metrics)
    fitter.save_snapshot(str(pathlib.Path(cfg.pipeline.model_path)
                             / "point_cloud" / "final"))

    ckpt = pathlib.Path(cfg.pipeline.model_path) / "chkpnt_final.pkl"
    save_checkpoint(str(ckpt), fitter, report.iterations)
    log.info("checkpoint saved: %s", ckpt)

    results = {"fit_psnr": report.psnr, "iterations": report.iterations,
               "n_anchors": report.n_active}

    if not args.skip_codec:
        est = estimate_final_bits(fitter.state, fitter.gcfg)
        log.info("estimated bits: total=%.3f MB", est.total / 8 / 2 ** 20)
        results.update(_codec_eval(
            fitter.state, fitter.gcfg, fitter.settings, fitter.window_cap,
            fitter.capacity, fitter.frame_zs, dataset, cfg,
            cfg.pipeline.model_path, args.lpips_weights, log.info,
            eval_stride=args.eval_stride))

    out = pathlib.Path(cfg.pipeline.model_path) / "results.json"
    out.write_text(json.dumps(results, indent=2))
    log.info("results: %s", json.dumps(results))
    return results


if __name__ == "__main__":
    main()
