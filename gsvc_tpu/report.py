"""Full-video evaluation and frame export.

Parity with utils/report_utils.py:267-451 (``evaluate`` — per-frame
PSNR/SSIM/MS-SSIM + decode FPS, decoded-frame PNG dump) without the
TensorBoard coupling: results come back as plain dicts, logging is the
caller's concern (see gsvc_tpu/utils/logging.py).
"""

from __future__ import annotations

import pathlib
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsvc_tpu.metrics.image import ms_ssim, psnr, ssim
from gsvc_tpu.models.gaussians import GaussianConfig, GenerateMode, ModelState

from gsvc_tpu.render.splat import RasterSettings


def _make_eval_render(cfg: GaussianConfig, settings: RasterSettings,
                      window_cap: int, x_min: float, y_min: float,
                      scale: float, mode: GenerateMode, decoded: bool):
    """One jitted fwd+bwd averaged frame render (Pallas early-exit kernel
    on real TPUs — the decode-FPS fast path)."""
    import os
    rasterizer = os.environ.get("GSVC_RASTERIZER") or (
        "pallas" if (jax.default_backend() == "tpu"
                     and settings.chunk % 128 == 0) else "jnp")
    # GSVC_DECODE: "bidir" (v4 one-alpha-pass fwd/flip average; parity in
    # tests/test_bidir.py) or "mirror" (v3 two-view); bidir is decode-only
    decode_kind = os.environ.get("GSVC_DECODE", "bidir")

    from gsvc_tpu.render.batched import render_frame_bidir, render_frame_views

    @jax.jit
    def render(state: ModelState, frame_z):
        if decode_kind == "bidir" and rasterizer != "pallas_stream":
            avg, _, _ = render_frame_bidir(
                state, cfg, frame_z, x_min, y_min, scale, settings,
                window_cap, mode=mode, rasterizer=rasterizer,
                decoded=decoded)
            return avg
        avg, _, _, _ = render_frame_views(
            state, cfg, frame_z, x_min, y_min, scale, settings, window_cap,
            mode=mode, rasterizer=rasterizer, decoded=decoded,
            inference=True)
        return avg

    @jax.jit
    def render_chunk(state: ModelState, frame_zs):
        """K frames in ONE dispatch (lax.fori_loop over the frame render)
        — through the axon tunnel each dispatch costs ~100-300 ms of RPC,
        which at 600 frames dominated decode wall-clock (r4 flagship:
        2.2 fps per-call vs ~20 device-fps)."""
        k = frame_zs.shape[0]
        h = settings.image_height
        w = settings.image_width
        out = jnp.zeros((k, 3, h, w), jnp.float32)

        def body(i, acc):
            return acc.at[i].set(render(state, frame_zs[i]))

        return jax.lax.fori_loop(0, k, body, out)

    return render, render_chunk


def evaluate_video(state: ModelState, cfg: GaussianConfig,
                   settings: RasterSettings, window_cap: int,
                   frame_zs: np.ndarray, x_min: float, y_min: float,
                   scale: float, gt_images: Optional[np.ndarray] = None,
                   mode: GenerateMode = GenerateMode.FULL_PRECISION,
                   decoded: bool = False,
                   dump_dir: Optional[str] = None,
                   compute_msssim: bool = True,
                   lpips_weights: Optional[dict] = None) -> dict:
    """Render every frame; measure decode FPS and (if GT given) metrics.

    ``lpips_weights``: optional dict from metrics.lpips.load_lpips_weights
    — when given, LPIPS joins PSNR/SSIM/MS-SSIM in the report (the
    reference evaluates it on every full-video eval,
    utils/report_utils.py:331-356)."""
    render, render_chunk = _make_eval_render(cfg, settings, window_cap,
                                             x_min, y_min, scale, mode,
                                             decoded)

    # compile outside the timed loop
    img = render(state, jnp.asarray(float(frame_zs[0])))
    jax.block_until_ready(img)

    psnrs, ssims, msssims, lpipss = [], [], [], []
    lpips_fn = None
    if lpips_weights is not None:
        from gsvc_tpu.metrics.lpips import lpips as _lpips

        lpips_fn = jax.jit(lambda a, b: _lpips(lpips_weights, a, b))
    # Render + score in CHUNKS: keeping every decoded frame on device
    # would need ~15 GB HBM at 600x1080p (600 x 25 MB) — over the v5e
    # budget.  Renders within a chunk stay async (fps is the summed
    # dispatch+sync time of the render phases only); metrics and host
    # copies run between chunks.
    n = len(frame_zs)
    chunk = max(1, min(16, n))   # one padded program shape; tiny evals
    #                              (CLI tests) stay un-padded
    can_msssim = compute_msssim and img.shape[1] >= 176 \
        and img.shape[2] >= 176
    dump_out = None
    if dump_dir is not None:
        from PIL import Image

        dump_out = pathlib.Path(dump_dir)
        dump_out.mkdir(parents=True, exist_ok=True)
    render_time = 0.0
    for c0 in range(0, n, chunk):
        zs = frame_zs[c0:c0 + chunk]
        # pad the tail chunk to the compiled length (one program shape);
        # padded slots re-render the last z and are sliced off below
        zs_pad = np.full(chunk, float(zs[-1]), np.float32)
        zs_pad[:len(zs)] = np.asarray(zs, np.float32)
        t0 = time.perf_counter()
        stack = render_chunk(state, jnp.asarray(zs_pad))
        # sync on ONE element: block_until_ready is unreliable through
        # the axon tunnel and a full-stack pull would time the 400 MB
        # HTTP transfer, not the render (CLAUDE.md measurement rules)
        float(np.asarray(stack[0, 0, 0, 0]))
        render_time += time.perf_counter() - t0
        imgs = [stack[i] for i in range(len(zs))]
        # one device->host pull per CHUNK, not 3-4 scalar RPCs per frame
        # (each float() through the axon tunnel costs ~100-300 ms; at 600
        # frames that was minutes of pure RPC overhead)
        chunk_stats = []
        for i, im in enumerate(imgs):
            gi = c0 + i
            if gt_images is not None:
                gt = jnp.asarray(gt_images[gi])
                if gt.ndim == 3 and gt.shape[-1] == 3:  # HWC -> CHW
                    gt = jnp.transpose(gt, (2, 0, 1))
                row = [psnr(im, gt), ssim(im, gt)]
                if can_msssim:
                    row.append(ms_ssim(im, gt))
                if lpips_fn is not None:
                    row.append(lpips_fn(
                        jnp.transpose(im, (1, 2, 0)),
                        jnp.transpose(gt, (1, 2, 0))))
                chunk_stats.append(jnp.stack(row))
            if dump_out is not None:
                arr = np.clip(np.asarray(im).transpose(1, 2, 0) * 255,
                              0, 255).astype(np.uint8)
                Image.fromarray(arr).save(dump_out / f"frame_{gi:05d}.png")
        if chunk_stats:
            mat = np.asarray(jnp.stack(chunk_stats))
            psnrs.extend(float(v) for v in mat[:, 0])
            ssims.extend(float(v) for v in mat[:, 1])
            col = 2
            if can_msssim:
                msssims.extend(float(v) for v in mat[:, col])
                col += 1
            if lpips_fn is not None:
                lpipss.extend(float(v) for v in mat[:, col])
        if c0 % (8 * chunk) == 0 and n > 64:
            print(f"[eval] {min(c0 + chunk, n)}/{n} frames", flush=True)
    fps = n / render_time

    result = {"fps": fps, "num_frames": len(frame_zs),
              "render_seconds": render_time}
    if psnrs:
        result.update(psnr=float(np.mean(psnrs)),
                      ssim=float(np.mean(ssims)),
                      per_frame_psnr=psnrs)
        if msssims:
            result["ms_ssim"] = float(np.mean(msssims))
        if lpipss:
            result["lpips"] = float(np.mean(lpipss))
    return result


def bits_per_pixel(total_bits: float, width: int, height: int,
                   num_frames: int) -> float:
    return total_bits / (width * height * num_frames)
