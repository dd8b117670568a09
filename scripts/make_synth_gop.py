"""Generate a structured synthetic GOP with exact optical flow.

Produces reference-geometry evaluation content (no UVG frames exist in
this zero-egress environment): a smoothly panning multi-band color field
with fine texture plus K soft-elliptical moving objects, at any
resolution / length.  Content is temporally coherent by construction, so
a fitting-based codec can exploit exactly the redundancy the reference
exploits on UVG (BASELINE.md), and the per-pair backward flow pickles
are analytically exact (layered composition: object velocity inside an
object, background pan elsewhere) — the same contract as the VideoFlow
pickles the reference trains against (frame_cube/frame.py:201-236).

    python scripts/make_synth_gop.py --out /data/gop600 \
        --width 1920 --height 1080 --frames 600
"""

from __future__ import annotations

import argparse
import pathlib
import pickle

import numpy as np


def _blob_params(rng, n_blobs, w, h, frames):
    params = []
    for _ in range(n_blobs):
        params.append(dict(
            cx=rng.uniform(0.15, 0.85) * w,
            cy=rng.uniform(0.15, 0.85) * h,
            vx=rng.uniform(-1.2, 1.2),
            vy=rng.uniform(-0.8, 0.8),
            ax=rng.uniform(0, 60),            # sinusoidal drift amplitude
            wx=rng.uniform(0.5, 2.0) * 2 * np.pi / frames,
            rx=rng.uniform(0.04, 0.13) * w,
            ry=rng.uniform(0.04, 0.13) * h,
            theta=rng.uniform(0, np.pi),
            color=rng.uniform(0.15, 0.95, 3),
            tex_f=rng.uniform(0.05, 0.25),
            phase=rng.uniform(0, 2 * np.pi),
        ))
    return params


def _blob_center(b, t):
    return (b["cx"] + b["vx"] * t + b["ax"] * np.sin(b["wx"] * t + b["phase"]),
            b["cy"] + b["vy"] * t + 0.5 * b["ax"] * np.cos(b["wx"] * t))


def render_frame(t, w, h, blobs, pan, grids, detail=1.0):
    xx, yy = grids
    # panning background: 3 color bands of low-frequency sinusoids + a
    # fine texture component (gives the codec real high-frequency
    # content).  ``detail`` scales every high-frequency component: 1.0
    # reproduces the round-3 GOP (~6.7 bpp lossless-PNG, far above the
    # 2-4 bpp of natural 1080p video — artifacts/rd_r3/
    # content_anchor.json); ~0.25 lands in the natural-video entropy
    # band, where the reference's 30+ dB UVG operating points live.
    bx = (xx + pan[0] * t) / w
    by = (yy + pan[1] * t) / h
    img = np.empty((h, w, 3), np.float32)
    img[..., 0] = 0.45 + 0.25 * np.sin(2.1 * np.pi * bx + 1.3) \
        + detail * 0.10 * np.sin(9.0 * np.pi * by + 0.4)
    img[..., 1] = 0.50 + 0.22 * np.sin(1.7 * np.pi * (bx + by) + 2.9) \
        + detail * 0.08 * np.sin(13.0 * np.pi * bx)
    img[..., 2] = 0.40 + 0.28 * np.cos(2.6 * np.pi * by + 0.7) \
        + detail * 0.09 * np.sin(7.0 * np.pi * (bx - by) + 1.1)
    tex = detail * 0.05 * np.sin(80 * np.pi * bx) * np.sin(64 * np.pi * by)
    img += tex[..., None]

    # FORWARD screen displacement of the background CONTENT: the pattern
    # is sampled at (x + pan*t), so a feature's screen position obeys
    # x(t) = c - pan*t and moves at -pan.  (The pre-round-5 sign (+pan)
    # was the sampling-window velocity — opposite to the content motion
    # the optical loss matches against (xy2 - xy1) - uv, reference
    # utils/loss_utils.py:137; the blob branch below was always correct.)
    flow = np.empty((2, h, w), np.float32)
    flow[0] = -pan[0]
    flow[1] = -pan[1]

    for b in blobs:
        cx, cy = _blob_center(b, t)
        # blobs only touch their 2-sigma bounding box — computing the
        # soft ellipse full-frame is ~6x more work for zero contribution
        r_max = 2.0 * max(b["rx"], b["ry"])
        x0 = max(int(cx - r_max), 0)
        x1 = min(int(cx + r_max) + 1, w)
        y0 = max(int(cy - r_max), 0)
        y1 = min(int(cy + r_max) + 1, h)
        if x0 >= x1 or y0 >= y1:
            continue
        ct, st = np.cos(b["theta"]), np.sin(b["theta"])
        dx = xx[y0:y1, x0:x1] - cx
        dy = yy[y0:y1, x0:x1] - cy
        u = (ct * dx + st * dy) / b["rx"]
        v = (-st * dx + ct * dy) / b["ry"]
        d2 = u * u + v * v
        alpha = np.exp(-2.5 * np.maximum(d2 - 0.55, 0.0)).astype(np.float32)
        alpha[d2 > 4.0] = 0.0
        btex = detail * 0.12 * np.sin(b["tex_f"] * (ct * dx + st * dy)
                                      + b["phase"])
        col = b["color"][None, None, :] + btex[..., None]
        img[y0:y1, x0:x1] = (img[y0:y1, x0:x1] * (1 - alpha[..., None])
                             + col * alpha[..., None])
        cx1, cy1 = _blob_center(b, t + 1)
        sel = alpha > 0.5
        flow[0][y0:y1, x0:x1][sel] = cx1 - cx
        flow[1][y0:y1, x0:x1][sel] = cy1 - cy

    np.clip(img, 0.0, 1.0, out=img)
    return img, flow


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--blobs", type=int, default=10)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--detail", type=float, default=1.0)
    args = ap.parse_args()

    from PIL import Image

    out = pathlib.Path(args.out)
    fdir = out / "frames"
    odir = out / "flow"
    fdir.mkdir(parents=True, exist_ok=True)
    odir.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    blobs = _blob_params(rng, args.blobs, args.width, args.height,
                         args.frames)
    pan = (rng.uniform(-0.6, 0.6), rng.uniform(-0.4, 0.4))
    xx, yy = np.meshgrid(np.arange(args.width, dtype=np.float32),
                         np.arange(args.height, dtype=np.float32))

    for t in range(args.frames):
        png = fdir / f"{t:05d}.png"
        pkl = odir / f"{t:05d}.pkl"
        if png.exists() and (t == args.frames - 1 or pkl.exists()):
            continue  # resume after an interrupted generation
        img, flow = render_frame(t, args.width, args.height, blobs, pan,
                                 (xx, yy), detail=args.detail)
        Image.fromarray((img * 255 + 0.5).astype(np.uint8)).save(
            fdir / f"{t:05d}.png", compress_level=1)
        if t < args.frames - 1:
            with open(pkl, "wb") as f:
                pickle.dump(flow.astype(np.float16), f)
        if t % 50 == 0:
            print(f"frame {t}/{args.frames}", flush=True)
    print("done:", out)


if __name__ == "__main__":
    main()
