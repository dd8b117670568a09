"""Generate a REAL-TEXTURE panning GOP with exact optical flow.

The synthetic GOP family (make_synth_gop.py) turned out to be
transform-codec-easy despite its PNG entropy: AVIF reaches ~40 dB at
0.019 bpp on the detail=0.25 GOP (artifacts/rd_r5/modern_anchor.json),
so its PSNR band cannot separate content difficulty from codec quality.
This generator builds video from the REAL PHOTOGRAPHS baked into this
zero-egress image (sklearn's china.jpg / flower.jpg, matplotlib's
grace_hopper.jpg — actual camera captures with natural spectra, sensor
noise, foliage/architecture/skin texture):

  * the photos are mirror-tiled at NATIVE resolution (no upscaling)
    into a canvas larger than the target frame;
  * a smooth sinusoidal camera pan samples 1920x1080 windows with
    subpixel bilinear warps (cv2.warpAffine — one resample per frame,
    uniform over the image, like any real pan);
  * per-pair forward flow is the analytic pan delta (uniform field) in
    the same float16 pickle contract as make_synth_gop.py
    (frame_cube/frame.py flow loading).

Texture repetition from tiling is disclosed: intra codecs without
block-copy (JPEG/WEBP/VP9-intra) cannot exploit it; our splat codec
does not share gaussians across positions either.

    python scripts/make_realtex_gop.py --out /root/data/goptex \
        --width 1920 --height 1080 --frames 600
"""

from __future__ import annotations

import argparse
import pathlib
import pickle

import numpy as np

PHOTOS = [
    "/opt/venv/lib/python3.12/site-packages/sklearn/datasets/images/china.jpg",
    "/opt/venv/lib/python3.12/site-packages/sklearn/datasets/images/flower.jpg",
    "/opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/"
    "sample_data/grace_hopper.jpg",
]


def _mirror_row(img: np.ndarray, width: int) -> np.ndarray:
    """Tile ``img`` horizontally to >= width, alternating x-flips so the
    seams are continuous (no step edges a codec could latch onto)."""
    tiles, flip = [], False
    w = 0
    while w < width:
        tiles.append(img[:, ::-1] if flip else img)
        w += img.shape[1]
        flip = not flip
    return np.concatenate(tiles, axis=1)[:, :width]


def build_canvas(width: int, height: int) -> np.ndarray:
    from PIL import Image

    imgs = [np.asarray(Image.open(p).convert("RGB")) for p in PHOTOS]
    rows, flip = [], False
    h = 0
    i = 0
    while h < height:
        img = imgs[i % len(imgs)]
        row = _mirror_row(img[::-1] if flip else img, width)
        rows.append(row)
        h += row.shape[0]
        i += 1
        flip = not flip
    return np.concatenate(rows, axis=0)[:height].astype(np.float32) / 255.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--margin", type=int, default=160)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    import cv2
    from PIL import Image

    out = pathlib.Path(args.out)
    fdir = out / "frames"
    odir = out / "flow"
    fdir.mkdir(parents=True, exist_ok=True)
    odir.mkdir(parents=True, exist_ok=True)

    m = args.margin
    canvas = build_canvas(args.width + 2 * m, args.height + 2 * m)
    t_n = args.frames
    rng = np.random.default_rng(args.seed)
    ph = rng.uniform(0, 2 * np.pi, 2)
    ax, ay = 0.9 * m, 0.85 * m

    def offset(t: float):
        # two incommensurate sinusoids: smooth, bounded, non-repeating pan
        return (ax * np.sin(2 * np.pi * 1.25 * t / t_n + ph[0]),
                ay * np.sin(2 * np.pi * 0.75 * t / t_n + ph[1]))

    for t in range(t_n):
        png = fdir / f"{t:05d}.png"
        pkl = odir / f"{t:05d}.pkl"
        if png.exists() and (t == t_n - 1 or pkl.exists()):
            continue  # resume after an interrupted generation
        ox, oy = offset(t)
        mat = np.float32([[1, 0, -(m + ox)], [0, 1, -(m + oy)]])
        frame = cv2.warpAffine(canvas, mat, (args.width, args.height),
                               flags=cv2.INTER_LINEAR)
        Image.fromarray((frame * 255 + 0.5).astype(np.uint8)).save(
            png, compress_level=1)
        if t < t_n - 1:
            ox1, oy1 = offset(t + 1)
            flow = np.empty((2, args.height, args.width), np.float16)
            # pixel content moves OPPOSITE to the sampling-window motion
            flow[0] = -(ox1 - ox)
            flow[1] = -(oy1 - oy)
            with open(pkl, "wb") as f:
                pickle.dump(flow, f)
        if t % 50 == 0:
            print(f"frame {t}/{t_n}", flush=True)
    print("done:", out)


if __name__ == "__main__":
    main()
