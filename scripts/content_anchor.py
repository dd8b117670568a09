"""Content-difficulty anchor for the synthetic GOP (CPU-only).

The flagship RD point (artifacts/rd_r3) lives on synthetic content
whose intrinsic complexity has no published anchor (VERDICT r3,
"Real-content evaluation"): the reference reports 30.5-32.9 dB at
0.015-0.043 bpp on UVG, but UVG frames do not exist in this zero-egress
image, so the absolute PSNR bands are not comparable.  This script
quantifies the gap on OUR content with classical codecs:

* lossless PNG bits/pixel over sampled frames — an entropy proxy
  (natural 1080p video frames are ~2-4 bpp; high-frequency synthetic
  texture is harder);
* a JPEG quality sweep (PSNR vs bpp, intra-only) — what a classical
  transform codec achieves per frame on the same pixels.  JPEG has no
  temporal model, so the comparison point for a video codec at rate r
  bpp is JPEG at r (it cannot reach the flagship's 0.0126 bpp at all —
  its quality floor sits orders of magnitude higher in rate).

Writes artifacts/rd_r3/content_anchor.json.

Usage: python scripts/content_anchor.py [frames_dir] [out_json]
"""

from __future__ import annotations

import io
import json
import pathlib
import sys

import numpy as np
from PIL import Image


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(10 * np.log10(255.0 ** 2 / mse))


def main(frames_dir: str, out_json: str) -> dict:
    fdir = pathlib.Path(frames_dir)
    frames = sorted(p for p in fdir.iterdir()
                    if p.suffix.lower() == ".png")
    n = len(frames)
    sample = [frames[i] for i in (0, n // 4, n // 2, 3 * n // 4)]

    png_bpp = []
    jpeg_curve = {q: {"bpp": [], "psnr": []}
                  for q in (1, 5, 10, 25, 50, 75, 90)}
    for p in sample:
        img = Image.open(p).convert("RGB")
        w, h = img.size
        arr = np.asarray(img)
        # re-encode with optimize=True: the GOP generator writes
        # compress_level=1 (fast) PNGs, whose on-disk size over-states
        # intrinsic entropy by ~1.6x (the r4 5.28 bpp "above band"
        # reading came from measuring those files)
        pbuf = io.BytesIO()
        img.save(pbuf, "PNG", optimize=True)
        png_bpp.append(pbuf.tell() * 8 / (w * h))
        for q, acc in jpeg_curve.items():
            buf = io.BytesIO()
            img.save(buf, "JPEG", quality=q)
            dec = np.asarray(Image.open(io.BytesIO(buf.getvalue()))
                             .convert("RGB"))
            acc["bpp"].append(buf.tell() * 8 / (w * h))
            acc["psnr"].append(psnr(arr, dec))

    out = {
        "frames_sampled": [p.name for p in sample],
        "png_lossless_bpp": {
            "mean": float(np.mean(png_bpp)),
            "per_frame": [round(v, 3) for v in png_bpp],
            "note": "natural 1080p video frames are typically ~2-4 bpp "
                    "lossless-PNG (optimize=True re-encode)",
        },
        "jpeg_rd": [
            {"quality": q,
             "bpp": float(np.mean(acc["bpp"])),
             "psnr": float(np.mean(acc["psnr"]))}
            for q, acc in sorted(jpeg_curve.items())
        ],
        "flagship_point": {"bpp": 0.012617766203703704, "psnr": 23.25,
                           "source": "lmbda_0.004/results.json "
                                     "(temporal model, whole GOP)"},
    }
    pathlib.Path(out_json).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/data/gop600/frames",
         sys.argv[2] if len(sys.argv) > 2
         else "artifacts/rd_r3/content_anchor.json")
