"""Modern-codec content anchors for the natural GOP (CPU-only).

VERDICT r4 weak-item 4 called the per-frame JPEG anchor a weak bound
for the "content-bound" question ("a temporal codec should beat
per-frame JPEG").  This script adds the strongest codecs available in
this zero-egress image (no ffmpeg binary; OpenCV carries the encoders):

* **AVIF** (AV1 intra, libavif via cv2.imencode) quality sweep — a
  state-of-the-art still codec whose low end reaches ~0.01-0.03 bpp at
  1080p, i.e. INSIDE the flagship's operating band, unlike JPEG whose
  rate floor is ~0.13 bpp;
* **WEBP** (VP8 intra) sweep — floor ~0.04 bpp;
* **VP9 / VP8 / MPEG-4** temporal encodes (cv2.VideoWriter) of a
  consecutive-frame prefix at the wrapper's default rate control (the
  cv2 API exposes no CRF/bitrate knob — VIDEOWRITER_PROP_QUALITY is
  ignored by the ffmpeg backend, verified) — real inter-frame anchors,
  each contributing one (bpp, psnr) point.

Writes artifacts/rd_r5/modern_anchor.json.

Usage: python scripts/modern_anchor.py [frames_dir] [out_json] [n_temporal]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(10 * np.log10(255.0 ** 2 / mse))


def main(frames_dir: str, out_json: str, n_temporal: int = 60) -> dict:
    import cv2

    fdir = pathlib.Path(frames_dir)
    frames = sorted(p for p in fdir.iterdir()
                    if p.suffix.lower() == ".png")
    n = len(frames)
    sample = [frames[i] for i in (0, n // 4, n // 2, 3 * n // 4)]

    # ---- intra sweeps on sampled frames
    intra = {}
    sweeps = {
        "avif": (".avif", cv2.IMWRITE_AVIF_QUALITY, (1, 5, 10, 20, 35, 50)),
        "webp": (".webp", cv2.IMWRITE_WEBP_QUALITY, (1, 5, 20, 50)),
    }
    for name, (ext, flag, quals) in sweeps.items():
        curve = []
        for q in quals:
            bpps, psnrs = [], []
            for p in sample:
                img = cv2.imread(str(p))
                h, w = img.shape[:2]
                ok, buf = cv2.imencode(ext, img, [flag, q])
                if not ok:
                    continue
                dec = cv2.imdecode(buf, cv2.IMREAD_COLOR)
                bpps.append(len(buf) * 8 / (w * h))
                psnrs.append(psnr(img, dec))
            if bpps:
                curve.append({"quality": q,
                              "bpp": float(np.mean(bpps)),
                              "psnr": float(np.mean(psnrs))})
        intra[name] = curve
        print(json.dumps({name: curve}), flush=True)

    # ---- temporal encodes on a consecutive prefix
    temporal = {}
    k = min(n_temporal, n)
    originals = [cv2.imread(str(p)) for p in frames[:k]]
    h, w = originals[0].shape[:2]
    for cc, container in (("VP90", ".webm"), ("VP80", ".webm"),
                          ("mp4v", ".mp4")):
        path = f"/tmp/anchor_{cc}{container}"
        t0 = time.time()
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*cc), 30.0,
                             (w, h))
        if not wr.isOpened():
            temporal[cc] = {"error": "encoder failed to open"}
            continue
        for f in originals:
            wr.write(f)
        wr.release()
        size = pathlib.Path(path).stat().st_size
        cap = cv2.VideoCapture(path)
        psnrs = []
        for f in originals:
            ok, dec = cap.read()
            if not ok:
                break
            psnrs.append(psnr(f, dec))
        cap.release()
        temporal[cc] = {
            "frames": len(psnrs),
            "bpp": float(size * 8 / (w * h * k)),
            "psnr": float(np.mean(psnrs)) if psnrs else None,
            "encode_seconds": round(time.time() - t0, 1),
            "note": "cv2 default rate control (no CRF knob exposed)",
        }
        print(json.dumps({cc: temporal[cc]}), flush=True)

    out = {
        "frames_sampled": [p.name for p in sample],
        "temporal_prefix_frames": k,
        "intra_rd": intra,
        "temporal_rd": temporal,
    }
    pathlib.Path(out_json).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/data/gopnat/frames",
         sys.argv[2] if len(sys.argv) > 2
         else "artifacts/rd_r5/modern_anchor.json",
         int(sys.argv[3]) if len(sys.argv) > 3 else 60)
