"""Aggregate an RD sweep (artifacts/rd_*/lmbda_*/results.json) into one
rd_curve.json with the published reference curve alongside.

Published points are plot-read from the reference's assets/main.png
(BASELINE.md; UVG dataset — our sweep is on the synthetic 600-frame
1080p GOP, so curves are compared by shape/range, not point-for-point).

Usage: python scripts/aggregate_rd.py artifacts/rd_r3
"""

from __future__ import annotations

import json
import pathlib
import sys

PUBLISHED_UVG = {
    "psnr_bpp": [(0.015, 30.5), (0.022, 31.8), (0.035, 32.6),
                 (0.043, 32.9)],
    "ms_ssim_bpp": [(0.016, 0.914), (0.023, 0.931), (0.034, 0.941),
                    (0.043, 0.943)],
    "source": "/root/reference/assets/main.png (plot-read, +-0.1 dB)",
}


def main(root: str) -> dict:
    rootp = pathlib.Path(root)
    points = []
    for d in sorted(p for p in (list(rootp.glob("lmbda_*"))
                                + list(rootp.glob("natural_*"))
                                + list(rootp.glob("realtex_*")))
                    if p.is_dir()):
        res = d / "results.json"
        if not res.exists():
            print(f"[skip] {d.name}: no results.json (run incomplete)")
            continue
        r = json.loads(res.read_text())
        points.append({
            "lmbda": float(d.name.rsplit("_", 1)[1]),
            # content class: "lmbda" = legacy synthetic GOP; "natural" =
            # detail=0.25 synthetic; "realtex" = mirror-tiled photographs
            # (make_realtex_gop.py).  Curve properties are judged within
            # one class only — cross-class bpp/psnr are incomparable.
            "content": d.name.rsplit("_", 1)[0],
            "bpp": r.get("bpp"),
            "psnr": r.get("decoded_psnr"),
            "ms_ssim": r.get("decoded_ms_ssim"),
            "lpips": r.get("decoded_lpips"),
            "lpips_kind": r.get("lpips_kind"),
            "n_anchors": r.get("n_anchors"),
            "encode_seconds": r.get("encode_seconds"),
            "decode_seconds": r.get("decode_seconds"),
            "decode_fps": r.get("decode_fps"),
            "size_mb": r.get("size_mb"),
            "iterations": r.get("iterations"),
            # bracket points: warm-started fine-tunes w/ strided eval
            # (artifacts/rd_r3/README.md) — absent on full fits
            "eval_stride": r.get("eval_stride"),
            "eval_frames": r.get("eval_frames"),
        })
    points.sort(key=lambda p: (p["content"], p["lmbda"]))

    # monotonicity along the sweep, per content class: higher lambda =>
    # lower rate; higher bpp => higher (or equal) psnr
    def _mono(cls):
        pts = [p for p in points if p["content"] == cls]
        rate = all(pts[i]["bpp"] >= pts[i + 1]["bpp"]
                   for i in range(len(pts) - 1)
                   if pts[i]["bpp"] and pts[i + 1]["bpp"])
        by_bpp = sorted((p for p in pts if p["bpp"] and p["psnr"]),
                        key=lambda p: p["bpp"])
        psnr = all(by_bpp[i]["psnr"] <= by_bpp[i + 1]["psnr"]
                   for i in range(len(by_bpp) - 1))
        return rate, psnr

    classes = sorted({p["content"] for p in points})
    mono_rate = all(_mono(c)[0] for c in classes)
    mono_psnr = all(_mono(c)[1] for c in classes)

    strides = {p.get("eval_stride") for p in points}
    # content-difficulty anchors measured on the same frames
    # (scripts/content_anchor.py / modern_anchor.py) — the realtex class
    # is the meaningful comparison class, see README "Evaluation content"
    anchors = {}
    for cls, fname in (("natural", "natural_anchor.json"),
                       ("realtex", "realtex_anchor.json"),
                       ("realtex_modern", "realtex_modern.json")):
        f = rootp / fname
        if f.exists():
            anchors[cls] = json.loads(f.read_text())
    out = {
        "points": points,
        # one shared eval protocol across all curve points (VERDICT r4
        # item 9): every round-5 fit evaluates at eval_stride 2
        "eval_protocol": ({"eval_stride": strides.pop()}
                          if len(strides) == 1
                          else {"MIXED_STRIDES": sorted(
                              strides, key=lambda s: (s is None, s))}),
        "monotone_rate_in_lambda": mono_rate,
        "monotone_psnr_in_bpp": mono_psnr,
        "content_anchors": anchors,
        "published_reference": PUBLISHED_UVG,
    }
    (rootp / "rd_curve.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "artifacts/rd_r3")
