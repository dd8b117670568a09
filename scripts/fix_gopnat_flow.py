"""Regenerate the gopnat flow pickles with the corrected background sign.

make_synth_gop.py (pre-round-5) stored the background flow as +pan (the
sampling-window velocity); the content's forward screen displacement —
what the optical loss matches, reference utils/loss_utils.py:137 — is
-pan.  Flow is pure geometry (uniform background + blob velocity inside
each blob's alpha>0.5 ellipse), so the pickles can be rebuilt without
re-rendering frames.  Blob regions are bit-identical to the original
generator's (same rng stream, same alpha formula); only the background
sign flips.  Writes into <gop>/flow_fixed/ (atomic swap is the
caller's move) and cross-checks frame 0 against the original pickle:
blob region equal, background exactly negated.

Usage: python scripts/fix_gopnat_flow.py /root/data/gopnat [detail-args]
"""

from __future__ import annotations

import pathlib
import pickle
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from make_synth_gop import _blob_center, _blob_params  # noqa: E402


def blob_flow_mask(b, t, w, h, xx, yy):
    cx, cy = _blob_center(b, t)
    r_max = 2.0 * max(b["rx"], b["ry"])
    x0 = max(int(cx - r_max), 0)
    x1 = min(int(cx + r_max) + 1, w)
    y0 = max(int(cy - r_max), 0)
    y1 = min(int(cy + r_max) + 1, h)
    if x0 >= x1 or y0 >= y1:
        return None
    ct, st = np.cos(b["theta"]), np.sin(b["theta"])
    dx = xx[y0:y1, x0:x1] - cx
    dy = yy[y0:y1, x0:x1] - cy
    u = (ct * dx + st * dy) / b["rx"]
    v = (-st * dx + ct * dy) / b["ry"]
    d2 = u * u + v * v
    alpha = np.exp(-2.5 * np.maximum(d2 - 0.55, 0.0)).astype(np.float32)
    alpha[d2 > 4.0] = 0.0
    cx1, cy1 = _blob_center(b, t + 1)
    return (y0, y1, x0, x1, alpha > 0.5, cx1 - cx, cy1 - cy)


def main(gop: str, frames=600, w=1920, h=1080, blobs=10, seed=7):
    rng = np.random.default_rng(seed)
    bl = _blob_params(rng, blobs, w, h, frames)
    pan = (rng.uniform(-0.6, 0.6), rng.uniform(-0.4, 0.4))
    print("pan", pan)
    xx, yy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    out = pathlib.Path(gop) / "flow_fixed"
    out.mkdir(exist_ok=True)
    orig_dir = pathlib.Path(gop) / "flow"

    for t in range(frames - 1):
        pklp = out / f"{t:05d}.pkl"
        if pklp.exists():
            continue
        flow = np.empty((2, h, w), np.float32)
        flow[0] = -pan[0]
        flow[1] = -pan[1]
        for b in bl:
            r = blob_flow_mask(b, t, w, h, xx, yy)
            if r is None:
                continue
            y0, y1, x0, x1, sel, fx, fy = r
            flow[0][y0:y1, x0:x1][sel] = fx
            flow[1][y0:y1, x0:x1][sel] = fy
        with open(pklp, "wb") as f:
            pickle.dump(flow.astype(np.float16), f)
        if t == 0:
            orig = pickle.load(open(orig_dir / "00000.pkl", "rb")
                               ).astype(np.float32)
            new = flow.astype(np.float16).astype(np.float32)
            bg = np.isclose(orig[0], np.float16(pan[0]), atol=1e-6) \
                & np.isclose(orig[1], np.float16(pan[1]), atol=1e-6)
            neg_ok = np.allclose(new[:, bg], -orig[:, bg], atol=1e-6)
            blob_ok = np.allclose(new[:, ~bg], orig[:, ~bg], atol=1e-6)
            print(f"frame0 check: bg_frac={bg.mean():.3f} "
                  f"neg_ok={neg_ok} blob_ok={blob_ok}", flush=True)
            assert neg_ok and blob_ok, "rng reproduction mismatch"
        if t % 100 == 0:
            print(f"flow {t}/{frames - 1}", flush=True)
    print("done:", out)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/data/gopnat")
