"""Render one frame from a flagship checkpoint on CPU and diagnose error.

Renders through the repo's real jnp raster path (render_frame_averaged)
in both STE_ENTROPY and FULL_PRECISION modes, reports whole-frame PSNR
vs the ground-truth PNG, the worst tiles, and writes side-by-side PNGs
for visual inspection.

Usage:
  python scripts/render_ckpt_frame.py CKPT CFG_YAML FRAMES_DIR OUT_DIR [frame]
"""

import sys
import pickle

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from gsvc_tpu.config import load_config  # noqa: E402
from gsvc_tpu.models.gaussians import (  # noqa: E402
    AnchorState, GaussianConfig, GenerateMode, ModelState, NetParams,
)
from gsvc_tpu.render.pipeline import render_frame_averaged  # noqa: E402
from gsvc_tpu.render.splat import RasterSettings  # noqa: E402


def main():
    ckpt_path, cfg_path, frames_dir, out_dir = sys.argv[1:5]
    frame_idx = int(sys.argv[5]) if len(sys.argv) > 5 else 300

    with open(ckpt_path, "rb") as f:
        p = pickle.load(f)
    cfg = load_config(cfg_path)
    gcfg = GaussianConfig.from_model_config(cfg.model)
    anchors = AnchorState(**{k: jnp.asarray(v)
                             for k, v in p["anchors"].items()})
    nets = NetParams(**{k: jax.tree.map(jnp.asarray, v)
                        for k, v in p["nets"].items()})
    state = ModelState(anchors=anchors, nets=nets,
                       n_active=jnp.asarray(p["n_active"], jnp.int32),
                       x_bound_min=jnp.asarray(p["x_bound_min"]),
                       x_bound_max=jnp.asarray(p["x_bound_max"]))

    h, w, t = 1080, 1920, 600
    scale = max(h, w, t) / 2
    x_min, y_min = -w / 2 / scale, -h / 2 / scale
    fz = (frame_idx - t / 2) / scale
    settings = RasterSettings(
        image_height=h, image_width=w, threshold=gcfg.threshold,
        kernel_size=gcfg.kernel_size, tile_h=cfg.pipeline.tile_h,
        tile_w=cfg.pipeline.tile_w,
        gaussian_cap=p.get("gaussian_cap", 4096),
        chunk=cfg.pipeline.gaussian_chunk,
        tiles_per_gaussian=p.get("tiles_per_gaussian", 128),
        copy_budget_factor=p.get("copy_budget_factor", 0))
    window_cap = p["window_cap"]
    print(f"ckpt iter={p['iteration']} n_active={p['n_active']} "
          f"frame={frame_idx}")

    from PIL import Image
    gt = np.asarray(Image.open(
        f"{frames_dir}/{frame_idx:05d}.png"), np.float32)[..., :3] / 255.0
    gt_chw = gt.transpose(2, 0, 1)

    import pathlib
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    Image.fromarray((gt * 255).astype(np.uint8)).save(out / "gt.png")

    for mode in (GenerateMode.STE_ENTROPY, GenerateMode.FULL_PRECISION):
        img, _, _ = render_frame_averaged(
            state, gcfg, fz, x_min, y_min, scale, settings, window_cap,
            mode=mode)
        img = np.asarray(img)
        mse = float(np.mean((img - gt_chw) ** 2))
        psnr = -10 * np.log10(max(mse, 1e-10))
        # per-tile error map: where does the error live?
        th, tw = settings.tile_h, settings.tile_w
        err = np.mean((img - gt_chw) ** 2, axis=0)  # [H, W]
        nty, ntx = h // th, w // tw
        tile_mse = err[:nty * th, :ntx * tw].reshape(
            nty, th, ntx, tw).mean(axis=(1, 3))
        tile_psnr = -10 * np.log10(np.maximum(tile_mse, 1e-10))
        print(f"mode={mode.name}: frame PSNR={psnr:.2f} dB | tile PSNR "
              f"p10={np.percentile(tile_psnr, 10):.1f} "
              f"p50={np.percentile(tile_psnr, 50):.1f} "
              f"p90={np.percentile(tile_psnr, 90):.1f} "
              f"worst={tile_psnr.min():.1f}")
        arr = (np.clip(img.transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(out / f"render_{mode.name}.png")
    print(f"wrote renders to {out}")


if __name__ == "__main__":
    main()
