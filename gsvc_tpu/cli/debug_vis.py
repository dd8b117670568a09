"""Eval/debug visualization CLI — parity with the reference's
pipeline/eval.py:70-226 debug path, redesigned headless:

  * ``gaussians_xy_<f>.png`` — scatter of the frame's visible gaussian
    xy positions in NDC (reference: eval.py:180-190 plt.scatter of
    xyz[radii > 0]);
  * ``flow_scatter_<f>.png`` — gaussians matched between frames f and
    f+1, scattered at their pixel positions and colored by their own
    screen motion through the Middlebury wheel (reference:
    eval.py:70-100 via optical_flow_utils.flow_to_image);
  * ``flow_field_<f>.png`` — the dataset's flow field itself, colored
    with the same wheel (ground truth to compare the scatter against).

Usage:
    python -m gsvc_tpu.cli.debug_vis --model_path out/ --checkpoint
        out/chkpnt15000.pkl --source_path frames/ [--frame 0]
"""

from __future__ import annotations

import pathlib

import numpy as np

from gsvc_tpu.cli.common import base_parser, resolve_config


def _scatter_png(path, xs, ys, colors, extent, size_px=800, dot=2,
                 bg=255):
    """Rasterize a scatter plot to PNG without a display server."""
    from PIL import Image

    x0, x1, y0, y1 = extent
    h = int(size_px * (y1 - y0) / max(x1 - x0, 1e-9))
    img = np.full((h, size_px, 3), bg, np.uint8)
    if len(xs):
        px = ((np.asarray(xs) - x0) / (x1 - x0) * (size_px - 1)).astype(int)
        py = ((np.asarray(ys) - y0) / (y1 - y0) * (h - 1)).astype(int)
        keep = (px >= 0) & (px < size_px) & (py >= 0) & (py < h)
        px, py = px[keep], py[keep]
        cols = np.asarray(colors, np.uint8)
        cols = cols[keep] if cols.ndim == 2 else \
            np.broadcast_to(cols, (keep.sum(), 3))
        for dy in range(dot):
            for dx in range(dot):
                yy = np.clip(py + dy, 0, h - 1)
                xx = np.clip(px + dx, 0, size_px - 1)
                img[yy, xx] = cols
    Image.fromarray(img).save(path)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    p = base_parser("gsvc-debug-vis: gaussian/flow scatter debug renders")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--frame", type=int, default=0)
    p.add_argument("--out", type=str, default=None,
                   help="output dir (default <model_path>/debug_vis)")
    args = p.parse_args(argv)
    cfg = resolve_config(args)

    from gsvc_tpu.framecube import FrameCubeDataset
    from gsvc_tpu.models.gaussians import GenerateMode
    from gsvc_tpu.render.pipeline import render_frame
    from gsvc_tpu.train.fit import GOPFitter
    from gsvc_tpu.train.trainer import _align_to_window1
    from gsvc_tpu.utils.checkpoint import load_checkpoint
    from gsvc_tpu.utils.flow_viz import flow_to_image

    ds = FrameCubeDataset(cfg.pipeline.source_path,
                          cfg.pipeline.optical_path or None)
    fitter = GOPFitter(cfg, ds, seed=args.seed)
    load_checkpoint(args.checkpoint, fitter)

    out = pathlib.Path(args.out or
                       f"{cfg.pipeline.model_path}/debug_vis")
    out.mkdir(parents=True, exist_ok=True)

    f = args.frame
    z1 = fitter.frame_zs[f]
    z2 = fitter.frame_zs[min(f + 1, ds.num_frames - 1)]
    k = fitter.gcfg.n_offsets

    r1 = render_frame(fitter.state, fitter.gcfg, z1, ds.x_min, ds.y_min,
                      ds.scale, fitter.settings, fitter.window_cap,
                      GenerateMode.FULL_PRECISION)
    r2 = render_frame(fitter.state, fitter.gcfg, z2, ds.x_min, ds.y_min,
                      ds.scale, fitter.settings, fitter.window_cap,
                      GenerateMode.FULL_PRECISION)

    # 1. visible-gaussian xy scatter (NDC), eval.py:180-190
    xyz = np.asarray(r1.gaussians.xyz)
    vis = np.asarray(r1.radii) > 0
    _scatter_png(out / f"gaussians_xy_{f}.png", xyz[vis, 0], xyz[vis, 1],
                 np.array([30, 90, 200], np.uint8),
                 (ds.x_min, -ds.x_min, ds.y_min, -ds.y_min))

    # 2. matched-gaussian motion scatter, colored like the flow wheel
    rows = r1.selection_mask.shape[0]
    shift = int(r2.window_start) - int(r1.window_start)
    xy1 = np.asarray((r1.gaussians.anchor_xyz
                      + r1.gaussians.offsets_world)[:, :2])
    xy2_w2 = (r2.gaussians.anchor_xyz + r2.gaussians.offsets_world)[:, :2]
    xy2 = np.asarray(_align_to_window1(
        jnp.asarray(xy2_w2), jnp.asarray(shift * k), rows))
    valid2 = np.asarray(_align_to_window1(
        r2.selection_mask.astype(jnp.float32),
        jnp.asarray(shift * k), rows)) > 0.5
    common = np.asarray(r1.selection_mask) & valid2

    pix = np.round((xy1 - np.array([[ds.x_min, ds.y_min]])) * ds.scale)
    in_b = ((pix[:, 0] >= 0) & (pix[:, 0] < ds.width)
            & (pix[:, 1] >= 0) & (pix[:, 1] < ds.height))
    m = common & in_b
    uv = (xy2 - xy1) * ds.scale           # screen motion in pixels
    cols = flow_to_image(uv[m, 0][None], uv[m, 1][None])[0]  # [n, 3]
    _scatter_png(out / f"flow_scatter_{f}.png", pix[m, 0], pix[m, 1],
                 cols, (0, ds.width, 0, ds.height))

    # 3. the dataset flow field through the same wheel
    if ds.flows is not None:
        fl = np.asarray(ds.flows[min(f, len(ds.flows) - 1)])
        from PIL import Image

        Image.fromarray(flow_to_image(fl[0], fl[1])).save(
            out / f"flow_field_{f}.png")

    print(f"debug renders written to {out}")


if __name__ == "__main__":
    main()
