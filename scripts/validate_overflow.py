"""Empirically validate the 'overflow drops are harmless' claim.

The fitter logs "dropped rows are saturated-transmittance tails
(T < e^-16) — no quality impact" whenever render overflow persists at
gaussian_cap=4096 (train/fit.py:_react_to_overflow).  That claim derives
from NOTES_ROUND3.md: every *composited* alpha is >= 1/255, so after
4096 rows transmittance < (1-1/255)^4096 ~ e^-16.  The flaw: rows are
binned per TILE (a gaussian whose footprint touches any pixel of the
tile occupies a row), but at a given PIXEL most rows contribute alpha
< 1/255 and are zeroed (splat.py:_composite_tile).  Per-pixel
transmittance after 4096 rows can therefore be ~1 and the dropped
(deepest) rows fully visible.

This script measures the truth offline from a flagship checkpoint, on
CPU, without touching the TPU:

  1. rebuild the model state from chkpnt*.pkl;
  2. generate the neural gaussians of one frame window (STE_ENTROPY);
  3. re-run the exact binning geometry in numpy WITHOUT the per-tile cap;
  4. for every overflowed tile, composite capped-at-4096 vs uncapped and
     report: per-pixel T at the cap boundary, image delta, and PSNR vs
     the ground-truth frame for both variants.

Usage:
  python scripts/validate_overflow.py CKPT CFG_YAML FRAMES_DIR [frame_idx]
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
    generate_neural_gaussians, window_for_frame,
)
from gsvc_tpu.render.splat import (  # noqa: E402
    ALPHA_MAX, ALPHA_MIN, RasterSettings, T_EPS, project_gaussians,
)


def main():
    ckpt_path = sys.argv[1]
    cfg_path = sys.argv[2]
    frames_dir = sys.argv[3]
    frame_idx = int(sys.argv[4]) if len(sys.argv) > 4 else 300

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
    cap = settings.gaussian_cap
    window_cap = p["window_cap"]
    print(f"ckpt iter={p['iteration']} n_active={p['n_active']} "
          f"window_cap={window_cap} gaussian_cap={cap} "
          f"tpg={settings.tiles_per_gaussian} frame={frame_idx} z={fz:.4f}")

    start, in_window = window_for_frame(state, gcfg, fz, window_cap)
    gss = generate_neural_gaussians(
        state, gcfg, frame_z=fz, cam_z=fz, window_start=start,
        in_window=in_window, cap=window_cap,
        mode=GenerateMode.STE_ENTROPY)
    proj = project_gaussians(gss.xyz, gss.scaling, gss.rot, gss.valid,
                             fz, x_min, y_min, scale, settings, flip=False)

    mean2d = np.asarray(proj.mean2d)
    conic = np.asarray(proj.conic)
    depth = np.asarray(proj.depth)
    radius = np.asarray(proj.radius)
    valid = np.asarray(proj.valid)
    op = np.where(valid, np.asarray(gss.opacity)[:, 0], 0.0)
    col = np.asarray(gss.color)
    m = mean2d.shape[0]
    print(f"window rows={m} valid={valid.sum()}")

    # ---- exact binning geometry (splat.py:_bin_gaussians), unbounded ----
    rank_bits = 18
    thr = settings.threshold
    rank = np.clip((depth + thr) * ((2 ** rank_bits - 1) / (2 * thr)),
                   0, 2 ** rank_bits - 1).astype(np.int64)
    x, y, r = mean2d[:, 0], mean2d[:, 1], radius
    tx0 = np.clip(np.floor((x - r) / settings.tile_w), 0,
                  settings.n_tiles_x - 1).astype(np.int64)
    tx1 = np.clip(np.floor((x + r) / settings.tile_w), 0,
                  settings.n_tiles_x - 1).astype(np.int64)
    ty0 = np.clip(np.floor((y - r) / settings.tile_h), 0,
                  settings.n_tiles_y - 1).astype(np.int64)
    ty1 = np.clip(np.floor((y + r) / settings.tile_h), 0,
                  settings.n_tiles_y - 1).astype(np.int64)
    wx, wy = tx1 - tx0 + 1, ty1 - ty0 + 1
    n_cover = np.where(valid, wx * wy, 0)
    clipped = np.maximum(n_cover - settings.tiles_per_gaussian, 0).sum()

    gid = np.repeat(np.arange(m), n_cover)
    local = np.arange(n_cover.sum()) - np.repeat(
        np.cumsum(n_cover) - n_cover, n_cover)
    dy = local // wx[gid]
    dx = local - dy * wx[gid]
    tile_id = (ty0[gid] + dy) * settings.n_tiles_x + (tx0[gid] + dx)
    order = np.lexsort((rank[gid], tile_id))
    tile_sorted = tile_id[order]
    gauss_sorted = gid[order]
    counts = np.bincount(tile_sorted, minlength=settings.n_tiles)
    bounds = np.concatenate([[0], np.cumsum(counts)])

    n_over = int((counts > cap).sum())
    dropped = np.maximum(counts - cap, 0).sum()
    print(f"tiles={settings.n_tiles} overflowed={n_over} "
          f"copies={counts.sum()} dropped={dropped} "
          f"coverage_clipped={clipped}")
    print("tile-count percentiles:",
          {q: int(np.percentile(counts, q)) for q in (50, 90, 99, 100)})

    # ---- composite overflowed tiles capped vs uncapped ----
    gt = None
    try:
        from PIL import Image
        gt = np.asarray(Image.open(
            f"{frames_dir}/{frame_idx:05d}.png"), np.float32) / 255.0
    except Exception as e:  # noqa: BLE001
        print("no GT frame:", e)

    th, tw = settings.tile_h, settings.tile_w
    ys_l = np.arange(th, dtype=np.float32)[:, None]
    xs_l = np.arange(tw, dtype=np.float32)[None, :]

    def composite(ids, limit):
        img = np.zeros((th, tw, 3), np.float32)
        t_acc = np.ones((th, tw), np.float32)
        for g in ids[:limit]:
            d0 = px0 + xs_l - mean2d[g, 0]
            d1 = py0 + ys_l - mean2d[g, 1]
            q = (conic[g, 0] * d0 * d0 + 2 * conic[g, 1] * d0 * d1
                 + conic[g, 2] * d1 * d1)
            a = np.minimum(op[g] * np.exp(-0.5 * q), ALPHA_MAX)
            a = np.where(a >= ALPHA_MIN, a, 0.0)
            live = t_acc >= T_EPS
            img += (np.where(live, a * t_acc, 0.0))[..., None] * col[g]
            t_acc *= np.where(live, 1.0 - a, 1.0)
        return img, t_acc

    over_tiles = np.argsort(counts)[::-1]
    over_tiles = over_tiles[counts[over_tiles] > cap]
    sample = over_tiles[:48]
    t_at_cap_all, deltas, psnr_cap, psnr_full = [], [], [], []
    for tid in sample:
        ti_y, ti_x = divmod(int(tid), settings.n_tiles_x)
        py0, px0 = ti_y * th, ti_x * tw
        ids = gauss_sorted[bounds[tid]:bounds[tid + 1]]
        img_cap, t_cap_map = composite(ids, cap)
        img_full, _ = composite(ids, len(ids))
        t_at_cap_all.append(t_cap_map)
        deltas.append(np.abs(img_cap - img_full))
        if gt is not None and py0 + th <= h and px0 + tw <= w:
            g_tile = gt[py0:py0 + th, px0:px0 + tw, :3]
            mse_c = np.mean((img_cap - g_tile) ** 2)
            mse_f = np.mean((img_full - g_tile) ** 2)
            psnr_cap.append(-10 * np.log10(max(mse_c, 1e-10)))
            psnr_full.append(-10 * np.log10(max(mse_f, 1e-10)))

    t_at_cap = np.stack(t_at_cap_all)
    deltas = np.stack(deltas)
    print(f"\n== overflowed-tile audit (n={len(sample)}) ==")
    print("per-pixel T after cap rows: "
          f"median={np.median(t_at_cap):.3e} "
          f"p90={np.percentile(t_at_cap, 90):.3e} "
          f"max={t_at_cap.max():.3e} "
          f"frac>e^-16={np.mean(t_at_cap > np.exp(-16)):.3f} "
          f"frac>0.01={np.mean(t_at_cap > 0.01):.3f}")
    print(f"|capped-uncapped| image delta: mean={deltas.mean():.4e} "
          f"p99={np.percentile(deltas, 99):.4e} max={deltas.max():.4e}")
    if psnr_cap:
        print(f"tile PSNR vs GT: capped={np.mean(psnr_cap):.2f} dB "
              f"uncapped={np.mean(psnr_full):.2f} dB "
              f"(delta={np.mean(psnr_full) - np.mean(psnr_cap):+.2f} dB "
              f"over {len(psnr_cap)} tiles)")
    frac_area = n_over / settings.n_tiles
    mse_extra = float(np.mean(deltas ** 2))
    print(f"overflowed tile area fraction={frac_area:.4f}; "
          f"tile-local MSE(cap vs full)={mse_extra:.3e}")

    # ---- candidate-cap sweep: how small can gaussian_cap be? ----------
    # overflow_autogrow grew the flagship to cap=4096, but if per-pixel T
    # already saturates by a smaller cap the extra capacity only inflates
    # the [tiles, cap] binning gathers (HBM traffic scales with cap).
    # Sample tiles across the WHOLE above-cap count distribution (tiles
    # barely above the cap are the risky ones, not the mega-pileups).
    print("\n== candidate-cap sweep ==")
    for cand in (512, 1024, 2048, 4096):
        over = np.argsort(counts)[::-1]
        over = over[counts[over] > cand]
        if len(over) == 0:
            print(f"cap={cand}: no overflowed tiles")
            continue
        stride = max(len(over) // 48, 1)
        samp = over[::stride][:48]
        t_b, dmax, dmean, dpsnr = [], [], [], []
        for tid in samp:
            ti_y, ti_x = divmod(int(tid), settings.n_tiles_x)
            py0, px0 = ti_y * th, ti_x * tw
            ids = gauss_sorted[bounds[tid]:bounds[tid + 1]]
            img_c, t_map = composite(ids, cand)
            img_f, _ = composite(ids, len(ids))
            t_b.append(float(t_map.max()))
            d = np.abs(img_c - img_f)
            dmax.append(float(d.max()))
            dmean.append(float(d.mean()))
            if gt is not None and py0 + th <= h and px0 + tw <= w:
                g_tile = gt[py0:py0 + th, px0:px0 + tw, :3]
                mse_c = np.mean((img_c - g_tile) ** 2)
                mse_f = np.mean((img_f - g_tile) ** 2)
                dpsnr.append(-10 * np.log10(max(mse_f, 1e-10))
                             + 10 * np.log10(max(mse_c, 1e-10)))
        n_over_c = len(over)
        drop_c = int(np.maximum(counts - cand, 0).sum())
        print(f"cap={cand}: tiles_over={n_over_c} dropped={drop_c} "
              f"worst_T_at_cap={max(t_b):.3e} "
              f"delta_max={max(dmax):.3e} delta_mean={np.mean(dmean):.3e} "
              f"psnr_delta={np.mean(dpsnr) if dpsnr else float('nan'):+.3f} dB "
              f"(n={len(samp)} sampled)")


if __name__ == "__main__":
    main()
