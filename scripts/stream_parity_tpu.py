"""On-hardware parity: stream vs mirror rasterizer at a bench-like shape.

The CPU test suite runs the Pallas kernels in interpret mode, which
validates logic but not the Mosaic compilation.  This script composites
the SAME projected scene through both kernel families on the real chip
and prints max abs/rel deviations for the forward images and the
attribute/m2d gradients.  Run before trusting any stream bench number.
"""

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from gsvc_tpu.render.pallas_splat import mirror_composite_attrs
    from gsvc_tpu.render.pallas_stream import (
        concat_stream_bins, stream_composite_attrs,
    )
    from gsvc_tpu.render.splat import (
        RasterSettings, _bin_gaussians, attr_rows_from_proj,
        bin_gaussians_stream, project_gaussians,
    )

    H, W = 512, 1024
    settings = RasterSettings(
        image_height=H, image_width=W, threshold=0.15, tile_h=8,
        tile_w=128, gaussian_cap=512, chunk=128, tiles_per_gaussian=32)
    scale = W / 2
    x_min, y_min = -1.0, -H / W
    rng = np.random.default_rng(0)
    m = 8192

    frames = []
    for f, z in enumerate((0.0, 0.02)):
        xyz = rng.uniform([-0.95, -0.45, -0.1], [0.95, 0.45, 0.1],
                          (m, 3)).astype(np.float32)
        color = rng.uniform(0, 1, (m, 3)).astype(np.float32)
        opacity = rng.uniform(0.2, 0.9, (m, 1)).astype(np.float32)
        scaling = rng.uniform(0.005, 0.04, (m, 3)).astype(np.float32)
        rot = rng.normal(size=(m, 4)).astype(np.float32)
        rot[:, 0] += 2.0
        valid = jnp.ones(m, bool)
        proj = project_gaussians(
            jnp.asarray(xyz), jnp.asarray(scaling), jnp.asarray(rot),
            valid, z, x_min, y_min, scale, settings)
        op = jnp.where(proj.valid[:, None], jnp.asarray(opacity), 0.0)
        attrs = attr_rows_from_proj(proj, op, jnp.asarray(color))
        frames.append((proj, attrs))

    attrs = jnp.stack([a for _, a in frames])
    lists, counts, sbs = [], [], []
    for proj, _ in frames:
        tl, cnt, _, _, _ = _bin_gaussians(proj, settings)
        lists.append(tl)
        counts.append(cnt)
        sbs.append(bin_gaussians_stream(proj, settings))
    lists = jnp.stack(lists)
    counts = jnp.stack(counts)
    sids, blk_tile, blk_cc, nblk = concat_stream_bins(sbs, settings)
    m2d = jnp.zeros((4, m, 2))
    cot = jax.random.normal(
        jax.random.PRNGKey(7),
        (4 * settings.n_tiles, 4, settings.tile_h * settings.tile_w))

    @jax.jit
    def run_mirror(a, m2d_):
        def loss(a_, m2d__):
            return jnp.sum(mirror_composite_attrs(
                settings, a_, lists, counts, m2d__) * cot)
        out = mirror_composite_attrs(settings, a, lists, counts, m2d_)
        g = jax.grad(loss, argnums=(0, 1))(a, m2d_)
        return out, g

    @jax.jit
    def run_stream(a, m2d_):
        def loss(a_, m2d__):
            return jnp.sum(stream_composite_attrs(
                settings, a_, sids, blk_tile, blk_cc, nblk, m2d__) * cot)
        out = stream_composite_attrs(settings, a, sids, blk_tile, blk_cc,
                                     nblk, m2d_)
        g = jax.grad(loss, argnums=(0, 1))(a, m2d_)
        return out, g

    out_m, (ga_m, gm_m) = run_mirror(attrs, m2d)
    out_s, (ga_s, gm_s) = run_stream(attrs, m2d)

    def diff(a, b):
        a = np.asarray(a)
        b = np.asarray(b)
        d = np.abs(a - b)
        den = np.maximum(np.abs(a), 1e-3)
        return {"max_abs": float(d.max()),
                "max_rel": float((d / den).max())}

    report = {
        "n_binned": int(np.asarray(counts).sum()),
        "out4": diff(out_m, out_s),
        "d_attrs": diff(ga_m, ga_s),
        "d_m2d": diff(gm_m, gm_s),
        # per-attribute breakdown (mux,muy,cona,conb,conc,op,r,g,b):
        # pinpoints which gradient ROW of the stream backward is off
        "d_attrs_by_col": [
            diff(np.asarray(ga_m)[..., i], np.asarray(ga_s)[..., i])
            for i in range(ga_m.shape[-1])],
    }
    # forward images are bitwise-equal in practice (identical chunk op
    # sequence); gradients agree only to f32 accumulation noise — the
    # XLA scatter-add reduction tree differs between the two layouts
    # (measured ~1e-3 rel on CPU at 256 gaussians).  A real indexing or
    # view-sign bug shows as O(1) relative error.
    report["ok"] = (report["out4"]["max_abs"] < 1e-4
                    and report["d_attrs"]["max_rel"] < 5e-3
                    and report["d_m2d"]["max_rel"] < 5e-3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
