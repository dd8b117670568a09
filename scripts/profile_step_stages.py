"""Device-time breakdown of the bench-shape train step, stage by stage.

bench.py reports one number (3.23 it/s at round 3); this script answers
WHERE the ~310 ms per iteration goes so kernel work targets the real
bottleneck.  Uses the CLAUDE.md measurement rules: every stage is looped
N times inside ONE jit (lax.fori_loop over a device-value-dependent
body) and timed by differencing N vs 1 iterations, so axon tunnel RPC
overhead and dispatch cost cancel.

Stages (bench shape: 50k anchors, window_cap 16384, cap 512, 8x128
tiles, chunk 128, 1080p):
  gen        generate_neural_gaussians (one frame, FULL_PRECISION)
  gen_ent    same in ENTROPY mode (hash context + entropy nets + rate)
  project    project_gaussians over the generated set
  bin        _bin_gaussians (the device-wide sort)
  gather     attr_rows_from_proj + gather_tile_planes_rows
  comp_fwd   mirror composite, inference (2 views, one frame)
  comp_pair  mirror composite fwd for a 2-frame pair (4 views)
  comp_vjp   composite fwd+bwd (custom VJP) for the pair incl. the
             gradient scatter-add back to attribute rows
  ssim       L1 + SSIM loss over 4 views (fwd + bwd wrt images)
  adam       adam_update over the full parameter tree
  step       the full train step (make_train_step, K=1 in-jit loop)

Run on the real chip: python scripts/profile_step_stages.py
"""

from __future__ import annotations

import functools
import json
import time

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

    from gsvc_tpu.config import ModelConfig, OptimizationConfig
    from gsvc_tpu.models.gaussians import (
        GaussianConfig, GenerateMode, generate_neural_gaussians,
        init_model, update_anchor_bound, window_for_frame,
    )
    from gsvc_tpu.render.batched import render_pair
    from gsvc_tpu.render.pipeline import make_raster_settings
    from gsvc_tpu.render.splat import (
        _bin_gaussians, attr_rows_from_proj, gather_tile_planes_rows,
        project_gaussians,
    )
    from gsvc_tpu.render.pallas_splat import (
        composite_tiles_inference, mirror_composite_attrs,
    )
    from gsvc_tpu.train.optim import adam_init, adam_update
    from gsvc_tpu.train.schedules import build_schedules
    from gsvc_tpu.train.trainer import init_stats, make_train_step

    on_tpu = jax.default_backend() == "tpu"

    import os
    small = bool(os.environ.get("GSVC_BENCH_SMALL"))
    H, W, T = (96, 128, 8) if small else (1080, 1920, 300)
    scale = max(H, W, T) / 2
    x_min, y_min = -W / 2 / scale, -H / 2 / scale

    mc = ModelConfig(threshold=0.05) if not small else ModelConfig(
        threshold=0.3, anchor_feature_dim=8, n_offsets=4,
        log2=6, log2_2D=7, grid_feature_dim=2,
        resolutions_list=(6, 10), resolutions_list_2D=(12, 20))
    cfg = GaussianConfig.from_model_config(mc)
    rng = np.random.default_rng(0)
    n_anchors = 500 if small else 50_000
    capacity = 512 if small else 51_200
    pts = rng.uniform([x_min, y_min, -T / 2 / scale],
                      [-x_min, -y_min, T / 2 / scale],
                      (n_anchors, 3)).astype(np.float32)
    state = init_model(jax.random.PRNGKey(0), cfg, pts, capacity,
                       voxel_size=0.001)
    state = update_anchor_bound(state, x_min, y_min, -T / 2 / scale)
    window_cap = 256 if small else 16_384
    settings = make_raster_settings(
        cfg, H, W, tile_h=8, tile_w=128,
        gaussian_cap=512 if not small else 64,
        chunk=128 if not small else 64, tiles_per_gaussian=32,
        matmul_dtype=os.environ.get("GSVC_MATMUL_DTYPE", "float32"))
    rasterizer = "pallas_train" if on_tpu else "jnp"

    z0 = jnp.float32(0.0)
    start, in_w = window_for_frame(state, cfg, 0.0, window_cap)

    def timed_loop(make_body, n=16, label=""):
        """make_body(i, carry_scalar) -> scalar; returns seconds/iter."""
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(st, n):
            def body(i, acc):
                return acc + make_body(st, i)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        def t(k):
            float(np.asarray(run(state, k)))
            t0 = time.perf_counter()
            float(np.asarray(run(state, k)))
            return time.perf_counter() - t0

        return (t(n) - t(1)) / (n - 1)

    results = {}

    # --- generation ---------------------------------------------------
    base_key = jax.random.PRNGKey(7)

    def gen_body(st, i, mode):
        k = jax.random.fold_in(base_key, i)
        gss = generate_neural_gaussians(
            st, cfg, frame_z=z0 + 0.0001 * i, cam_z=z0 + 0.0001 * i,
            window_start=start, in_window=in_w, cap=window_cap, mode=mode,
            key=k)
        return gss.xyz[0, 0] + gss.opacity[0, 0]

    results["gen_ms"] = timed_loop(
        lambda st, i: gen_body(st, i, GenerateMode.FULL_PRECISION)) * 1e3
    results["gen_ent_ms"] = timed_loop(
        lambda st, i: gen_body(st, i, GenerateMode.ENTROPY)) * 1e3

    # fixed generated set for the downstream stages
    gss = jax.jit(lambda st: generate_neural_gaussians(
        st, cfg, frame_z=z0, cam_z=z0, window_start=start, in_window=in_w,
        cap=window_cap, mode=GenerateMode.FULL_PRECISION))(state)
    gss = jax.tree.map(lambda x: jax.device_put(x), gss)

    def proj_body(st, i):
        p = project_gaussians(gss.xyz + 1e-6 * i, gss.scaling, gss.rot,
                              gss.valid, z0, x_min, y_min, scale, settings)
        return p.mean2d[0, 0] + p.radius.astype(jnp.float32)[0]

    results["project_ms"] = timed_loop(proj_body) * 1e3

    proj = jax.jit(lambda: project_gaussians(
        gss.xyz, gss.scaling, gss.rot, gss.valid, z0, x_min, y_min, scale,
        settings))()

    def bin_body(st, i):
        p = proj._replace(mean2d=proj.mean2d + 1e-6 * i)
        lists, counts, dropped, ovf, nrend = _bin_gaussians(p, settings)
        return counts.astype(jnp.float32)[0] + lists.astype(jnp.float32)[0, 0]

    results["bin_ms"] = timed_loop(bin_body, n=8) * 1e3

    lists, counts, _, _, _ = jax.jit(
        lambda: _bin_gaussians(proj, settings))()
    op = jnp.where(proj.valid[:, None], gss.opacity, 0.0)

    def gather_body(st, i):
        attrs = attr_rows_from_proj(
            proj._replace(mean2d=proj.mean2d + 1e-6 * i), op, gss.color)
        planes = gather_tile_planes_rows(attrs, lists)
        return planes[0][0, 0]

    results["gather_ms"] = timed_loop(gather_body) * 1e3

    attrs = jax.jit(lambda: attr_rows_from_proj(proj, op, gss.color))()

    def comp_fwd_body(st, i):
        out4 = mirror_composite_attrs(
            settings, (attrs + 1e-6 * i)[None], lists[None], counts[None],
            None)
        return out4[0, 0, 0]

    results["comp_fwd_2v_ms"] = timed_loop(comp_fwd_body, n=8) * 1e3

    # pair shapes (2 frames x 2 views)
    attrs2 = jnp.stack([attrs, attrs])
    lists2 = jnp.stack([lists, lists])
    counts2 = jnp.stack([counts, counts])

    def comp_pair_body(st, i):
        out4 = mirror_composite_attrs(
            settings, attrs2 + 1e-6 * i, lists2, counts2, None)
        return out4[0, 0, 0]

    results["comp_fwd_4v_ms"] = timed_loop(comp_pair_body, n=8) * 1e3

    def comp_vjp_body(st, i):
        def f(a):
            out4 = mirror_composite_attrs(settings, a, lists2, counts2,
                                          None)
            return jnp.sum(out4 * out4)
        v, g = jax.value_and_grad(f)(attrs2 + 1e-6 * i)
        return v + g[0, 0, 0]

    results["comp_vjp_4v_ms"] = timed_loop(comp_vjp_body, n=8) * 1e3

    # --- loss stage: L1 + SSIM on 4 views, fwd+bwd wrt images ----------
    from gsvc_tpu.metrics.losses import l1_loss, ssim

    gt = jnp.asarray(rng.uniform(0, 1, (4, 3, H, W)), jnp.float32)
    imgs0 = jnp.asarray(rng.uniform(0, 1, (4, 3, H, W)), jnp.float32)

    def loss_body(st, i):
        def f(im):
            tot = jnp.float32(0.0)
            for v in range(4):
                tot += 0.8 * l1_loss(im[v], gt[v])
                tot += 0.2 * (1.0 - ssim(im[v], gt[v]))
            return tot
        v, g = jax.value_and_grad(f)(imgs0 + 1e-6 * i)
        return v + g[0, 0, 0, 0]

    results["loss_4v_ms"] = timed_loop(loss_body, n=8) * 1e3

    # --- adam over the full tree ---------------------------------------
    adam = adam_init((state.anchors, state.nets))
    opt = OptimizationConfig(optical_lambda=0.0)
    lrs = {k: fn(1000) for k, fn in build_schedules(opt).items()}

    def adam_body(st, i):
        params = (st.anchors, st.nets)
        grads = jax.tree.map(lambda x: x * 0 + 1e-6 * i, params)
        lr_tree = jax.tree.map(lambda _: jnp.float32(1e-3), params)
        new_p, new_a = adam_update(params, grads, adam, lr_tree)
        return jax.tree.leaves(new_p)[0].ravel()[0]

    results["adam_ms"] = timed_loop(adam_body, n=8) * 1e3

    # --- full step ------------------------------------------------------
    step = make_train_step(cfg, settings, window_cap, opt, width=W,
                           height=H, scale=scale, x_min=x_min, y_min=y_min,
                           rasterizer=rasterizer)
    stats = init_stats(capacity, cfg.n_offsets)
    gt1, gt2 = gt[0], gt[1]
    flow = jnp.zeros((2, H, W), jnp.float32)
    key = jax.random.PRNGKey(1)

    def time_full(mode):
        st, ad, sstats = jax.tree.map(jnp.copy, (state, adam, stats))
        st, ad, sstats, m = step(st, ad, sstats, lrs, z0, z0 + 1.0 / scale,
                                 gt1, gt2, flow, key, mode=mode,
                                 do_stats=False)
        float(np.asarray(m.loss))
        t0 = time.perf_counter()
        iters = 8
        for i in range(iters):
            st, ad, sstats, m = step(st, ad, sstats, lrs,
                                     z0 + 0.001 * i, z0 + 0.001 * i + 1e-3,
                                     gt1, gt2, flow, key, mode=mode,
                                     do_stats=False)
        float(np.asarray(m.loss))
        return (time.perf_counter() - t0) / iters * 1e3

    results["step_fp_ms"] = time_full(GenerateMode.FULL_PRECISION)
    results["step_entropy_ms"] = time_full(GenerateMode.ENTROPY)

    results = {k: round(v, 2) for k, v in results.items()}
    # derived: accounted = 2*(gen+project+bin+gather) + comp_vjp + loss
    # + adam (the step also runs optical terms, metrics, stats plumbing)
    acc = (2 * (results["gen_ms"] + results["project_ms"]
                + results["bin_ms"] + results["gather_ms"])
           + results["comp_vjp_4v_ms"] + results["loss_4v_ms"]
           + results["adam_ms"])
    results["accounted_ms"] = round(acc, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
