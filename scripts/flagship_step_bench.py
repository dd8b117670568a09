"""Flagship-shape train-step timing across raster capacities.

bench.py measures a 50k-anchor / cap-512 workload; the round-3 flagship
actually ran 60-100k anchors at gaussian_cap 4096 / tiles_per_gaussian
128 and saw ~1.45 s/iter wall vs the 0.31 s/iter bench figure.  This
script times the REAL shape on the real chip for a few capacity
configurations, so capacity policy (harmful-overflow growth) can be
costed: how much does each cap doubling actually cost per iteration?

Writes one JSON line per config to stdout.
"""

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
        GaussianConfig, GenerateMode, init_model, update_anchor_bound,
    )
    from gsvc_tpu.render.pipeline import make_raster_settings
    from gsvc_tpu.train.optim import adam_init
    from gsvc_tpu.train.schedules import build_schedules
    from gsvc_tpu.train.trainer import init_stats, make_train_multi_step

    import os

    on_tpu = jax.default_backend() == "tpu"
    small = bool(os.environ.get("GSVC_BENCH_SMALL"))  # CPU smoke of the
    # script itself (tiny shapes; numbers meaningless)
    H, W, T = (96, 128, 8) if small else (1080, 1920, 600)
    scale = max(H, W, T) / 2
    x_min, y_min = -W / 2 / scale, -H / 2 / scale

    mc = ModelConfig(threshold=0.05) if not small else ModelConfig(
        threshold=0.3, anchor_feature_dim=8, n_offsets=4,
        log2=6, log2_2D=7, grid_feature_dim=2,
        resolutions_list=(6, 10), resolutions_list_2D=(12, 20))
    cfg = GaussianConfig.from_model_config(mc)
    rng = np.random.default_rng(0)
    n_anchors = 500 if small else 100_000
    capacity = 512 if small else 102_400
    pts = rng.uniform([x_min, y_min, -T / 2 / scale],
                      [-x_min, -y_min, T / 2 / scale],
                      (n_anchors, 3)).astype(np.float32)
    state = init_model(jax.random.PRNGKey(0), cfg, pts, capacity,
                       voxel_size=0.001)
    state = update_anchor_bound(state, x_min, y_min, -T / 2 / scale)
    window_cap = 256 if small else 23_040   # flagship's actual window
    opt = OptimizationConfig()          # optical on, like the real fit
    rasterizer = os.environ.get(
        "GSVC_RASTERIZER", "pallas_train" if on_tpu else "jnp")

    adam = adam_init((state.anchors, state.nets))
    stats = init_stats(capacity, cfg.n_offsets)
    lrs = {k: fn(4000) for k, fn in build_schedules(opt).items()}

    gt1 = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    gt2 = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    images = jnp.stack([gt1, gt2])
    flows = jnp.zeros((1, 2, H, W), jnp.float32)
    K = 25                              # the flagship steps_per_dispatch

    # ---- stage isolation at the r3-flagship shape ---------------------
    # where does 1.34 s/iter go?  Time the binning sort, the [T,cap]
    # plane gather, and the inference composite separately (fwd only).
    from gsvc_tpu.models.gaussians import (
        generate_neural_gaussians, window_for_frame,
    )
    from gsvc_tpu.render.splat import (
        _bin_gaussians, attr_rows_from_proj, gather_tile_planes_rows,
        project_gaussians,
    )

    def timed(fn, *args, n=8, **kw):
        f = jax.jit(fn, **kw)
        r = f(*args)
        float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])   # sync
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        return (time.perf_counter() - t0) / n

    stage_plan = () if os.environ.get("GSVC_FSB_PLAN") == "stream" else (
        {"gaussian_cap": 4096, "tiles_per_gaussian": 128},
        {"gaussian_cap": 1024, "tiles_per_gaussian": 32},
        {"gaussian_cap": 4096, "tiles_per_gaussian": 128,
         "copy_budget_factor": 16})
    for cc in stage_plan:
        settings = make_raster_settings(cfg, H, W, tile_h=8, tile_w=128,
                                        chunk=128, **cc)
        start, in_w = window_for_frame(state, cfg, 0.0, window_cap)
        gss = generate_neural_gaussians(
            state, cfg, frame_z=0.0, cam_z=0.0, window_start=start,
            in_window=in_w, cap=window_cap,
            mode=GenerateMode.FULL_PRECISION)
        proj = project_gaussians(gss.xyz, gss.scaling, gss.rot, gss.valid,
                                 0.0, x_min, y_min, scale, settings)
        t_gen = timed(
            lambda z: generate_neural_gaussians(
                state, cfg, frame_z=z, cam_z=z, window_start=start,
                in_window=in_w, cap=window_cap,
                mode=GenerateMode.FULL_PRECISION).xyz.sum(),
            jnp.float32(0.0))
        t_bin = timed(lambda p: _bin_gaussians(p, settings)[3], proj)
        lists, counts, dropped, _, _ = jax.jit(
            lambda p: _bin_gaussians(p, settings))(proj)
        op = jnp.where(proj.valid[:, None], gss.opacity, 0.0)
        attrs = attr_rows_from_proj(proj, op, gss.color)
        t_gather = timed(
            lambda a, l: gather_tile_planes_rows(a, l)[0].sum(),
            attrs, lists)
        if on_tpu:
            from gsvc_tpu.render.pallas_splat import (
                composite_tiles_inference,
            )
            planes = gather_tile_planes_rows(attrs, lists)
            t_comp = timed(
                lambda pl, c: composite_tiles_inference(
                    settings, pl, c)[0].sum(), planes, counts)
        else:
            t_comp = float("nan")
        print(json.dumps({
            "stage_timing": cc,
            "gen_ms": round(t_gen * 1e3, 1),
            "bin_sort_ms": round(t_bin * 1e3, 1),
            "plane_gather_ms": round(t_gather * 1e3, 1),
            "composite_fwd_ms": round(t_comp * 1e3, 1),
        }), flush=True)

    # (config, modes) ordered by decision value: the r3-flagship shape
    # and the base shape first (both phases), then the compacted
    # copy-stream variants (the binning sort is the dominant
    # non-compositing cost; copy_budget_factor cuts its key count by
    # tiles_per_gaussian / factor)
    FP, STE = GenerateMode.FULL_PRECISION, GenerateMode.STE_ENTROPY
    if os.environ.get("GSVC_FSB_PLAN") == "stream":
        # stream-rasterizer decision set: the flagship shape with the
        # compacted copy stream (its natural pairing: machinery scales
        # with budget * window, not tiles * cap), plus the padded-stream
        # ablation
        plan = [
            ({"gaussian_cap": 4096, "tiles_per_gaussian": 128,
              "copy_budget_factor": 8}, (FP, STE)),
            ({"gaussian_cap": 4096, "tiles_per_gaussian": 128,
              "copy_budget_factor": 16}, (FP,)),
            ({"gaussian_cap": 4096, "tiles_per_gaussian": 128}, (FP,)),
        ]
    else:
        plan = [
            ({"gaussian_cap": 4096, "tiles_per_gaussian": 128}, (FP, STE)),
            ({"gaussian_cap": 1024, "tiles_per_gaussian": 32}, (FP, STE)),
            ({"gaussian_cap": 1024, "tiles_per_gaussian": 32,
              "copy_budget_factor": 8}, (FP,)),
            ({"gaussian_cap": 4096, "tiles_per_gaussian": 128,
              "copy_budget_factor": 16}, (FP,)),
        ]
    for cc, modes in plan:
        for mode in modes:
            settings = make_raster_settings(
                cfg, H, W, tile_h=8, tile_w=128, chunk=128, **cc)
            step = make_train_multi_step(
                cfg, settings, window_cap, opt, width=W, height=H,
                scale=scale, x_min=x_min, y_min=y_min,
                rasterizer=rasterizer)
            lr_stack = {k: jnp.full((K,), v, jnp.float32)
                        for k, v in lrs.items()}
            z1s = jnp.asarray(np.linspace(0.0, 0.05, K), jnp.float32)
            f1s = jnp.zeros((K,), jnp.int32)
            f2s = jnp.ones((K,), jnp.int32)
            st, ad, sst = jax.tree.map(jnp.copy, (state, adam, stats))
            key = jax.random.PRNGKey(2)
            t_c0 = time.perf_counter()
            st, ad, sst, key, m = step(
                st, ad, sst, key, lr_stack, z1s, z1s + 1.0 / scale,
                f1s, f2s, f1s, images, flows, mode=mode, do_stats=True)
            float(np.asarray(m.loss))   # sync past compile
            compile_s = time.perf_counter() - t_c0
            t0 = time.perf_counter()
            st, ad, sst, key, m = step(
                st, ad, sst, key, lr_stack, z1s, z1s + 1.0 / scale,
                f1s, f2s, f1s, images, flows, mode=mode, do_stats=True)
            float(np.asarray(m.loss))
            dt = (time.perf_counter() - t0) / K
            print(json.dumps({
                "mode": mode.name, **cc,
                "s_per_iter": round(dt, 4),
                "it_per_s": round(1.0 / dt, 3),
                "compile_s": round(compile_s, 1),
                "overflow": int(np.asarray(m.overflow)),
                "harmful": int(np.asarray(m.harmful_overflow)),
            }), flush=True)


if __name__ == "__main__":
    main()
