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

    on_tpu = jax.default_backend() == "tpu"
    H, W, T = 1080, 1920, 600
    scale = max(H, W, T) / 2
    x_min, y_min = -W / 2 / scale, -H / 2 / scale

    mc = ModelConfig(threshold=0.05)
    cfg = GaussianConfig.from_model_config(mc)
    rng = np.random.default_rng(0)
    n_anchors = 100_000
    capacity = 102_400
    pts = rng.uniform([x_min, y_min, -T / 2 / scale],
                      [-x_min, -y_min, T / 2 / scale],
                      (n_anchors, 3)).astype(np.float32)
    state = init_model(jax.random.PRNGKey(0), cfg, pts, capacity,
                       voxel_size=0.001)
    state = update_anchor_bound(state, x_min, y_min, -T / 2 / scale)
    window_cap = 23_040                 # the flagship's actual window
    opt = OptimizationConfig()          # optical on, like the real fit
    rasterizer = "pallas_train" if on_tpu else "jnp"

    adam = adam_init((state.anchors, state.nets))
    stats = init_stats(capacity, cfg.n_offsets)
    lrs = {k: fn(4000) for k, fn in build_schedules(opt).items()}

    gt1 = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    gt2 = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    images = jnp.stack([gt1, gt2])
    flows = jnp.zeros((1, 2, H, W), jnp.float32)
    K = 25                              # the flagship steps_per_dispatch

    # (config, modes) ordered by decision value: the r3-flagship shape
    # and the base shape first (both phases), then the compacted
    # copy-stream variants (the binning sort is the dominant
    # non-compositing cost; copy_budget_factor cuts its key count by
    # tiles_per_gaussian / factor)
    FP, STE = GenerateMode.FULL_PRECISION, GenerateMode.STE_ENTROPY
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
