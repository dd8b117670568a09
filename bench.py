"""Benchmark: fused training-step throughput on a 1080p-class GOP fit.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: one full train step = 4 orthographic renders of a 1920x1080
frame pair + loss + backward + Adam over a 50k-anchor (K=10) model with a
16k-anchor TSW window — the hot loop of GOP fitting
(reference: pipeline/train.py:325-581, 40k iterations per fit).

Baseline: the reference publishes no wall-clock numbers (BASELINE.md).
We use an estimated 6.0 it/s for the reference CUDA pipeline on A100
(40k-iteration fit in ~1.85 h, typical for Scaffold-GS/HAC-class training
at 1080p), so vs_baseline = measured_it_per_sec / 6.0.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_ITERS_PER_SEC = 6.0


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
    from gsvc_tpu.train.trainer import init_stats, make_train_step

    H, W, T = 1080, 1920, 300
    scale = max(H, W, T) / 2
    x_min, y_min = -W / 2 / scale, -H / 2 / scale

    mc = ModelConfig(threshold=0.05)
    cfg = GaussianConfig.from_model_config(mc)

    rng = np.random.default_rng(0)
    n_anchors = 50_000
    capacity = 51_200
    pts = rng.uniform([x_min, y_min, -T / 2 / scale],
                      [-x_min, -y_min, T / 2 / scale],
                      (n_anchors, 3)).astype(np.float32)
    state = init_model(jax.random.PRNGKey(0), cfg, pts, capacity,
                       voxel_size=0.001)
    state = update_anchor_bound(state, x_min, y_min, -T / 2 / scale)

    window_cap = 16_384
    settings = make_raster_settings(cfg, H, W, tile_h=8, tile_w=128,
                                    gaussian_cap=512, chunk=128)
    opt = OptimizationConfig(optical_lambda=0.0)
    rasterizer = "pallas_train" if jax.default_backend() == "tpu" else "jnp"
    step = make_train_step(cfg, settings, window_cap, opt, width=W,
                           height=H, scale=scale, x_min=x_min, y_min=y_min,
                           rasterizer=rasterizer)

    adam = adam_init((state.anchors, state.nets))
    stats = init_stats(capacity, cfg.n_offsets)
    lrs = {k: fn(1000) for k, fn in build_schedules(opt).items()}

    gt1 = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    gt2 = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    flow = jnp.zeros((2, H, W), jnp.float32)
    key = jax.random.PRNGKey(1)

    def run_once(state, adam, stats, z):
        return step(state, adam, stats, lrs, z, z + 1.0 / scale, gt1, gt2,
                    flow, key, mode=GenerateMode.FULL_PRECISION,
                    do_stats=False)

    # warmup/compile; NOTE: on the axon tunnel block_until_ready is not
    # reliable — force a host transfer to synchronize
    state, adam, stats, m = run_once(state, adam, stats, jnp.asarray(0.0))
    float(np.asarray(m.loss))

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, adam, stats, m = run_once(state, adam, stats,
                                         jnp.asarray(0.001 * i))
    float(np.asarray(m.loss))  # true sync: reads through the full chain
    dt = time.perf_counter() - t0

    it_per_sec = iters / dt
    print(json.dumps({
        "metric": "train_iters_per_sec_1080p",
        "value": round(it_per_sec, 3),
        "unit": "iter/s",
        "vs_baseline": round(it_per_sec / BASELINE_ITERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
