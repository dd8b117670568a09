"""Decode-fps vs copy_budget_factor (VERDICT r4 item 6).

The stage profile (artifacts/perf_r5/stages_train.json) puts per-frame
decode at ~comp_fwd(23ms) + binning(21ms); the binning cost is one
device-wide sort of window_cap*K*tiles_per_gaussian fused keys.  The
compacted copy stream (splat.py copy_budget_factor) sorts only
m*factor keys — this probe measures decode_fps_device at factors
{0, 4, 8} on both the worst-case and representative bench states, plus
the budget_dropped diagnostic so the compaction is provably lossless on
the measured content.

Run on the real chip: python scripts/probe_decode_budget.py
"""

from __future__ import annotations

import dataclasses
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

    from gsvc_tpu.config import ModelConfig
    from gsvc_tpu.models.gaussians import (
        GaussianConfig, GenerateMode, generate_neural_gaussians, init_model,
        update_anchor_bound, window_for_frame,
    )
    from gsvc_tpu.render.batched import render_frame_views
    from gsvc_tpu.render.pipeline import make_raster_settings
    from gsvc_tpu.render.splat import (
        _sorted_copy_stream, project_gaussians,
    )

    import sys
    tiny = "--tiny" in sys.argv  # CPU smoke of the probe logic
    H, W, T = (96, 128, 8) if tiny else (1080, 1920, 300)
    scale = max(H, W, T) / 2
    x_min, y_min = -W / 2 / scale, -H / 2 / scale
    mc = ModelConfig(threshold=0.05)
    cfg = GaussianConfig.from_model_config(mc)
    rng = np.random.default_rng(0)
    n_anchors = 512 if tiny else 50_000
    pts = rng.uniform([-1.0, -H / W, -1.0], [1.0, H / W, 1.0],
                      (n_anchors, 3)).astype(np.float32)
    state = init_model(jax.random.PRNGKey(0), cfg, pts, n_anchors)
    state = update_anchor_bound(state, x_min, y_min, -1.0)
    state_rep = state._replace(anchors=state.anchors._replace(
        scaling=state.anchors.scaling - float(np.log(4.0))))
    window_cap = 256 if tiny else 16_384
    on_tpu = jax.default_backend() == "tpu"
    raster = "pallas" if on_tpu else "jnp"

    out = {}
    for factor in (0, 4, 8):
        settings = make_raster_settings(
            cfg, H, W, tile_h=8, tile_w=128 if W >= 128 else 16,
            gaussian_cap=512, chunk=128 if W >= 128 else 32,
            tiles_per_gaussian=32)
        settings = dataclasses.replace(settings,
                                       copy_budget_factor=factor)

        import functools as _ft

        @_ft.partial(jax.jit, static_argnames=("n",))
        def decode_loop(st, n, settings=settings):
            def body(i, acc):
                img, _, _, _ = render_frame_views(
                    st, cfg, jnp.float32(0.001) * i, x_min, y_min, scale,
                    settings, window_cap, mode=GenerateMode.FULL_PRECISION,
                    rasterizer=raster, inference=True)
                return acc + img[0, 0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        @jax.jit
        def dropped_stats(st, settings=settings):
            z = jnp.float32(0.0)
            start, in_win = window_for_frame(st, cfg, z, window_cap)
            gen = generate_neural_gaussians(
                st, cfg, z, z, start, in_win, window_cap,
                mode=GenerateMode.FULL_PRECISION)
            proj = project_gaussians(
                gen.xyz, gen.scaling, gen.rot, gen.valid, z,
                x_min, y_min, scale, settings)
            _, _, cov_clip, bdrop, _ = _sorted_copy_stream(proj, settings)
            return cov_clip, bdrop

        res = {}
        for name, st in (("worst", state), ("rep", state_rep)):
            def timed(n):
                float(np.asarray(decode_loop(st, n)))
                t0 = time.perf_counter()
                float(np.asarray(decode_loop(st, n)))
                return time.perf_counter() - t0
            n_big = 20
            dt = (timed(n_big) - timed(1)) / (n_big - 1)
            cc, bd = dropped_stats(st)
            res[name] = {
                "decode_fps_device": round(1.0 / max(dt, 1e-9), 2),
                "coverage_clipped": int(np.asarray(cc)),
                "budget_dropped": int(np.asarray(bd)),
            }
        out[f"factor_{factor}"] = res
        print(json.dumps({f"factor_{factor}": res}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
