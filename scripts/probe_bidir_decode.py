"""Decode-fps A/B: mirror (2-view) kernel vs the bidirectional kernel.

The bidir kernel (pallas_splat.py v4) computes the fwd/flip-averaged
decode frame in one pass — one alpha evaluation per copy x pixel plus a
Horner back-suffix — instead of the mirror kernel's two view steps.  CPU
parity is pinned by tests/test_bidir.py; this probe measures, on the
real chip at the bench decode shape (50k anchors / 16k window / 1080p):

  * decode_fps_device for both kernels on the worst-case AND
    representative bench states (device time via the N-vs-1 fori_loop
    difference, CLAUDE.md measurement rules);
  * on-device parity: max |avg_bidir - avg_mirror| on one frame each.

Run: python scripts/probe_bidir_decode.py  (add --tiny for a CPU smoke)
"""

from __future__ import annotations

import functools
import json
import sys
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
        GaussianConfig, GenerateMode, init_model, update_anchor_bound,
    )
    from gsvc_tpu.render.batched import (
        render_frame_bidir, render_frame_views,
    )
    from gsvc_tpu.render.pipeline import make_raster_settings

    tiny = "--tiny" in sys.argv
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
    settings = make_raster_settings(
        cfg, H, W, tile_h=8, tile_w=16 if tiny else 128,
        gaussian_cap=64 if tiny else 512,
        chunk=16 if tiny else 128, tiles_per_gaussian=32)

    @functools.partial(jax.jit, static_argnames=("n", "kind"))
    def decode_loop(st, n, kind):
        def body(i, acc):
            z = jnp.float32(0.001) * i
            if kind == "bidir":
                img, _, _ = render_frame_bidir(
                    st, cfg, z, x_min, y_min, scale, settings, window_cap,
                    mode=GenerateMode.FULL_PRECISION, rasterizer=raster)
            else:
                img, _, _, _ = render_frame_views(
                    st, cfg, z, x_min, y_min, scale, settings, window_cap,
                    mode=GenerateMode.FULL_PRECISION, rasterizer=raster,
                    inference=True)
            return acc + img[0, 0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @functools.partial(jax.jit, static_argnames=("kind",))
    def one_frame(st, kind):
        z = jnp.float32(0.0)
        if kind == "bidir":
            img, _, _ = render_frame_bidir(
                st, cfg, z, x_min, y_min, scale, settings, window_cap,
                mode=GenerateMode.FULL_PRECISION, rasterizer=raster)
        else:
            img, _, _, _ = render_frame_views(
                st, cfg, z, x_min, y_min, scale, settings, window_cap,
                mode=GenerateMode.FULL_PRECISION, rasterizer=raster,
                inference=True)
        return img

    out = {}
    n_big = 4 if tiny else 20
    for name, st in (("worst", state), ("rep", state_rep)):
        res = {}
        d = {}
        for kind in ("mirror", "bidir"):
            def timed(n):
                float(np.asarray(decode_loop(st, n, kind)))
                t0 = time.perf_counter()
                float(np.asarray(decode_loop(st, n, kind)))
                return time.perf_counter() - t0
            dt = (timed(n_big) - timed(1)) / (n_big - 1)
            res[kind] = round(1.0 / max(dt, 1e-9), 2)
            d[kind] = np.asarray(one_frame(st, kind))
        res["parity_max_abs"] = float(np.abs(d["bidir"] - d["mirror"]).max())
        out[name] = res
        print(json.dumps({name: res}), flush=True)

    out["winner"] = ("bidir" if out["worst"]["bidir"] > out["worst"]["mirror"]
                     and out["rep"]["bidir"] > out["rep"]["mirror"]
                     else "mirror")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
