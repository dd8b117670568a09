"""Device-time breakdown of the ENTROPY-phase training step.

Methodology (CLAUDE.md): loop the op inside ONE jit via lax.fori_loop and
difference N vs 1 executions — a single XLA program runs to completion on
the chip, so the measurement is clean even when another process shares
the TPU through the axon tunnel.  Sync via a SCALAR host transfer.

Targets (VERDICT r2 item 1: entropy phase within 15% of fp):
  * mix_grid_encode fwd and fwd+bwd at the flagship window (16k anchors)
  * the three entropy-param MLPs fwd+bwd
  * full calc_entropy_context fwd+bwd
  * binning (_bin_gaussians) at 160k gaussians

Usage: python scripts/probe_entropy.py [N_queries]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(n_q: int = 16384):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from gsvc_tpu.config import ModelConfig
    from gsvc_tpu.models.gaussians import (GaussianConfig, init_model,
                                           entropy_params_net_apply,
                                           update_anchor_bound)
    from gsvc_tpu.ops.hashgrid import mix_grid_encode

    mc = ModelConfig(threshold=0.05)
    cfg = GaussianConfig.from_model_config(mc)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (n_q, 3)).astype(np.float32)
    state = init_model(jax.random.PRNGKey(0), cfg, pts, n_q,
                       voxel_size=0.001)
    state = update_anchor_bound(state, -1.0, -1.0, -1.0)

    x01 = jnp.asarray(rng.uniform(0.05, 0.95, (n_q, 3)), jnp.float32)
    table = state.nets.hash_table

    def timed(make_body, *args, n=32):
        @functools.partial(jax.jit, static_argnames=("k",))
        def loop(k, *a):
            def body(i, acc):
                return acc + make_body(i, *a)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        float(np.asarray(loop(1, *args)))
        float(np.asarray(loop(n, *args)))   # both compiled
        t0 = time.perf_counter(); float(np.asarray(loop(1, *args)))
        t1 = time.perf_counter(); float(np.asarray(loop(n, *args)))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (n - 1) * 1e3  # ms/iter

    out = {"n_queries": n_q}

    # 1. hash grid forward
    def hash_fwd(i, tab, x):
        x = x + 1e-6 * i
        return jnp.sum(mix_grid_encode(tab, x, cfg.grid))
    out["hash_fwd_ms"] = timed(hash_fwd, table, x01)

    # 2. hash grid fwd+bwd wrt table AND positions
    def hash_fb(i, tab, x):
        x = x + 1e-6 * i
        g = jax.grad(lambda t: jnp.sum(mix_grid_encode(t, x, cfg.grid)))(tab)
        return jnp.sum(g[::997])
    out["hash_fwd_bwd_ms"] = timed(hash_fb, table, x01)

    # 3. entropy nets fwd+bwd (3 nets on the context features)
    feat_ctx = mix_grid_encode(table, x01, cfg.grid)
    nets = (state.nets.mlp_feature_enet, state.nets.mlp_scaling_enet,
            state.nets.mlp_offset_enet)

    def enets_fb(i, fc, n1, n2, n3):
        fc = fc + 1e-6 * i

        def loss(f):
            s = jnp.float32(0.0)
            for net in (n1, n2, n3):
                m, sc, q = entropy_params_net_apply(net, f)
                s = s + jnp.sum(m) + jnp.sum(sc) + jnp.sum(q)
            return s
        return jax.grad(loss)(fc).sum()
    out["entropy_nets_fwd_bwd_ms"] = timed(enets_fb, feat_ctx, *nets)

    # 4. binning at 160k gaussians (16k anchors x K=10), t_max 32
    from gsvc_tpu.render.pipeline import make_raster_settings
    from gsvc_tpu.render.splat import Projected, _bin_gaussians

    settings = make_raster_settings(cfg, 1080, 1920, tile_h=8, tile_w=128,
                                    gaussian_cap=512, chunk=128,
                                    tiles_per_gaussian=32)
    m = n_q * 10
    mean2d = jnp.asarray(
        rng.uniform(0, [1920, 1080], (m, 2)), jnp.float32)
    conic = jnp.asarray(np.tile([1e-2, 0.0, 1e-2], (m, 1)), jnp.float32)
    depth = jnp.asarray(rng.uniform(-0.05, 0.05, (m,)), jnp.float32)
    radius = jnp.asarray(rng.uniform(2, 30, (m,)), jnp.float32)
    valid = jnp.ones((m,), bool)

    def binning(i, mu, dep):
        proj = Projected(mean2d=mu + 1e-6 * i, conic=conic,
                         depth=dep, radius=radius, valid=valid)
        tl, tc, ov, tot = _bin_gaussians(proj, settings)
        return jnp.float32(tot) + jnp.float32(tl[0, 0])
    out["binning_160k_ms"] = timed(binning, mean2d, depth, n=16)

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16384)
