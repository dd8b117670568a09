"""Multi-chip SPMD tests on the virtual 8-device CPU mesh.

Checks the z-slab sharded renderer against the single-device renderer,
runs the 2D (dp x sp) training step end to end (including densification
statistics + a host re-shard densify epoch), and the GOP fan-out step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from gsvc_tpu.config import ModelConfig, OptimizationConfig
from gsvc_tpu.models.gaussians import GenerateMode
from gsvc_tpu.parallel.spmd import (
    combine_slab_renders, make_gop_parallel_step, make_mesh,
    make_spmd_train_step, shard_adam_state, shard_model_state,
    shard_train_stats, spmd_densify_epoch, stack_states, unstack_states,
)
from gsvc_tpu.render.pipeline import make_raster_settings, render_frame
from gsvc_tpu.train.optim import adam_init
from gsvc_tpu.train.schedules import build_schedules
from gsvc_tpu.train.trainer import init_stats
from tests.test_model import make_state

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 virtual devices")]


GEOM = dict(x_min=-0.6, y_min=-0.45, scale=26.0)


def test_slab_composite_matches_single_device():
    cfg, state = make_state(n=128, capacity=128, seed=7)
    settings = make_raster_settings(cfg, 24, 32, tile_h=8, tile_w=16,
                                    gaussian_cap=128, chunk=32)
    cap = 32  # per-shard window (capacity/4)

    # single-device reference over the full set
    full = render_frame(state, cfg, 0.0, settings=settings,
                        window_cap=128, mode=GenerateMode.FULL_PRECISION,
                        **GEOM)

    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    local_settings = settings

    def body(anchors, nets, n_active, bmin, bmax):
        from gsvc_tpu.models.gaussians import ModelState
        st = ModelState(anchors=anchors, nets=nets, n_active=n_active,
                        x_bound_min=bmin, x_bound_max=bmax)
        r = render_frame(st, cfg, 0.0, settings=local_settings,
                         window_cap=cap, mode=GenerateMode.FULL_PRECISION,
                         **GEOM)
        img, t = combine_slab_renders(r.image, r.transmittance, False,
                                      local_settings.bg)
        return img

    f = shard_map(body, mesh=mesh,
                  in_specs=(P("sp"), P(), P(), P(), P()),
                  out_specs=P(), check_vma=False)
    img = f(state.anchors, state.nets, state.n_active,
            state.x_bound_min, state.x_bound_max)
    np.testing.assert_allclose(np.asarray(img), np.asarray(full.image),
                               atol=2e-4)


def test_slab_composite_neighbor_exchange_matches():
    """K-ppermute log-T exchange == all_gather exchange == single device
    when the TSW window spans <= K+1 slabs (round-2 verdict item 6)."""
    from gsvc_tpu.config import ModelConfig
    from gsvc_tpu.models.gaussians import (
        GaussianConfig, init_model, update_anchor_bound,
    )

    mc = ModelConfig(
        anchor_feature_dim=8, n_offsets=4, threshold=0.08,
        time_multi_res=4, offset_multi_res=4, log2=6, log2_2D=7,
        grid_feature_dim=2, resolutions_list=(6, 10),
        resolutions_list_2D=(12, 20))
    cfg = GaussianConfig.from_model_config(mc)
    rng = np.random.default_rng(11)
    # anchors spread over z in [-0.5, 0.5]: a +-0.08 window around z=0
    # holds ~16% of rows => spans 2 of 4 equal-count slabs
    pts = rng.uniform([-0.5, -0.4, -0.5], [0.5, 0.4, 0.5],
                      (128, 3)).astype(np.float32)
    state = init_model(jax.random.PRNGKey(3), cfg, pts, capacity=128,
                       voxel_size=0.001)
    state = update_anchor_bound(state, -0.6, -0.45, -0.5)
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    state = state._replace(anchors=state.anchors._replace(
        feat=0.5 * jax.random.normal(k1, state.anchors.feat.shape),
        offset=0.3 * jax.random.normal(k2, state.anchors.offset.shape)))

    settings = make_raster_settings(cfg, 24, 32, tile_h=8, tile_w=16,
                                    gaussian_cap=128, chunk=32)
    full = render_frame(state, cfg, 0.0, settings=settings,
                        window_cap=128, mode=GenerateMode.FULL_PRECISION,
                        **GEOM)

    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    cap = 32

    def body(anchors, nets, n_active, bmin, bmax, neighbors, flip):
        from gsvc_tpu.models.gaussians import ModelState
        st = ModelState(anchors=anchors, nets=nets, n_active=n_active,
                        x_bound_min=bmin, x_bound_max=bmax)
        r = render_frame(st, cfg, 0.0, settings=settings,
                         window_cap=cap, mode=GenerateMode.FULL_PRECISION,
                         flip=flip, **GEOM)
        img, t = combine_slab_renders(r.image, r.transmittance, flip,
                                      settings.bg, neighbors=neighbors)
        return img

    for flip in (False, True):
        ref = render_frame(state, cfg, 0.0, settings=settings,
                           window_cap=128,
                           mode=GenerateMode.FULL_PRECISION, flip=flip,
                           **GEOM)
        outs = {}
        for neighbors in (None, 1):
            import functools
            f = shard_map(
                functools.partial(body, neighbors=neighbors, flip=flip),
                mesh=mesh,
                in_specs=(P("sp"), P(), P(), P(), P()),
                out_specs=P(), check_vma=False)
            outs[neighbors] = np.asarray(
                f(shard_model_state(state, mesh).anchors, state.nets,
                  state.n_active, state.x_bound_min, state.x_bound_max))
        np.testing.assert_allclose(outs[1], outs[None], atol=1e-6)
        np.testing.assert_allclose(outs[1], np.asarray(ref.image),
                                   atol=2e-4)


def _spmd_setup(seed=3, n_dp=2, n_sp=4):
    cfg, state = make_state(n=128, capacity=128, seed=seed)
    settings = make_raster_settings(cfg, 24, 32, tile_h=8, tile_w=16,
                                    gaussian_cap=128, chunk=32)
    mesh = make_mesh(n_dp, n_sp)
    state = shard_model_state(state, mesh)
    opt = OptimizationConfig(optical_lambda=0.0)
    step = make_spmd_train_step(cfg, settings, 32, opt,
                                width=32, height=24, **GEOM, mesh=mesh)
    adam = shard_adam_state(adam_init((state.anchors, state.nets)), mesh)
    stats = shard_train_stats(init_stats(128, cfg.n_offsets), mesh)
    lrs = {k: fn(1) for k, fn in build_schedules(opt).items()}
    return cfg, state, settings, mesh, opt, step, adam, stats, lrs


def test_spmd_train_step_runs_and_improves():
    cfg, state, settings, mesh, opt, step, adam, stats, lrs = _spmd_setup()
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0.2, 0.8, (2, 3, 24, 32)), jnp.float32)
    flow0 = jnp.zeros((2, 2, 24, 32))
    z1 = jnp.asarray([0.0, 0.01])
    z2 = jnp.asarray([0.01, 0.02])
    keys = jax.random.split(jax.random.PRNGKey(0), 2)

    losses = []
    for it in range(8):
        state, adam, stats, metrics = step(
            state, adam, stats, lrs, z1, z2, gt, gt, flow0, keys,
            mode=GenerateMode.FULL_PRECISION)
        losses.append(float(metrics.loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_spmd_stats_and_densify_epoch():
    """Densification under SPMD: sharded stats accumulate; the host
    re-shard epoch grows/prunes and returns a re-sharded state."""
    cfg, state, settings, mesh, opt, step, adam, stats, lrs = _spmd_setup(
        seed=5)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0.2, 0.8, (2, 3, 24, 32)), jnp.float32)
    flow0 = jnp.zeros((2, 2, 24, 32))
    keys = jax.random.split(jax.random.PRNGKey(2), 2)
    for _ in range(3):
        state, adam, stats, _ = step(
            state, adam, stats, lrs, jnp.zeros(2), jnp.full(2, 0.01),
            gt, gt, flow0, keys, mode=GenerateMode.FULL_PRECISION,
            do_stats=True)
    assert float(jnp.sum(stats.anchor_demon)) > 0, \
        "stats must accumulate under the mesh"

    mc = ModelConfig(anchor_feature_dim=cfg.feat_dim,
                     n_offsets=cfg.n_offsets, threshold=cfg.threshold)
    n_before = int(state.n_active)
    state2, adam2, stats2, res, cap = spmd_densify_epoch(
        state, adam, stats, mesh, mc, opt, voxel_size=0.01,
        rng=np.random.default_rng(3), n_offsets=cfg.n_offsets)
    assert cap % mesh.shape["sp"] == 0
    assert int(state2.n_active) == res.n_active
    # stats reset semantics are adjust_anchors'; buffers must be resized
    assert state2.anchors.anchor.shape[0] == cap
    # the re-sharded state must still step
    state2, adam2, stats2, metrics = step(
        state2, adam2, stats2, lrs, jnp.zeros(2), jnp.full(2, 0.01),
        gt, gt, flow0, keys, mode=GenerateMode.FULL_PRECISION)
    assert np.isfinite(float(metrics.loss))


def test_spmd_entropy_mode_exact_rates():
    cfg, state = make_state(n=64, capacity=64, seed=4)
    settings = make_raster_settings(cfg, 16, 16, tile_h=8, tile_w=16,
                                    gaussian_cap=64, chunk=16)
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    state_sh = shard_model_state(state, mesh)
    opt = OptimizationConfig(optical_lambda=0.0)
    step = make_spmd_train_step(cfg, settings, 32, opt,
                                width=16, height=16, x_min=-0.4,
                                y_min=-0.4, scale=20.0, mesh=mesh)
    adam = shard_adam_state(adam_init((state_sh.anchors, state_sh.nets)),
                            mesh)
    stats = shard_train_stats(init_stats(64, cfg.n_offsets), mesh)
    lrs = {k: fn(1) for k, fn in build_schedules(opt).items()}
    gt = jnp.full((2, 3, 16, 16), 0.5)
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    _, _, _, metrics = step(
        state_sh, adam, stats, lrs, jnp.zeros(2), jnp.full(2, 0.01),
        gt, gt, jnp.zeros((2, 2, 16, 16)), keys,
        mode=GenerateMode.ENTROPY)
    assert np.isfinite(float(metrics.loss))
    bpp_sharded = float(metrics.bit_per_param)
    assert bpp_sharded > 0

    # count-weighted check: the sharded global rate must equal the
    # single-device rate computed over the SAME windows (window caps
    # differ between the two setups, so compare against a psum-free
    # recomputation with identical per-slab windows)
    from gsvc_tpu.render.batched import render_pair

    def slab_rates(lo, hi):
        import jax.tree_util as jtu
        sl = jax.tree.map(lambda x: x[lo:hi], state.anchors)
        st = state._replace(anchors=sl)
        pr = render_pair(st, cfg, 0.0, 0.01, -0.4, -0.4, 20.0,
                         settings, 32, GenerateMode.ENTROPY,
                         jax.random.fold_in(keys[0], 0), rasterizer="jnp")
        return pr.renders

    # per-slab sums pooled by hand == count-weighted expectation
    tot_bits, tot_params = 0.0, 0.0
    for lo in range(0, 64, 32):
        renders = slab_rates(lo, lo + 32)
        for r in renders:
            tot_bits += float(r.rate.bits_total)
            tot_params += float(r.rate.params_total)
    manual = tot_bits / max(tot_params, 1.0)
    # not bit-identical (different key folding), but the magnitude must
    # match a count-weighted pooling, not a slab-equal average
    assert 0.2 * manual < bpp_sharded < 5.0 * manual


def test_gop_parallel_step_matches_independent_fits():
    """GOP fan-out over dp: shards run INDEPENDENT models; each GOP's
    loss matches running the single-chip step on that GOP alone."""
    from gsvc_tpu.train.trainer import make_train_step, init_stats as istats

    n_gops = 2
    cfgs_states = [make_state(n=64, capacity=64, seed=10 + i)
                   for i in range(n_gops)]
    cfg = cfgs_states[0][0]
    states = [s for _, s in cfgs_states]
    settings = make_raster_settings(cfg, 16, 16, tile_h=8, tile_w=16,
                                    gaussian_cap=64, chunk=16)
    opt = OptimizationConfig(optical_lambda=0.0)
    mesh = make_mesh(n_gops, 1, devices=jax.devices()[:n_gops])
    geom = dict(x_min=-0.4, y_min=-0.4, scale=20.0)

    step = make_gop_parallel_step(cfg, settings, 64, opt, width=16,
                                  height=16, **geom, mesh=mesh)
    stacked = stack_states(states)
    adams = adam_init((stacked.anchors, stacked.nets))
    lrs = {k: fn(1) for k, fn in build_schedules(opt).items()}

    rng = np.random.default_rng(0)
    gts = jnp.asarray(rng.uniform(0.2, 0.8, (n_gops, 3, 16, 16)),
                      jnp.float32)
    z1 = jnp.zeros(n_gops)
    z2 = jnp.full(n_gops, 0.01)
    keys = jax.random.split(jax.random.PRNGKey(5), n_gops)

    from gsvc_tpu.train.trainer import init_stats as istats2
    gstats = jax.tree.map(lambda x: jnp.stack([x] * n_gops),
                          istats2(64, cfg.n_offsets))
    flow0 = jnp.zeros((n_gops, 2, 16, 16))
    stacked, adams, gstats, metrics = step(
        stacked, adams, gstats, lrs, z1, z2, gts, gts, flow0,
        keys, mode=GenerateMode.FULL_PRECISION)
    fanout_losses = np.asarray(metrics["loss"])

    # reference: single-chip steps, one per GOP
    sstep = make_train_step(cfg, settings, 64, opt, width=16, height=16,
                            **geom, rasterizer="jnp")
    for i in range(n_gops):
        st = states[i]
        adam_i = adam_init((st.anchors, st.nets))
        st2, _, _, m = sstep(st, adam_i, istats(64, cfg.n_offsets), lrs,
                             z1[i], z2[i], gts[i], gts[i],
                             jnp.zeros((2, 16, 16)), keys[i],
                             mode=GenerateMode.FULL_PRECISION,
                             do_stats=False)
        np.testing.assert_allclose(fanout_losses[i], float(m.loss),
                                   rtol=1e-4)


def test_fit_gops_full_schedule():
    """Library-level GOP fan-out through ALL FOUR schedule phases with a
    synchronized densify epoch (round-2 verdict item 7)."""
    from gsvc_tpu.config import Config, PipelineConfig
    from gsvc_tpu.framecube import FrameCubeDataset
    from gsvc_tpu.parallel.spmd import fit_gops
    from tests.test_train import small_config, synthetic_video

    cfg = small_config(iterations=16)
    cfg.pipeline = PipelineConfig(tile_h=8, tile_w=16, visible_capacity=64,
                                  gaussian_chunk=16)
    o = cfg.optimization
    o.full_precision_training_total = 6
    o.quantized_training_total = 2
    o.entropy_constrained_train_total = 6
    o.ste_entropy_constrained_train_total = 2
    o.start_stat = 1
    o.update_from = 2
    o.update_interval = 4
    o.update_until = 6
    datasets = [FrameCubeDataset(images=synthetic_video(t=4, seed=s))
                for s in (0, 1)]
    mesh = make_mesh(2, 1, devices=jax.devices()[:2])
    logs = []
    states, reports = fit_gops(mesh, cfg, datasets, iterations=16, seed=0,
                               log_fn=logs.append)
    assert len(states) == 2 and len(reports) == 2
    for rep in reports:
        assert rep, "per-GOP history must be recorded"
        assert np.isfinite(rep[-1]["loss"])
    assert any("densify" in m for m in logs), \
        "densify epoch must run under the fan-out"
    modes = {m.split("mode=")[1].split(" ")[0]
             for m in logs if "mode=" in m}
    assert "STE_ENTROPY" in modes or "ENTROPY" in modes, \
        "entropy phases must run under the fan-out"
    # independent GOPs diverge
    assert not np.allclose(np.asarray(states[0].anchors.feat),
                           np.asarray(states[1].anchors.feat))
