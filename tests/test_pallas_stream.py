"""Stream-resident compositing (pallas_stream.py) vs the mirror kernel.

Both rasterizers share the chunk math and consume the same sorted copy
stream, and the aligned stream places each tile's copies at the same
chunk offsets as the [T, cap] lists, so forward images and gradients
must match to float tolerance (identical op sequences up to layout).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.render.pallas_splat import mirror_composite_attrs
from gsvc_tpu.render.pallas_stream import (
    concat_stream_bins, stream_composite_attrs, stream_composite_inference,
)
from gsvc_tpu.render.splat import (
    RasterSettings, _bin_gaussians, attr_rows_from_proj,
    bin_gaussians_stream, project_gaussians,
)
from tests.test_splat import make_scene

SETTINGS = RasterSettings(
    image_height=40, image_width=48, threshold=0.15, tile_h=8, tile_w=16,
    gaussian_cap=64, chunk=16, tiles_per_gaussian=32)

GEOM = dict(x_min=-1.0, y_min=-0.75, scale=24.0)


def _frame_inputs(m=40, seed=0, frame_z=0.0, settings=SETTINGS,
                  empty_tiles=False):
    xyz, color, opacity, scaling, rot, valid = make_scene(m=m, seed=seed)
    if empty_tiles:
        # push everything into the left third -> right tiles stay empty
        xyz = xyz.at[:, 0].set(jnp.abs(xyz[:, 0]) * -0.4 - 0.5)
    proj = project_gaussians(xyz, scaling, rot, valid, frame_z,
                             GEOM["x_min"], GEOM["y_min"], GEOM["scale"],
                             settings)
    op = jnp.where(proj.valid[:, None], opacity, 0.0)
    attrs = attr_rows_from_proj(proj, op, color)
    return proj, attrs


def _both_outputs(frames, settings=SETTINGS, m2d=None):
    attrs = jnp.stack([a for _, a in frames])
    lists, counts, sbs = [], [], []
    for proj, _ in frames:
        tl, cnt, _, _, _ = _bin_gaussians(proj, settings)
        lists.append(tl)
        counts.append(cnt)
        sbs.append(bin_gaussians_stream(proj, settings))
    out_mirror = mirror_composite_attrs(
        settings, attrs, jnp.stack(lists), jnp.stack(counts), m2d)
    sids, blk_tile, blk_cc, nblk = concat_stream_bins(sbs, settings)
    out_stream = stream_composite_attrs(
        settings, attrs, sids, blk_tile, blk_cc, nblk, m2d)
    return out_mirror, out_stream, sbs, counts


def test_bins_agree_with_padded_layout():
    proj, _ = _frame_inputs()
    _, counts, dropped, overflow, nrend = _bin_gaussians(proj, SETTINGS)
    sb = bin_gaussians_stream(proj, SETTINGS)
    np.testing.assert_array_equal(np.asarray(sb.counts),
                                  np.asarray(counts))
    np.testing.assert_array_equal(np.asarray(sb.dropped),
                                  np.asarray(dropped))
    assert int(sb.overflow) == int(overflow)
    assert int(sb.n_rendered) == int(nrend)
    # every tile owns >= 1 block and slot ids respect per-tile counts
    nblk = np.asarray(sb.nblk)
    assert nblk.min() >= 1
    ids = np.asarray(sb.ids)
    assert (ids >= -1).all() and ids.max() < proj.mean2d.shape[0]
    live = int((ids >= 0).sum())
    assert live == int(nrend)


@pytest.mark.parametrize("empty_tiles", [False, True])
def test_forward_matches_mirror(empty_tiles):
    frames = [_frame_inputs(seed=0, frame_z=0.0, empty_tiles=empty_tiles),
              _frame_inputs(seed=1, frame_z=0.02, empty_tiles=empty_tiles)]
    out_m, out_s, _, _ = _both_outputs(frames)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_m),
                               atol=1e-6)


def test_forward_single_frame_and_inference():
    frames = [_frame_inputs(seed=2)]
    out_m, out_s, sbs, counts = _both_outputs(frames)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_m),
                               atol=1e-6)
    attrs = jnp.stack([a for _, a in frames])
    sids, blk_tile, blk_cc, nblk = concat_stream_bins(sbs, SETTINGS)
    out_inf = stream_composite_inference(SETTINGS, attrs, sids, blk_tile,
                                         blk_cc, nblk)
    np.testing.assert_allclose(np.asarray(out_inf), np.asarray(out_s),
                               atol=1e-6)


def test_gradients_match_mirror():
    frames = [_frame_inputs(seed=3), _frame_inputs(seed=4, frame_z=0.02)]
    attrs = jnp.stack([a for _, a in frames])
    lists, counts, sbs = [], [], []
    for proj, _ in frames:
        tl, cnt, _, _, _ = _bin_gaussians(proj, SETTINGS)
        lists.append(tl)
        counts.append(cnt)
        sbs.append(bin_gaussians_stream(proj, SETTINGS))
    lists = jnp.stack(lists)
    counts = jnp.stack(counts)
    sids, blk_tile, blk_cc, nblk = concat_stream_bins(sbs, SETTINGS)
    cot = jax.random.normal(jax.random.PRNGKey(7),
                            (4 * SETTINGS.n_tiles, 4,
                             SETTINGS.tile_h * SETTINGS.tile_w))

    def loss_m(a):
        return jnp.sum(mirror_composite_attrs(SETTINGS, a, lists, counts,
                                              None) * cot)

    def loss_s(a):
        return jnp.sum(stream_composite_attrs(SETTINGS, a, sids, blk_tile,
                                              blk_cc, nblk, None) * cot)

    g_m = jax.grad(loss_m)(attrs)
    g_s = jax.grad(loss_s)(attrs)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_m),
                               rtol=1e-5, atol=1e-6)


def test_render_pair_stream_matches_mirror():
    """End-to-end pair render: the pallas_stream product path equals the
    mirror-kernel path (images, transmittances, overflow diagnostics)."""
    from gsvc_tpu.models.gaussians import GenerateMode
    from gsvc_tpu.render.batched import render_pair
    from tests.test_batched import GEOM as BGEOM, Z1, Z2, settings_for, \
        tiny_model

    state, cfg = tiny_model()
    settings = settings_for(cfg, 48)
    kw = dict(window_cap=64, mode=GenerateMode.FULL_PRECISION, key=None,
              **BGEOM)
    pr_m = render_pair(state, cfg, Z1, Z2, settings=settings,
                       rasterizer="pallas_train", **kw)
    pr_s = render_pair(state, cfg, Z1, Z2, settings=settings,
                       rasterizer="pallas_stream", **kw)
    np.testing.assert_allclose(np.asarray(pr_s.images),
                               np.asarray(pr_m.images), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pr_s.transmittances),
                               np.asarray(pr_m.transmittances), atol=1e-6)
    for rs, rm in zip(pr_s.renders, pr_m.renders):
        assert int(rs.overflow) == int(rm.overflow)
        assert int(rs.num_rendered) == int(rm.num_rendered)
        assert int(rs.harmful_overflow) == int(rm.harmful_overflow)


def test_render_frame_views_stream():
    from gsvc_tpu.models.gaussians import GenerateMode
    from gsvc_tpu.render.batched import render_frame_views
    from tests.test_batched import GEOM as BGEOM, settings_for, tiny_model

    state, cfg = tiny_model(seed=2)
    settings = settings_for(cfg, 48)
    kw = dict(window_cap=64, mode=GenerateMode.FULL_PRECISION, **BGEOM)
    for inference in (False, True):
        avg_m, imgs_m, _, _ = render_frame_views(
            state, cfg, 0.01, settings=settings, rasterizer="pallas_train",
            inference=inference, **kw)
        avg_s, imgs_s, _, _ = render_frame_views(
            state, cfg, 0.01, settings=settings,
            rasterizer="pallas_stream", inference=inference, **kw)
        np.testing.assert_allclose(np.asarray(imgs_s), np.asarray(imgs_m),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(avg_s), np.asarray(avg_m),
                                   atol=1e-6)


@pytest.mark.slow
def test_train_step_stream_matches_mirror():
    """One full train step (loss/backward/Adam, do_stats on) agrees
    between the stream and mirror rasterizers."""
    import jax.numpy as jnp_
    from gsvc_tpu.config import OptimizationConfig
    from gsvc_tpu.models.gaussians import GenerateMode
    from gsvc_tpu.train.optim import adam_init
    from gsvc_tpu.train.schedules import build_schedules
    from gsvc_tpu.train.trainer import init_stats, make_train_step
    from tests.test_batched import GEOM as BGEOM, settings_for, tiny_model

    state, cfg = tiny_model()
    settings = settings_for(cfg, 48)
    opt = OptimizationConfig(optical_lambda=0.1)
    h, w = settings.image_height, settings.image_width
    rng = np.random.default_rng(0)
    gt1 = jnp_.asarray(rng.uniform(0, 1, (3, h, w)), jnp_.float32)
    gt2 = jnp_.asarray(rng.uniform(0, 1, (3, h, w)), jnp_.float32)
    flow = jnp_.zeros((2, h, w), jnp_.float32)
    lrs = {k: fn(100) for k, fn in build_schedules(opt).items()}
    key = jax.random.PRNGKey(1)

    results = {}
    for r in ("pallas_train", "pallas_stream"):
        step = make_train_step(cfg, settings, 64, opt, width=w, height=h,
                               scale=BGEOM["scale"], x_min=BGEOM["x_min"],
                               y_min=BGEOM["y_min"], rasterizer=r)
        st, ad, sstats = jax.tree.map(
            jnp_.copy, (state, adam_init((state.anchors, state.nets)),
                        init_stats(state.anchors.anchor.shape[0],
                                   cfg.n_offsets)))
        st, ad, sstats, m = step(st, ad, sstats, lrs, 0.0, 0.05, gt1, gt2,
                                 flow, key,
                                 mode=GenerateMode.FULL_PRECISION,
                                 do_stats=True)
        results[r] = (st, sstats, m)
    m_m, m_s = results["pallas_train"][2], results["pallas_stream"][2]
    np.testing.assert_allclose(float(m_s.loss), float(m_m.loss), rtol=1e-5)
    assert int(m_s.overflow) == int(m_m.overflow)
    a_m = results["pallas_train"][0].anchors
    a_s = results["pallas_stream"][0].anchors
    np.testing.assert_allclose(np.asarray(a_s.offset),
                               np.asarray(a_m.offset), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_s.feat),
                               np.asarray(a_m.feat), atol=1e-6)
    # densification stats (per-view means2d screen gradients) agree
    s_m, s_s = results["pallas_train"][1], results["pallas_stream"][1]
    np.testing.assert_allclose(np.asarray(s_s.offset_gradient_accum),
                               np.asarray(s_m.offset_gradient_accum),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(s_s.offset_denom),
                                  np.asarray(s_m.offset_denom))


def test_per_view_m2d_gradients_match_mirror():
    frames = [_frame_inputs(seed=5), _frame_inputs(seed=6, frame_z=0.02)]
    attrs = jnp.stack([a for _, a in frames])
    m = attrs.shape[1]
    lists, counts, sbs = [], [], []
    for proj, _ in frames:
        tl, cnt, _, _, _ = _bin_gaussians(proj, SETTINGS)
        lists.append(tl)
        counts.append(cnt)
        sbs.append(bin_gaussians_stream(proj, SETTINGS))
    lists = jnp.stack(lists)
    counts = jnp.stack(counts)
    sids, blk_tile, blk_cc, nblk = concat_stream_bins(sbs, SETTINGS)
    m2d = jnp.zeros((4, m, 2))
    cot = jax.random.normal(jax.random.PRNGKey(9),
                            (4 * SETTINGS.n_tiles, 4,
                             SETTINGS.tile_h * SETTINGS.tile_w))

    def loss_m(m2d_):
        return jnp.sum(mirror_composite_attrs(SETTINGS, attrs, lists,
                                              counts, m2d_) * cot)

    def loss_s(m2d_):
        return jnp.sum(stream_composite_attrs(SETTINGS, attrs, sids,
                                              blk_tile, blk_cc, nblk,
                                              m2d_) * cot)

    g_m = jax.grad(loss_m)(m2d)
    g_s = jax.grad(loss_s)(m2d)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_m),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_spmd_step_with_stream_rasterizer():
    """The stream kernels trace and run inside the dp x sp shard_map
    (virtual 8-device mesh) and agree with the jnp spmd step's loss."""
    import jax.numpy as jnp_
    from gsvc_tpu.models.gaussians import GenerateMode
    from tests.test_parallel import _spmd_setup

    losses = {}
    for r in ("jnp", "pallas_stream"):
        from gsvc_tpu.parallel.spmd import make_spmd_train_step
        (cfg, state, settings, mesh, opt, _step, adam, stats,
         lrs) = _spmd_setup(seed=7)
        from tests.test_parallel import GEOM as PGEOM
        step = make_spmd_train_step(
            cfg, settings, 32, opt, width=32, height=24, **PGEOM,
            mesh=mesh, rasterizer=r)
        rng = np.random.default_rng(0)
        gt = jnp_.asarray(rng.uniform(0.2, 0.8, (2, 3, 24, 32)),
                          jnp_.float32)
        flow0 = jnp_.zeros((2, 2, 24, 32))
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        state, adam, stats, metrics = step(
            state, adam, stats, lrs, jnp_.zeros(2), jnp_.full(2, 0.01),
            gt, gt, flow0, keys, mode=GenerateMode.FULL_PRECISION)
        losses[r] = float(metrics.loss)
    np.testing.assert_allclose(losses["pallas_stream"], losses["jnp"],
                               rtol=1e-4)


def test_stream_with_copy_budget_matches_mirror():
    """Compacted copy-stream binning + stream kernels: same images as the
    padded-layout mirror path while nothing exceeds the budget."""
    import dataclasses
    s = dataclasses.replace(SETTINGS, copy_budget_factor=8)
    frames = [_frame_inputs(seed=8, settings=s),
              _frame_inputs(seed=9, frame_z=0.02, settings=s)]
    out_m, out_s, sbs, _ = _both_outputs(frames, settings=s)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_m),
                               atol=1e-6)
