"""Bidirectional decode composite (pallas_splat v4) vs the mirror kernel.

The decoded frame is the average of the forward and x-flipped views; the
bidir kernel computes that average in ONE pass over the forward tile
lists (one alpha evaluation per copy x pixel, front-prefix + Horner
back-suffix).  Parity target: the mirror kernel's two-view average.
Exact when no early-exit truncation triggers; otherwise both kernels
drop only terms weighted < T_EPS = 1e-4, so images agree to that bound.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.render.pallas_splat import (
    bidir_composite_attrs, mirror_composite_attrs,
)
from gsvc_tpu.render.splat import (
    RasterSettings, _bin_gaussians, assemble_views, attr_rows_from_proj,
    project_gaussians,
)
from tests.test_splat import make_scene

SETTINGS = RasterSettings(
    image_height=40, image_width=48, threshold=0.15, tile_h=8, tile_w=16,
    gaussian_cap=64, chunk=16, tiles_per_gaussian=32)

GEOM = dict(x_min=-1.0, y_min=-0.75, scale=24.0)


def _attrs_lists(m=40, seed=0, settings=SETTINGS, opacity_scale=None,
                 empty_tiles=False):
    xyz, color, opacity, scaling, rot, valid = make_scene(m=m, seed=seed)
    if opacity_scale is not None:
        opacity = jnp.clip(opacity * opacity_scale, 0.0, 0.995)
    if empty_tiles:
        xyz = xyz.at[:, 0].set(jnp.abs(xyz[:, 0]) * -0.4 - 0.5)
    proj = project_gaussians(xyz, scaling, rot, valid, 0.0,
                             GEOM["x_min"], GEOM["y_min"], GEOM["scale"],
                             settings)
    op = jnp.where(proj.valid[:, None], opacity, 0.0)
    attrs = attr_rows_from_proj(proj, op, color)
    lists, counts, _, _, _ = _bin_gaussians(proj, settings)
    return attrs, lists, counts


def _mirror_avg(attrs, lists, counts, settings=SETTINGS):
    out4 = mirror_composite_attrs(settings, attrs[None], lists[None],
                                  counts[None], None)
    imgs, ts = assemble_views(settings, out4)
    avg = (imgs[0] + imgs[1][:, :, ::-1]) / 2.0
    # the flip view's transmittance image is mirrored back too
    return avg, ts[0], ts[1][:, ::-1]


def _bidir(attrs, lists, counts, settings=SETTINGS):
    imgs, ts = bidir_composite_attrs(settings, attrs[None], lists[None],
                                     counts[None])
    return imgs[0], ts[0]


class TestBidirParity:
    def test_matches_mirror_average(self):
        attrs, lists, counts = _attrs_lists()
        ref, t_f, t_b = _mirror_avg(attrs, lists, counts)
        got, tau = _bidir(attrs, lists, counts)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-4, rtol=0)
        # both views' final transmittance equals the total product
        np.testing.assert_allclose(np.asarray(tau), np.asarray(t_f),
                                   atol=5e-4, rtol=0)

    def test_exact_when_no_saturation(self):
        # tiny opacities: no early exit on either side -> the bidir
        # Horner splice is algebraically exact (same op class, fp only)
        attrs, lists, counts = _attrs_lists(opacity_scale=0.05)
        ref, _, _ = _mirror_avg(attrs, lists, counts)
        got, _ = _bidir(attrs, lists, counts)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-6, rtol=0)

    def test_saturated_stacks(self):
        # near-opaque gaussians force both views' early exits; deviations
        # stay within the documented T_EPS bound
        attrs, lists, counts = _attrs_lists(m=120, seed=3,
                                            opacity_scale=4.0)
        ref, _, _ = _mirror_avg(attrs, lists, counts)
        got, _ = _bidir(attrs, lists, counts)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-4, rtol=0)

    def test_empty_tiles(self):
        attrs, lists, counts = _attrs_lists(empty_tiles=True)
        assert int(np.asarray(counts).min()) == 0
        ref, t_f, _ = _mirror_avg(attrs, lists, counts)
        got, tau = _bidir(attrs, lists, counts)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-4, rtol=0)
        # empty tiles: transmittance 1, pure background
        empty = np.asarray(counts) == 0
        t = np.asarray(tau).reshape(5, 8, 3, 16)  # [ty, th, tx, tw]
        for ti in np.flatnonzero(empty):
            ty, tx = divmod(int(ti), 3)
            assert float(t[ty, :, tx, :].min()) == 1.0

    @pytest.mark.parametrize("seed", [1, 2])
    def test_partial_chunks(self, seed):
        # m=25 with chunk 16 -> per-tile counts straddle chunk boundaries
        attrs, lists, counts = _attrs_lists(m=25, seed=seed)
        ref, _, _ = _mirror_avg(attrs, lists, counts)
        got, _ = _bidir(attrs, lists, counts)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-4, rtol=0)


def test_render_frame_bidir_fallback_jnp():
    """On the jnp rasterizer the wrapper must defer to render_frame_views
    and return its average unchanged."""
    import jax

    from gsvc_tpu.config import ModelConfig
    from gsvc_tpu.models.gaussians import (
        GaussianConfig, GenerateMode, init_model, update_anchor_bound,
    )
    from gsvc_tpu.render.batched import (
        render_frame_bidir, render_frame_views,
    )
    from gsvc_tpu.render.pipeline import make_raster_settings

    mc = ModelConfig(threshold=0.15)
    cfg = GaussianConfig.from_model_config(mc)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.5, (64, 3)).astype(np.float32)
    state = init_model(jax.random.PRNGKey(0), cfg, pts, 64)
    state = update_anchor_bound(state, -1.0, -0.75, -0.5)
    settings = make_raster_settings(cfg, 40, 48, tile_h=8, tile_w=16,
                                    gaussian_cap=64, chunk=16,
                                    tiles_per_gaussian=32)
    args = (state, cfg, jnp.asarray(0.0), -1.0, -0.75, 24.0, settings, 32)
    avg_ref, _, _, _ = render_frame_views(
        *args, mode=GenerateMode.FULL_PRECISION, rasterizer="jnp",
        inference=True)
    avg_got, _, _ = render_frame_bidir(
        *args, mode=GenerateMode.FULL_PRECISION, rasterizer="jnp")
    np.testing.assert_allclose(np.asarray(avg_got), np.asarray(avg_ref),
                               atol=0, rtol=0)


def test_render_frame_bidir_pallas_end_to_end():
    """Full wrapper path (window + generation + binning + bidir kernel)
    vs render_frame_views' average on the pallas rasterizer."""
    import jax

    from gsvc_tpu.config import ModelConfig
    from gsvc_tpu.models.gaussians import (
        GaussianConfig, GenerateMode, init_model, update_anchor_bound,
    )
    from gsvc_tpu.render.batched import (
        render_frame_bidir, render_frame_views,
    )
    from gsvc_tpu.render.pipeline import make_raster_settings

    mc = ModelConfig(threshold=0.15)
    cfg = GaussianConfig.from_model_config(mc)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.5, 0.5, (64, 3)).astype(np.float32)
    state = init_model(jax.random.PRNGKey(1), cfg, pts, 64)
    state = update_anchor_bound(state, -1.0, -0.75, -0.5)
    settings = make_raster_settings(cfg, 40, 48, tile_h=8, tile_w=16,
                                    gaussian_cap=64, chunk=16,
                                    tiles_per_gaussian=32)
    args = (state, cfg, jnp.asarray(0.0), -1.0, -0.75, 24.0, settings, 32)
    avg_ref, _, _, aux_ref = render_frame_views(
        *args, mode=GenerateMode.FULL_PRECISION, rasterizer="pallas",
        inference=True)
    avg_got, tau, aux_got = render_frame_bidir(
        *args, mode=GenerateMode.FULL_PRECISION, rasterizer="pallas")
    np.testing.assert_allclose(np.asarray(avg_got), np.asarray(avg_ref),
                               atol=5e-4, rtol=0)
    assert np.asarray(tau).shape == np.asarray(avg_ref).shape[1:]
    # aux contracts agree (overflow / n_rendered)
    np.testing.assert_array_equal(np.asarray(aux_got[4]),
                                  np.asarray(aux_ref[4]))
