"""Batched pair rendering (render/batched.py) vs per-view render_frame.

The batched path shares generation between the two views of a frame and
derives the flip view's tile binning by mirror symmetry; in
FULL_PRECISION mode (no quantization noise) its images must match the
individual render_frame calls to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.config import ModelConfig
from gsvc_tpu.models.gaussians import (
    GaussianConfig, GenerateMode, init_model, update_anchor_bound,
)
from gsvc_tpu.render.batched import can_mirror, render_pair
from gsvc_tpu.render.pipeline import make_raster_settings, render_frame

WINDOW_CAP = 64
GEOM = dict(x_min=-1.0, y_min=-0.75, scale=24.0)
Z1, Z2 = 0.0, 0.05


def tiny_model(n=80, seed=0):
    mc = ModelConfig(
        anchor_feature_dim=8, n_offsets=4, threshold=0.3,
        time_multi_res=4, offset_multi_res=4,
        log2=6, log2_2D=7, grid_feature_dim=2,
        resolutions_list=(6, 10), resolutions_list_2D=(12, 20))
    cfg = GaussianConfig.from_model_config(mc)
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-0.9, -0.7, -0.15], [0.9, 0.7, 0.15],
                      (n, 3)).astype(np.float32)
    state = init_model(jax.random.PRNGKey(0), cfg, pts, capacity=128,
                       voxel_size=0.001)
    state = update_anchor_bound(state, -1.0, -0.75, -0.2)
    # non-degenerate features/offsets so the generator MLPs produce a mix
    # of visible and culled gaussians
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 1))
    anchors = state.anchors._replace(
        feat=0.5 * jax.random.normal(k1, state.anchors.feat.shape),
        offset=0.3 * jax.random.normal(k2, state.anchors.offset.shape),
    )
    return state._replace(anchors=anchors), cfg


def settings_for(cfg, width, gaussian_cap=128):
    return make_raster_settings(cfg, 40, width, tile_h=8, tile_w=16,
                                gaussian_cap=gaussian_cap, chunk=16,
                                tiles_per_gaussian=32)


def reference_views(state, cfg, settings, mode=GenerateMode.FULL_PRECISION):
    outs = []
    for z in (Z1, Z2):
        for flip in (False, True):
            outs.append(render_frame(
                state, cfg, z, settings=settings, window_cap=WINDOW_CAP,
                mode=mode, flip=flip, rasterizer="jnp", **GEOM))
    return outs


@pytest.mark.parametrize("width", [48, 56])
@pytest.mark.slow
def test_pair_matches_render_frame(width):
    """width=48 exercises the mirror fast path, 56 the rebin fallback."""
    state, cfg = tiny_model()
    settings = settings_for(cfg, width)
    assert can_mirror(settings) == (width == 48)
    pr = render_pair(state, cfg, Z1, Z2, settings=settings,
                     window_cap=WINDOW_CAP,
                     mode=GenerateMode.FULL_PRECISION, key=None,
                     rasterizer="jnp", **GEOM)
    refs = reference_views(state, cfg, settings)
    # flip views differ by ~1 ulp of the pixel coordinate ((W-1)-px vs the
    # direct flipped projection); alpha sensitivity amplifies that to ~5e-5
    for vi in range(4):
        np.testing.assert_allclose(
            np.asarray(pr.images[vi]), np.asarray(refs[vi].image),
            atol=1e-4, err_msg=f"view {vi}")
        np.testing.assert_allclose(
            np.asarray(pr.transmittances[vi]),
            np.asarray(refs[vi].transmittance), atol=1e-4)
    # shared-projection metadata matches the per-view calls
    np.testing.assert_array_equal(np.asarray(pr.renders[1].radii),
                                  np.asarray(refs[1].radii))


def test_pallas_batched_matches_jnp():
    """The 4-view concatenated grid through the Pallas kernels."""
    state, cfg = tiny_model(seed=3)
    settings = settings_for(cfg, 48)
    kw = dict(settings=settings, window_cap=WINDOW_CAP,
              mode=GenerateMode.FULL_PRECISION, key=None, **GEOM)
    ref = render_pair(state, cfg, Z1, Z2, rasterizer="jnp", **kw)
    out = render_pair(state, cfg, Z1, Z2, rasterizer="pallas_train", **kw)
    np.testing.assert_allclose(np.asarray(out.images),
                               np.asarray(ref.images), atol=1e-5)


@pytest.mark.slow
def test_gradients_match_unbatched():
    state, cfg = tiny_model(seed=5)
    settings = settings_for(cfg, 48)
    target = jnp.full((4, 3, settings.image_height, settings.image_width),
                      0.35)

    def loss_batched(feat):
        st = state._replace(anchors=state.anchors._replace(feat=feat))
        pr = render_pair(st, cfg, Z1, Z2, settings=settings,
                         window_cap=WINDOW_CAP,
                         mode=GenerateMode.FULL_PRECISION, key=None,
                         rasterizer="jnp", **GEOM)
        return jnp.mean((pr.images - target) ** 2)

    def loss_ref(feat):
        st = state._replace(anchors=state.anchors._replace(feat=feat))
        refs = reference_views(st, cfg, settings)
        imgs = jnp.stack([r.image for r in refs])
        return jnp.mean((imgs - target) ** 2)

    g_b = jax.grad(loss_batched)(state.anchors.feat)
    g_r = jax.grad(loss_ref)(state.anchors.feat)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_r),
                               rtol=2e-3, atol=1e-7)


@pytest.mark.slow
def test_entropy_mode_runs():
    state, cfg = tiny_model(seed=7)
    settings = settings_for(cfg, 48)
    pr = render_pair(state, cfg, Z1, Z2, settings=settings,
                     window_cap=WINDOW_CAP, mode=GenerateMode.ENTROPY,
                     key=jax.random.PRNGKey(11), rasterizer="jnp", **GEOM)
    assert np.isfinite(np.asarray(pr.images)).all()
    assert float(pr.renders[0].rate.bit_per_param) > 0
    # views of one frame share generation (and therefore the rate pack)
    assert float(pr.renders[0].rate.bit_per_param) == \
        float(pr.renders[1].rate.bit_per_param)


@pytest.mark.slow
def test_means2d_gradients_stay_per_view():
    """Each view's means2d cotangent must carry ONLY that view's screen
    gradients (the densification statistic); the mirror derivation must
    not leak the flip view's gradients into the forward slot."""
    state, cfg = tiny_model(seed=9)
    settings = settings_for(cfg, 48)
    rows = WINDOW_CAP * cfg.n_offsets
    w = jnp.asarray([1.0, 2.0, 3.0, 4.0])

    def loss_batched(m2d):
        pr = render_pair(state, cfg, Z1, Z2, settings=settings,
                         window_cap=WINDOW_CAP,
                         mode=GenerateMode.FULL_PRECISION, key=None,
                         rasterizer="jnp", means2d=m2d, **GEOM)
        return jnp.sum(w[:, None, None, None] * pr.images ** 2)

    g = jax.grad(loss_batched)(jnp.zeros((4, rows, 2)))

    views = [(Z1, False), (Z1, True), (Z2, False), (Z2, True)]
    for vi, (z, flip) in enumerate(views):
        def loss_ref(mv, z=z, flip=flip, wv=w[vi]):
            r = render_frame(state, cfg, z, settings=settings,
                             window_cap=WINDOW_CAP,
                             mode=GenerateMode.FULL_PRECISION,
                             flip=flip, rasterizer="jnp", means2d=mv,
                             **GEOM)
            return wv * jnp.sum(r.image ** 2)

        # atol 2e-4: the flip view's pixel coordinate differs by ~1 ulp
        # from the direct flipped projection, which can flip a gaussian
        # across the ALPHA_MIN cutoff and discretely change its (tiny)
        # screen gradient
        g_ref = jax.grad(loss_ref)(jnp.zeros((rows, 2)))
        np.testing.assert_allclose(np.asarray(g[vi]), np.asarray(g_ref),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=f"view {vi}")


@pytest.mark.slow
def test_means2d_gradients_pallas_matches_jnp():
    """The mirror-kernel path's per-view mu-grad outputs (do_stats mode)
    must reproduce the jnp path's means2d cotangents — including the
    grid-row ordering of the per-view blocks (caught live: a view-major
    read of the u-major blocks permuted the densification screen
    gradients into noise on real TPU)."""
    state, cfg = tiny_model(seed=9)
    settings = settings_for(cfg, 48)
    rows = WINDOW_CAP * cfg.n_offsets
    w = jnp.asarray([1.0, 2.0, 3.0, 4.0])

    def loss(m2d, rast):
        pr = render_pair(state, cfg, Z1, Z2, settings=settings,
                         window_cap=WINDOW_CAP,
                         mode=GenerateMode.FULL_PRECISION, key=None,
                         rasterizer=rast, means2d=m2d, **GEOM)
        return jnp.sum(w[:, None, None, None] * pr.images ** 2)

    z = jnp.zeros((4, rows, 2))
    g_jnp = jax.grad(lambda m: loss(m, "jnp"))(z)
    g_pal = jax.grad(lambda m: loss(m, "pallas_train"))(z)
    for vi in range(4):
        np.testing.assert_allclose(np.asarray(g_pal[vi]),
                                   np.asarray(g_jnp[vi]),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=f"view {vi}")


@pytest.mark.slow
def test_pair_entropy_contexts_match_direct():
    """The union-window context slices must equal per-window queries,
    in both the shared-union and fallback branches."""
    import jax.numpy as jnp

    from gsvc_tpu.models.gaussians import calc_entropy_context, get_anchor
    from gsvc_tpu.render.batched import _pair_entropy_contexts

    state, cfg = tiny_model(seed=13)
    cap = 48  # < capacity(128) so slack > 0
    anchor_q = get_anchor(state)

    def direct(start):
        a = jax.lax.dynamic_slice_in_dim(anchor_q, start, cap, 0)
        return calc_entropy_context(state, cfg, a)

    for s1, s2 in ((3, 7), (10, 10), (0, 70)):   # near, equal, fallback
        ecs = _pair_entropy_contexts(state, cfg, jnp.asarray(s1),
                                     jnp.asarray(s2), cap, False)
        # the union query batches the MLP matmuls at a different size, so
        # reassociation shifts a few elements by ~1e-4 relative — well
        # inside training noise (the CODEC context path is separate and
        # uses fixed padded batches on both sides)
        for ec, st in zip(ecs, (s1, s2)):
            ref = direct(st)
            for a, b in zip(jax.tree.leaves(ec), jax.tree.leaves(ref)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-3, atol=1e-5)
