"""Rasterizer tests: tiled implementation vs dense oracle, gradients vs
finite differences, TSW window semantics, flip view."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.render.splat import (
    RasterSettings, rasterize, rasterize_dense_reference, project_gaussians,
)


def make_scene(m=40, seed=0, z_spread=0.2):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-0.8, 0.8, (m, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(-z_spread, z_spread, m)
    color = rng.uniform(0, 1, (m, 3)).astype(np.float32)
    opacity = rng.uniform(0.2, 0.9, (m, 1)).astype(np.float32)
    scaling = rng.uniform(0.02, 0.1, (m, 3)).astype(np.float32)
    rot = rng.normal(size=(m, 4)).astype(np.float32)
    rot[:, 0] += 2.0
    valid = np.ones(m, bool)
    return (jnp.asarray(xyz), jnp.asarray(color), jnp.asarray(opacity),
            jnp.asarray(scaling), jnp.asarray(rot), jnp.asarray(valid))


SETTINGS = RasterSettings(
    image_height=40, image_width=56, threshold=0.15, tile_h=8, tile_w=16,
    gaussian_cap=64, chunk=16, tiles_per_gaussian=32)

GEOM = dict(frame_z=0.0, x_min=-1.0, y_min=-0.75, scale=28.0)


class TestVsDenseOracle:
    @pytest.mark.parametrize("flip", [False, True])
    def test_matches_dense(self, flip):
        args = make_scene()
        out = rasterize(*args, **GEOM, settings=SETTINGS, flip=flip)
        ref = rasterize_dense_reference(*args, **GEOM, settings=SETTINGS,
                                        flip=flip)
        np.testing.assert_allclose(np.asarray(out.image), ref, atol=1e-4)

    def test_background(self):
        s = RasterSettings(**{**SETTINGS.__dict__, "bg": 1.0})
        args = make_scene(m=4)
        # push gaussians out of the window -> pure background
        xyz = args[0].at[:, 2].set(10.0)
        out = rasterize(xyz, *args[1:], **GEOM, settings=s)
        np.testing.assert_allclose(np.asarray(out.image), 1.0, atol=1e-6)

    def test_invalid_mask_respected(self):
        args = list(make_scene(m=20))
        valid = np.ones(20, bool)
        valid[10:] = False
        args[5] = jnp.asarray(valid)
        out = rasterize(*args, **GEOM, settings=SETTINGS)
        ref = rasterize_dense_reference(*args, **GEOM, settings=SETTINGS)
        np.testing.assert_allclose(np.asarray(out.image), ref, atol=1e-4)
        assert float(jnp.max(out.radii[10:])) == 0.0


class TestTSW:
    def test_z_window_culls(self):
        args = list(make_scene(m=10))
        xyz = np.asarray(args[0]).copy()
        xyz[:5, 2] = 0.5     # outside threshold=0.15
        xyz[5:, 2] = 0.01
        args[0] = jnp.asarray(xyz)
        proj = project_gaussians(args[0], args[3], args[4], args[5],
                                 **GEOM, settings=SETTINGS)
        assert not bool(jnp.any(proj.valid[:5]))
        assert bool(jnp.all(proj.radius[:5] == 0))

    def test_flip_mirrors_x(self):
        """flip view + x-flip of the image ~ forward view when order
        doesn't matter (single gaussian)."""
        args = list(make_scene(m=1))
        out_f = rasterize(*args, **GEOM, settings=SETTINGS, flip=False)
        out_b = rasterize(*args, **GEOM, settings=SETTINGS, flip=True)
        img_bf = np.asarray(out_b.image)[:, :, ::-1]
        # the mirrored pixel grid is offset by the even/odd pixel mapping:
        # x_min = -1, scale=28 -> mirror symmetric around pixel 27.5
        np.testing.assert_allclose(img_bf, np.asarray(out_f.image), atol=1e-4)


class TestGradients:
    def test_grad_matches_finite_difference(self):
        args = make_scene(m=6)
        target = jnp.ones((3, SETTINGS.image_height, SETTINGS.image_width)) * 0.5

        def loss(xyz, color, opacity, scaling):
            out = rasterize(xyz, color, opacity, scaling, args[4], args[5],
                            **GEOM, settings=SETTINGS)
            return jnp.mean((out.image - target) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
            args[0], args[1], args[2], args[3])
        eps = 2e-3
        for ai, arr in [(0, args[0]), (1, args[1]), (2, args[2]), (3, args[3])]:
            g = np.asarray(grads[ai])
            # check the largest-gradient coordinate by central differences
            fi = int(np.argmax(np.abs(g)))
            idx = np.unravel_index(fi, g.shape)
            ap = jnp.asarray(np.asarray(arr)).at[idx].add(eps)
            am = jnp.asarray(np.asarray(arr)).at[idx].add(-eps)
            fargs = [args[0], args[1], args[2], args[3]]
            fargs[ai] = ap
            fp = float(loss(*fargs))
            fargs[ai] = am
            fm = float(loss(*fargs))
            fd = (fp - fm) / (2 * eps)
            np.testing.assert_allclose(fd, g[idx], rtol=5e-2, atol=1e-6)

    def test_means2d_gradient_available(self):
        """Screen-space position gradients drive densification stats."""
        args = make_scene(m=8)
        means2d = jnp.zeros((8, 2))

        def loss(m2d):
            out = rasterize(*args, **GEOM, settings=SETTINGS, means2d=m2d)
            return jnp.mean(out.image ** 2)

        # rasterize signature: means2d keyword
        def loss2(m2d):
            from gsvc_tpu.render.splat import rasterize as rz
            out = rz(*args, **GEOM, settings=SETTINGS, means2d=m2d)
            return jnp.mean(out.image ** 2)

        g = jax.grad(loss2)(means2d)
        assert g.shape == (8, 2)
        assert float(jnp.sum(jnp.abs(g))) > 0


class TestDiagnostics:
    def test_overflow_reported(self):
        s = RasterSettings(
            image_height=16, image_width=16, threshold=1.0, tile_h=8,
            tile_w=16, gaussian_cap=8, chunk=8, tiles_per_gaussian=8)
        args = make_scene(m=64, z_spread=0.05)
        xyz = np.asarray(args[0]).copy()
        xyz[:, :2] = 0.0  # all in the same tile
        out = rasterize(jnp.asarray(xyz), *args[1:],
                        frame_z=0.0, x_min=-0.3, y_min=-0.3, scale=26.0,
                        settings=s)
        assert int(out.overflow) > 0


def test_quantized_rank_binning_depth_ordered():
    """Large scenes (m >= 4096) bin with an 18-bit quantized depth rank;
    every tile's list must still be depth-nondecreasing."""
    from gsvc_tpu.render.splat import Projected, _bin_gaussians

    m = 8192
    rng = np.random.default_rng(0)
    s = RasterSettings(image_height=32, image_width=64, threshold=0.15,
                       tile_h=8, tile_w=16, gaussian_cap=256, chunk=16,
                       tiles_per_gaussian=16)
    mean2d = rng.uniform([-4, -4], [68, 36], (m, 2)).astype(np.float32)
    depth = rng.uniform(-0.15, 0.15, m).astype(np.float32)
    proj = Projected(
        mean2d=jnp.asarray(mean2d),
        conic=jnp.ones((m, 3), jnp.float32),
        depth=jnp.asarray(depth),
        radius=jnp.full((m,), 3.0, jnp.float32),
        valid=jnp.ones((m,), bool))
    lists, counts, _, overflow, total = jax.jit(
        lambda p: _bin_gaussians(p, s))(proj)
    lists = np.asarray(lists)
    counts = np.asarray(counts)
    assert int(total) > 0
    for t in range(s.n_tiles):
        c = int(counts[t])
        if c < 2:
            continue
        d = depth[lists[t, :c]]
        assert (np.diff(d) >= -1e-6).all(), f"tile {t} out of depth order"
