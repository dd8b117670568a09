"""Custom-VJP Pallas compositing vs the autodiffed jnp compositor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.render.pallas_splat import rasterize_pallas_train
from gsvc_tpu.render.splat import rasterize
from tests.test_splat import GEOM, SETTINGS, make_scene


@pytest.mark.parametrize("flip", [False, True])
def test_forward_matches(flip):
    args = make_scene(m=40)
    ref = rasterize(*args, **GEOM, settings=SETTINGS, flip=flip)
    out = rasterize_pallas_train(*args, **GEOM, settings=SETTINGS,
                                 flip=flip)
    np.testing.assert_allclose(np.asarray(out.image),
                               np.asarray(ref.image), atol=1e-5)


def test_gradients_match_jnp():
    args = make_scene(m=24, seed=3)
    target = jnp.full((3, SETTINGS.image_height, SETTINGS.image_width), 0.4)

    def loss_jnp(xyz, color, opacity, scaling):
        out = rasterize(xyz, color, opacity, scaling, args[4], args[5],
                        **GEOM, settings=SETTINGS)
        return jnp.mean((out.image - target) ** 2) \
            + 0.1 * jnp.mean(out.transmittance)

    def loss_pallas(xyz, color, opacity, scaling):
        out = rasterize_pallas_train(xyz, color, opacity, scaling, args[4],
                                     args[5], **GEOM, settings=SETTINGS)
        return jnp.mean((out.image - target) ** 2) \
            + 0.1 * jnp.mean(out.transmittance)

    g_ref = jax.grad(loss_jnp, argnums=(0, 1, 2, 3))(*args[:4])
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args[:4])
    names = ["xyz", "color", "opacity", "scaling"]
    for name, a, b in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-6,
            err_msg=f"grad mismatch: {name}")


def test_means2d_gradient():
    args = make_scene(m=12, seed=5)
    m2d = jnp.zeros((12, 2))

    def loss(m2d_):
        out = rasterize_pallas_train(*args, **GEOM, settings=SETTINGS,
                                     means2d=m2d_)
        return jnp.mean(out.image ** 2)

    def loss_ref(m2d_):
        out = rasterize(*args, **GEOM, settings=SETTINGS, means2d=m2d_)
        return jnp.mean(out.image ** 2)

    g = jax.grad(loss)(m2d)
    g_ref = jax.grad(loss_ref)(m2d)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-7)


def test_early_saturation_grads_finite():
    args = list(make_scene(m=50, z_spread=0.05))
    op = np.full((50, 1), 0.97, np.float32)
    args[2] = jnp.asarray(op)

    def loss(xyz):
        out = rasterize_pallas_train(xyz, *args[1:], **GEOM,
                                     settings=SETTINGS)
        return jnp.mean(out.image)

    g = jax.grad(loss)(args[0])
    assert bool(jnp.all(jnp.isfinite(g)))


def test_bf16_compute_close_to_fp32():
    """bf16 alpha path (training fast mode) stays within ~1% of fp32."""
    from gsvc_tpu.render.splat import RasterSettings

    args = make_scene(m=30, seed=7)
    s16 = RasterSettings(**{**SETTINGS.__dict__,
                            "compute_dtype": "bfloat16"})
    out32 = rasterize_pallas_train(*args, **GEOM, settings=SETTINGS)
    out16 = rasterize_pallas_train(*args, **GEOM, settings=s16)
    np.testing.assert_allclose(np.asarray(out16.image),
                               np.asarray(out32.image), atol=2e-2)

    target = jnp.full((3, SETTINGS.image_height, SETTINGS.image_width), 0.4)

    def loss(settings, xyz):
        out = rasterize_pallas_train(xyz, *args[1:], **GEOM,
                                     settings=settings)
        return jnp.mean((out.image - target) ** 2)

    g32 = jax.grad(lambda x: loss(SETTINGS, x))(args[0])
    g16 = jax.grad(lambda x: loss(s16, x))(args[0])
    # gradient direction must agree (training-grade tolerance)
    cos = float(jnp.sum(g32 * g16)
                / (jnp.linalg.norm(g32) * jnp.linalg.norm(g16) + 1e-12))
    assert cos > 0.99, cos
