"""matmul_dtype precision modes of the Pallas compositing kernels.

"bf16x2" runs the transmittance cumsum as an error-compensated two-pass
bf16 matmul and the backward's gradient matmuls on bf16 inputs — the
image must stay ~1e-4-close to the f32 path and gradients within the
same relative band the bf16 fast mode is validated to (grad cosine).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.render.pallas_splat import (
    mirror_composite_attrs, rasterize_pallas, rasterize_pallas_train,
)
from gsvc_tpu.render.splat import rasterize
from tests.test_splat import GEOM, SETTINGS, make_scene

BF2 = dataclasses.replace(SETTINGS, matmul_dtype="bf16x2")


@pytest.mark.parametrize("flip", [False, True])
def test_bf16x2_image_close_to_f32(flip):
    args = make_scene(m=40)
    ref = rasterize(*args, **GEOM, settings=SETTINGS, flip=flip)
    out = rasterize_pallas(*args, **GEOM, settings=BF2, flip=flip)
    np.testing.assert_allclose(np.asarray(out.image),
                               np.asarray(ref.image), atol=3e-4)
    np.testing.assert_allclose(np.asarray(out.transmittance),
                               np.asarray(ref.transmittance), atol=3e-4)


def test_bf16x2_gradients_close():
    args = make_scene(m=24, seed=3)
    target = jnp.full((3, SETTINGS.image_height, SETTINGS.image_width), 0.4)

    def make_loss(settings, fn):
        def loss(xyz, color, opacity, scaling):
            out = fn(xyz, color, opacity, scaling, args[4], args[5],
                     **GEOM, settings=settings)
            return jnp.mean((out.image - target) ** 2) \
                + 0.1 * jnp.mean(out.transmittance)
        return loss

    g_ref = jax.grad(make_loss(SETTINGS, rasterize),
                     argnums=(0, 1, 2, 3))(*args[:4])
    g_bf2 = jax.grad(make_loss(BF2, rasterize_pallas_train),
                     argnums=(0, 1, 2, 3))(*args[:4])
    for name, a, b in zip(["xyz", "color", "opacity", "scaling"],
                          g_ref, g_bf2):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
        assert cos > 0.999, f"{name}: grad cosine {cos}"
        # scale agreement, not just direction
        ratio = np.linalg.norm(b) / (np.linalg.norm(a) + 1e-30)
        assert 0.99 < ratio < 1.01, f"{name}: grad norm ratio {ratio}"


def test_bf16x2_mirror_kernel_matches_f32_mirror():
    """The mirror composite path (the product train step) under bf16x2
    stays close to its own f32 version on both views."""
    from gsvc_tpu.render.splat import (
        _bin_gaussians, attr_rows_from_proj, project_gaussians,
    )

    args = make_scene(m=40, seed=1)
    xyz, color, opacity, scaling, rot, valid = args
    proj = project_gaussians(xyz, scaling, rot, valid, 0.0,
                             GEOM["x_min"], GEOM["y_min"], GEOM["scale"],
                             SETTINGS)
    op = jnp.where(proj.valid[:, None], opacity, 0.0)
    lists, counts, _, _, _ = _bin_gaussians(proj, SETTINGS)
    attrs = attr_rows_from_proj(proj, op, color)

    out_f32 = mirror_composite_attrs(SETTINGS, attrs[None], lists[None],
                                     counts[None], None)
    out_bf2 = mirror_composite_attrs(BF2, attrs[None], lists[None],
                                     counts[None], None)
    np.testing.assert_allclose(np.asarray(out_bf2), np.asarray(out_f32),
                               atol=3e-4)
