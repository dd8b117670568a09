"""Pallas tile kernel vs the jnp compositor (interpret mode on CPU)."""

import jax
import numpy as np
import pytest

from gsvc_tpu.render.pallas_splat import rasterize_pallas
from gsvc_tpu.render.splat import rasterize
from tests.test_splat import GEOM, SETTINGS, make_scene


@pytest.mark.parametrize("flip", [False, True])
def test_pallas_matches_jnp(flip):
    args = make_scene(m=40)
    ref = rasterize(*args, **GEOM, settings=SETTINGS, flip=flip)
    out = rasterize_pallas(*args, **GEOM, settings=SETTINGS, flip=flip)
    np.testing.assert_allclose(np.asarray(out.image),
                               np.asarray(ref.image), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.transmittance),
                               np.asarray(ref.transmittance), atol=1e-5)


def test_pallas_early_exit_unaffected_by_saturation():
    """A wall of opaque gaussians saturates T; late gaussians must not
    contribute — and results must still match the jnp compositor."""
    args = list(make_scene(m=60, z_spread=0.1))
    op = np.asarray(args[2]).copy()
    op[:] = 0.95
    args[2] = jax.numpy.asarray(op)
    ref = rasterize(*args, **GEOM, settings=SETTINGS)
    out = rasterize_pallas(*args, **GEOM, settings=SETTINGS)
    np.testing.assert_allclose(np.asarray(out.image),
                               np.asarray(ref.image), atol=1e-5)
