"""Multi-chip SPMD tests on the virtual 8-device CPU mesh.

Checks the z-slab sharded renderer against the single-device renderer and
runs the 2D (dp x sp) training step end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from gsvc_tpu.models.gaussians import GenerateMode
from gsvc_tpu.parallel.spmd import (
    combine_slab_renders, make_mesh, make_spmd_train_step, shard_model_state,
)
from gsvc_tpu.render.pipeline import make_raster_settings, render_frame
from gsvc_tpu.train.optim import adam_init
from gsvc_tpu.train.schedules import build_schedules
from gsvc_tpu.config import OptimizationConfig
from tests.test_model import make_state

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


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


def test_spmd_train_step_runs_and_improves():
    cfg, state = make_state(n=128, capacity=128, seed=3)
    settings = make_raster_settings(cfg, 24, 32, tile_h=8, tile_w=16,
                                    gaussian_cap=128, chunk=32)
    mesh = make_mesh(2, 4)
    state = shard_model_state(state, mesh)

    opt = OptimizationConfig(optical_lambda=0.0)
    step = make_spmd_train_step(cfg, settings, 32, opt,
                                width=32, height=24, **GEOM, mesh=mesh)
    adam = adam_init((state.anchors, state.nets))
    scheds = build_schedules(opt)
    lrs = {k: fn(1) for k, fn in scheds.items()}

    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0.2, 0.8, (2, 3, 24, 32)), jnp.float32)
    z1 = jnp.asarray([0.0, 0.01])
    z2 = jnp.asarray([0.01, 0.02])
    keys = jax.random.split(jax.random.PRNGKey(0), 2)

    losses = []
    for it in range(8):
        state, adam, metrics = step(state, adam, lrs, z1, z2, gt, gt, keys,
                                    mode=GenerateMode.FULL_PRECISION)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_spmd_entropy_mode_compiles():
    cfg, state = make_state(n=64, capacity=64, seed=4)
    settings = make_raster_settings(cfg, 16, 16, tile_h=8, tile_w=16,
                                    gaussian_cap=64, chunk=16)
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    state = shard_model_state(state, mesh)
    opt = OptimizationConfig(optical_lambda=0.0)
    step = make_spmd_train_step(cfg, settings, 32, opt,
                                width=16, height=16, x_min=-0.4,
                                y_min=-0.4, scale=20.0, mesh=mesh)
    adam = adam_init((state.anchors, state.nets))
    lrs = {k: fn(1) for k, fn in build_schedules(opt).items()}
    gt = jnp.full((2, 3, 16, 16), 0.5)
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    state, adam, metrics = step(
        state, adam, lrs, jnp.zeros(2), jnp.full(2, 0.01), gt, gt, keys,
        mode=GenerateMode.ENTROPY)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["bpp"]) > 0
