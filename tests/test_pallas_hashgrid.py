"""Lane-gather hash-grid kernel vs the XLA reference path.

Forward must match exactly (same gather + f32 accumulation order);
gradients (table and positions) must match the XLA vjp closely.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.config import ModelConfig
from gsvc_tpu.ops.hashgrid import (
    init_mix_grid_params, make_grid_spec, make_mix_grid_spec,
    mix_grid_encode, hashgrid_encode, init_grid_params,
)
from gsvc_tpu.ops.pallas_hashgrid import (
    lanegather_encode, mix_grid_encode_lanegather, pack_tables,
    spec_from_hashgrid,
)
from gsvc_tpu.ops.quant import ste_binary


def _mix_spec(F=4):
    mc = ModelConfig()
    return make_mix_grid_spec(F, mc.resolutions_list, mc.log2,
                              mc.resolutions_list_2D, mc.log2_2D)


def test_single_grid_forward_matches_xla():
    hs = make_grid_spec(3, 4, (18, 24, 33), 13)
    key = jax.random.PRNGKey(0)
    params = init_grid_params(key, hs, std=0.3)
    x = jax.random.uniform(jax.random.PRNGKey(1), (301, 3))
    ref = hashgrid_encode(params, x, hs)
    ls = spec_from_hashgrid(hs)
    packed = pack_tables(params, ls, hs.level_offsets[:-1])
    out = lanegather_encode(packed, x, ls)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("F", [4, 8])
def test_mix_forward_matches_xla(F):
    spec = _mix_spec(F)
    params = init_mix_grid_params(jax.random.PRNGKey(0), spec, std=0.5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
    ref = mix_grid_encode(params, x, spec)
    out = mix_grid_encode_lanegather(params, x, spec)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_mix_forward_binarized_matches_xla():
    spec = _mix_spec(4)
    params = init_mix_grid_params(jax.random.PRNGKey(2), spec)
    x = jax.random.uniform(jax.random.PRNGKey(3), (130, 3))
    ref = mix_grid_encode(params, x, spec, binarize=ste_binary)
    out = mix_grid_encode_lanegather(params, x, spec, binarize=ste_binary)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_mix_gradients_match_xla():
    spec = _mix_spec(4)
    params = init_mix_grid_params(jax.random.PRNGKey(4), spec, std=0.4)
    x = jax.random.uniform(jax.random.PRNGKey(5), (200, 3),
                           minval=0.05, maxval=0.95)
    key = jax.random.PRNGKey(6)

    def loss(fn):
        def f(p, xx):
            out = fn(p, xx, spec)
            cot = jax.random.normal(key, out.shape)
            return jnp.sum(out * cot)
        return f

    gp_ref, gx_ref = jax.grad(loss(mix_grid_encode), argnums=(0, 1))(
        params, x)
    gp, gx = jax.grad(loss(mix_grid_encode_lanegather), argnums=(0, 1))(
        params, x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)


def test_gradients_with_ste_binarize():
    spec = _mix_spec(4)
    params = init_mix_grid_params(jax.random.PRNGKey(7), spec)
    x = jax.random.uniform(jax.random.PRNGKey(8), (150, 3),
                           minval=0.1, maxval=0.9)

    def loss(fn):
        def f(p):
            out = fn(p, x, spec, binarize=ste_binary)
            return jnp.sum(out ** 2)
        return f

    gp_ref = jax.grad(loss(mix_grid_encode))(params)
    gp = jax.grad(loss(mix_grid_encode_lanegather))(params)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp_ref),
                               rtol=1e-4, atol=1e-5)
