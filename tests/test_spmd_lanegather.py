"""The lane-gather hash kernel must run under shard_map on the test
mesh (interpret mode): sp-sharded anchors each compute their slab's
entropy context through the kernel and agree with the XLA backend."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from gsvc_tpu.config import ModelConfig
from gsvc_tpu.models.gaussians import GaussianConfig, calc_interp_feat, init_model
from gsvc_tpu.parallel.spmd import make_mesh
import pytest

pytestmark = pytest.mark.slow


def test_lanegather_inside_shard_map_matches_xla():
    mc = ModelConfig(resolutions_list=(18, 24), resolutions_list_2D=(130,),
                     log2=10, log2_2D=11, grid_feature_dim=4)
    cfg = GaussianConfig.from_model_config(mc)
    pts = np.asarray(jax.random.uniform(jax.random.PRNGKey(2), (64, 3),
                                        minval=-0.4, maxval=0.4))
    state = init_model(jax.random.PRNGKey(0), cfg, pts, capacity=64)
    x = jnp.asarray(jax.random.uniform(jax.random.PRNGKey(1), (8 * 16, 3),
                                       minval=-0.3, maxval=0.3))

    mesh = make_mesh(1, 8)
    lane_cfg = dataclasses.replace(cfg, hash_backend="lanegather")

    def shard_fn(xs):
        return calc_interp_feat(state, lane_cfg, xs)

    # check_vma=False matches the product shard_map wrappers
    # (parallel/spmd.py): pallas_call out_shapes carry no vma info.
    f = jax.shard_map(shard_fn, mesh=mesh, in_specs=P("sp"),
                      out_specs=P("sp"), check_vma=False)
    out = f(x)
    ref = calc_interp_feat(state, dataclasses.replace(
        cfg, hash_backend="xla"), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)
