"""calc_interp_feat backend dispatch: the lanegather kernel (interpret
mode on CPU) must agree with the XLA path through the full model entry
point, including bounds normalization and STE binarization."""
import dataclasses

import jax
import numpy as np

from gsvc_tpu.config import ModelConfig
from gsvc_tpu.models.gaussians import (
    GaussianConfig, calc_interp_feat, init_model,
)


def test_lanegather_backend_matches_xla():
    mc = ModelConfig()
    cfg = GaussianConfig.from_model_config(mc)
    assert cfg.hash_backend == "auto"
    pts = np.asarray(jax.random.uniform(jax.random.PRNGKey(2), (64, 3),
                                        minval=-0.4, maxval=0.4))
    state = init_model(jax.random.PRNGKey(0), cfg, pts, capacity=64)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (64, 3),
                                      minval=-0.4, maxval=0.4))
    ref = calc_interp_feat(state, dataclasses.replace(
        cfg, hash_backend="xla"), x)
    out = calc_interp_feat(state, dataclasses.replace(
        cfg, hash_backend="lanegather"), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)
    # "auto" resolves to the XLA path on the CPU test mesh
    auto = calc_interp_feat(state, cfg, x)
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(ref))
