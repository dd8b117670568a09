"""GaussianModel state tests: init, windows, generation shapes, activations."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.config import ModelConfig
from gsvc_tpu.models.gaussians import (
    GaussianConfig, GenerateMode, get_mask, get_mask_anchor, get_scaling,
    generate_neural_gaussians, init_model, update_anchor_bound,
    window_for_frame,
)


def tiny_cfg():
    mc = ModelConfig(
        anchor_feature_dim=8, n_offsets=4, threshold=0.15,
        time_multi_res=4, offset_multi_res=4,
        log2=6, log2_2D=7, grid_feature_dim=2,
        resolutions_list=(6, 10), resolutions_list_2D=(12, 20))
    return GaussianConfig.from_model_config(mc)


def make_state(n=64, capacity=96, seed=0):
    cfg = tiny_cfg()
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    state = init_model(jax.random.PRNGKey(seed), cfg, pts, capacity,
                       voxel_size=0.001)
    state = update_anchor_bound(state, -0.6, -0.6, -0.6)
    return cfg, state


class TestInit:
    def test_anchors_sorted_and_padded(self):
        cfg, state = make_state()
        z = np.asarray(state.anchors.anchor[:, 2])
        n = int(state.n_active)
        assert np.all(np.diff(z[:n]) >= 0)
        assert np.all(z[n:] > 1e8)

    def test_bounds(self):
        cfg, state = make_state()
        np.testing.assert_allclose(np.asarray(state.x_bound_min),
                                   [[-0.66, -0.66, -0.66]], rtol=1e-6)

    def test_activations(self):
        cfg, state = make_state()
        s = get_scaling(state.anchors)
        assert float(jnp.min(s)) > 0
        m = get_mask(state.anchors)
        assert set(np.unique(np.asarray(m))) <= {0.0, 1.0}
        ma = get_mask_anchor(state.anchors)
        assert bool(jnp.all(ma[: int(state.n_active)]))


class TestWindow:
    def test_window_covers_band(self):
        cfg, state = make_state()
        cap = 96
        fz = 0.0
        start, in_window = window_for_frame(state, cfg, fz, cap)
        z = np.asarray(state.anchors.anchor[:, 2])
        n = int(state.n_active)
        expected = np.where(np.abs(z[:n] - fz) <= cfg.threshold)[0]
        s = int(start)
        got = s + np.where(np.asarray(in_window))[0]
        np.testing.assert_array_equal(np.sort(got), expected)

    def test_window_band_edge(self):
        cfg, state = make_state()
        start, in_window = window_for_frame(state, cfg, -10.0, 96)
        assert not bool(jnp.any(in_window))


class TestGeneration:
    @pytest.mark.parametrize("mode", [
        GenerateMode.FULL_PRECISION, GenerateMode.QUANTIZED_NOISE,
        GenerateMode.ENTROPY, GenerateMode.STE_ENTROPY])
    def test_shapes_and_finiteness(self, mode):
        cfg, state = make_state()
        cap = 96
        start, in_window = window_for_frame(state, cfg, 0.0, cap)
        gss = generate_neural_gaussians(
            state, cfg, frame_z=0.0, cam_z=0.0, window_start=start,
            in_window=in_window, cap=cap, mode=mode,
            key=jax.random.PRNGKey(1))
        rows = cap * cfg.n_offsets
        assert gss.xyz.shape == (rows, 3)
        assert gss.color.shape == (rows, 3)
        assert gss.opacity.shape == (rows, 1)
        assert gss.scaling.shape == (rows, 3)
        assert gss.rot.shape == (rows, 4)
        for leaf in [gss.xyz, gss.color, gss.opacity, gss.scaling, gss.rot]:
            assert bool(jnp.all(jnp.isfinite(leaf)))
        # culled rows have exactly zero opacity
        assert bool(jnp.all(jnp.where(gss.valid, True,
                                      gss.opacity[:, 0] == 0.0)))
        if mode in (GenerateMode.ENTROPY, GenerateMode.STE_ENTROPY):
            assert float(gss.rate.bit_per_param) > 0

    def test_gradients_flow(self):
        cfg, state = make_state()
        cap = 96

        def loss(anchors, nets):
            st = state._replace(anchors=anchors, nets=nets)
            start, in_window = window_for_frame(st, cfg, 0.0, cap)
            gss = generate_neural_gaussians(
                st, cfg, 0.0, 0.0, start, in_window, cap,
                GenerateMode.FULL_PRECISION)
            return jnp.sum(gss.xyz ** 2) + jnp.sum(gss.opacity ** 2) \
                + jnp.sum(gss.color ** 2)

        ga, gn = jax.grad(loss, argnums=(0, 1))(state.anchors, state.nets)
        assert float(jnp.sum(jnp.abs(ga.offset))) > 0
        assert float(jnp.sum(jnp.abs(ga.feat))) > 0
        assert float(jnp.sum(jnp.abs(
            jax.flatten_util.ravel_pytree(gn.mlp_opacity)[0]))) > 0
