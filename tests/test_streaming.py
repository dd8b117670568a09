"""Stream decodability: a frame near z_min renders identically from a
prefix of the z-sliced bitstream (the property the reference's
reorder_and_split layout exists for)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.codec import native_available
from gsvc_tpu.codec.bitstream import conduct_decoding, conduct_encoding
from gsvc_tpu.models.gaussians import GenerateMode
from gsvc_tpu.render.pipeline import make_raster_settings, render_frame
from tests.test_bitstream import _randomize_state
from tests.test_model import make_state

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native codec unavailable")


def test_prefix_decode_renders_early_frames():
    cfg, state = make_state(n=200, capacity=256, seed=1)
    state = _randomize_state(state)

    streams, meta, _, enc_state, _ = conduct_encoding(state, cfg,
                                                      streaming=True)
    n_slices = len(meta.index_splits)
    assert n_slices > 3, "test needs several z slices"

    full, _, _ = conduct_decoding(streams, cfg, enc_state, capacity=256)

    # enough slices to cover z in [z_min, frame_z + threshold]
    z_vals = np.asarray(full.anchors.anchor[:meta.anchor_num, 2])
    frame_z = float(np.quantile(z_vals, 0.1))
    # index_splits are z-ordered bands; find how many cover frame_z + thr
    zs = np.sort(z_vals)
    need = 0
    for s, (lo, hi) in enumerate(meta.index_splits):
        band_lo = zs[min(lo, len(zs) - 1)]
        if band_lo <= frame_z + cfg.threshold:
            need = s + 1
    prefix, _, _ = conduct_decoding(streams, cfg, enc_state, capacity=256,
                                    max_slices=need)

    settings = make_raster_settings(cfg, 24, 32, tile_h=8, tile_w=16,
                                    gaussian_cap=128, chunk=32)
    kw = dict(x_min=-0.6, y_min=-0.45, scale=26.0, settings=settings,
              window_cap=256, mode=GenerateMode.DECODED, decoded=True)
    img_full = render_frame(full, cfg, frame_z, **kw).image
    img_prefix = render_frame(prefix, cfg, frame_z, **kw).image
    np.testing.assert_allclose(np.asarray(img_prefix),
                               np.asarray(img_full), atol=1e-5)

    # sanity: an empty prefix renders nothing
    none_dec, _, _ = conduct_decoding(streams, cfg, enc_state, capacity=256,
                                      max_slices=0)
    img_none = render_frame(none_dec, cfg, frame_z, **kw).image
    assert float(jnp.abs(img_none).max()) == 0.0
