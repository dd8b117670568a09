"""Decode fidelity: rendering the decoded state must match rendering the
encoder state in STE mode with quantized MLPs — i.e. the codec itself is
lossless beyond its declared quantization.

(The reference relies on this implicitly: eval after the round trip IS
its quality number. A mismatch here means a codec bug, not quantization.)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.codec import native_available
from gsvc_tpu.codec.bitstream import conduct_decoding, conduct_encoding
from gsvc_tpu.models.gaussians import (
    GenerateMode, ModelState, get_anchor, get_mask, get_mask_anchor,
    get_scaling, Q_FEAT, Q_SCALING, Q_OFFSETS, calc_entropy_context,
)
from gsvc_tpu.render.pipeline import make_raster_settings, render_frame
from tests.test_bitstream import _randomize_state
from tests.test_model import make_state

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native codec unavailable")


def test_decoded_attributes_match_ste_quantization():
    """Per-anchor attributes after decode == deterministic quantization of
    the encoder state with the same entropy context."""
    cfg, state = make_state(n=150, capacity=192, seed=4)
    state = _randomize_state(state, seed=4)
    streams, meta, _, enc, _ = conduct_encoding(state, cfg)
    dec, _, _ = conduct_decoding(streams, cfg, enc, capacity=192)
    n = meta.anchor_num

    keep = np.asarray(get_mask_anchor(enc.anchors)).copy()
    keep &= np.arange(keep.shape[0]) < int(enc.n_active)
    enc_anchor = np.asarray(get_anchor(enc))[keep]
    dec_anchor = np.asarray(dec.anchors.anchor)[:n]

    order_e = np.lexsort((enc_anchor[:, 1], enc_anchor[:, 0],
                          enc_anchor[:, 2]))
    order_d = np.lexsort((dec_anchor[:, 1], dec_anchor[:, 0],
                          dec_anchor[:, 2]))

    # expected quantized values from the decoded anchors' context
    ec = calc_entropy_context(enc, cfg, jnp.asarray(dec_anchor[order_d]))
    q_feat = np.asarray(Q_FEAT * ec.q_feat_adj, np.float64)
    enc_feat = np.asarray(enc.anchors.feat)[keep][order_e].astype(np.float64)
    expected = np.round(enc_feat / q_feat) * q_feat
    got = np.asarray(dec.anchors.feat)[:n][order_d]
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    q_scaling = np.asarray(Q_SCALING * ec.q_scaling_adj, np.float64)
    enc_scaling = np.asarray(get_scaling(enc.anchors))[keep][order_e]
    expected_s = np.round(enc_scaling / q_scaling) * q_scaling
    got_s = np.asarray(dec.anchors.scaling)[:n][order_d]
    np.testing.assert_allclose(got_s, expected_s, rtol=1e-4, atol=1e-6)

    k = cfg.n_offsets
    q_off = np.asarray(Q_OFFSETS * ec.q_offsets_adj,
                       np.float64)[:, :, None].reshape(-1, 1, 1)
    enc_off = np.asarray(enc.anchors.offset)[keep][order_e]
    mask = np.asarray(get_mask(enc.anchors))[keep][order_e]
    expected_o = np.round(enc_off / q_off) * q_off * mask
    got_o = np.asarray(dec.anchors.offset)[:n][order_d]
    np.testing.assert_allclose(got_o, expected_o, rtol=1e-4, atol=1e-6)


def test_decoded_render_matches_ste_render_of_quantized_state():
    """Build a state whose attributes are already the decoded values, but
    through the normal (non-decoded) activations — rendering both ways
    must agree, proving the decoded-activation bypass is consistent."""
    cfg, state = make_state(n=120, capacity=160, seed=5)
    state = _randomize_state(state, seed=5)
    streams, meta, _, enc, _ = conduct_encoding(state, cfg)
    dec, _, _ = conduct_decoding(streams, cfg, enc, capacity=160)

    settings = make_raster_settings(cfg, 24, 32, tile_h=8, tile_w=16,
                                    gaussian_cap=128, chunk=32)
    kw = dict(x_min=-0.6, y_min=-0.45, scale=26.0, settings=settings,
              window_cap=160)

    img_dec = render_frame(dec, cfg, 0.0, mode=GenerateMode.DECODED,
                           decoded=True, **kw).image

    # reconstruct an equivalent "training-domain" state: inverse-activate
    # the decoded attributes back to raw parameters
    n = meta.anchor_num
    anchors = dec.anchors
    inv_scaling = jnp.log(jnp.maximum(anchors.scaling, 1e-12))
    # mask {0,1} -> logits around the 0.01 sigmoid threshold
    inv_mask = jnp.where(anchors.mask > 0.5, 10.0, -10.0)
    raw = enc._replace(anchors=anchors._replace(
        scaling=inv_scaling, mask=inv_mask),
        nets=dec.nets, n_active=dec.n_active)
    img_raw = render_frame(raw, cfg, 0.0,
                           mode=GenerateMode.FULL_PRECISION, **kw).image
    # the raw render re-quantizes anchors (16-bit) — identical values —
    # and activations invert exactly, so images should agree closely
    np.testing.assert_allclose(np.asarray(img_raw), np.asarray(img_dec),
                               atol=5e-3)
