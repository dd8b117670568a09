"""Whole-model rate estimator sanity (estimated tier of rate telemetry)."""

import numpy as np

from gsvc_tpu.codec.estimate import estimate_final_bits
from tests.test_bitstream import _randomize_state
from tests.test_model import make_state


def test_estimate_positive_and_composed():
    cfg, state = make_state(n=100, capacity=128, seed=0)
    state = _randomize_state(state)
    est = estimate_final_bits(state, cfg)
    assert est.bit_feat > 0
    assert est.bit_scaling > 0
    assert est.bit_offsets >= 0
    assert est.bit_hash > 0
    assert est.bit_masks > 0
    assert est.bit_mlp > 0
    assert est.bit_anchor == 100 * 3 * 16
    assert est.total > est.bit_feat


def test_estimate_tracks_real_encoding():
    """Estimated total should be within ~2x of the real stream size
    (the reference logs both tiers for exactly this cross-check)."""
    import pytest

    from gsvc_tpu.codec import native_available
    if not native_available():
        pytest.skip("native codec unavailable")
    from gsvc_tpu.codec.bitstream import conduct_encoding

    cfg, state = make_state(n=150, capacity=192, seed=1)
    state = _randomize_state(state, seed=2)
    est = estimate_final_bits(state, cfg)
    streams, meta, bit_info, _, _ = conduct_encoding(state, cfg)
    attr_est = est.bit_feat + est.bit_scaling + est.bit_offsets
    attr_real = bit_info.bit_feat + bit_info.bit_scaling \
        + bit_info.bit_offsets
    assert attr_real < attr_est * 2.0 + 1000
    assert attr_est < attr_real * 2.0 + 1000


def test_estimate_real_bits_consistency_tight():
    """Estimated vs rANS-encoded bits, stream by stream (the permanent
    version of the reference's TB cross-log, pipeline/train.py:203-261).

    feat/offsets/hash use the same Gaussian/Bernoulli models on both
    sides and must agree within a few percent.  The scaling stream is
    excluded from the tight bound: the real coder renormalizes its CDF
    over each batch's observed [min, max] symbol range, which wins big
    exactly when the (untrained in this test) entropy net's sigma is much
    wider than the data spread; on calibrated models the gap closes.
    """
    import pytest

    from gsvc_tpu.codec import native_available
    if not native_available():
        pytest.skip("native codec unavailable")
    from gsvc_tpu.codec.bitstream import conduct_encoding

    for seed in (2, 3):
        cfg, state = make_state(n=1000, capacity=1024, seed=seed)
        state = _randomize_state(state, seed=seed + 10)
        est = estimate_final_bits(state, cfg)
        streams, meta, bit_info, _, _ = conduct_encoding(state, cfg)
        for name, tol in (("feat", 0.03), ("offsets", 0.03),
                          ("hash", 0.03), ("masks", 0.10)):
            e = float(getattr(est, f"bit_{name}"))
            r = float(getattr(bit_info, f"bit_{name}"))
            assert abs(r - e) <= tol * max(e, 1.0) + 512, \
                f"{name}: est {e:.0f} vs real {r:.0f} (seed {seed})"
        # total attribute bits stay in the same ballpark even with the
        # scaling renormalization effect
        attr_est = est.bit_feat + est.bit_scaling + est.bit_offsets
        attr_real = (bit_info.bit_feat + bit_info.bit_scaling
                     + bit_info.bit_offsets)
        assert 0.75 * float(attr_est) - 512 <= float(attr_real) \
            <= 1.10 * float(attr_est) + 512
