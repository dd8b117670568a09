"""Cross-backend decodability of the attribute streams.

The rANS CDFs are built from f32 entropy-net outputs.  Encode-on-TPU →
decode-on-CPU (the deployment shape of a codec, cli/decode.py) therefore
relies on the probability-parameter quantization grid
(bitstream.Q_PROBA, reference common/range_coder.py:31-43): both sides
snap μ/σ to a 1/1024 grid, so backend f32 drift far below half a grid
step cannot move a CDF boundary and desync the stream.

Two tests:
  * inject synthetic drift (10× a pessimistic cross-backend bound) into
    the decode-side context and require the decoded model to match the
    clean decode — proof the grid absorbs drift;
  * decode in a fresh subprocess from serialized streams only — proof
    the decoder needs no in-process state left over from the encoder.
"""

import pickle
import subprocess
import sys

import numpy as np
import pytest

import gsvc_tpu.codec.bitstream as bs
from gsvc_tpu.codec import native_available
from gsvc_tpu.codec.bitstream import conduct_decoding, conduct_encoding
from tests.test_bitstream import _randomize_state
from tests.test_model import make_state

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native codec unavailable")

# The decode-relevant context is computed by the deterministic host
# path (codec/detctx.py): the only cross-platform residue is libm
# last-ulp disagreement on tanh/exp (~1e-15 relative, amplified to at
# most ~1e-13 through the tiny nets).  We inject 1e-9 — four orders of
# magnitude above that — and require the decode to survive: the
# Q_PROBA=1024 snap absorbs anything below ~5e-4.
#
# (Historical note: with device-computed f32 contexts, realistic
# cross-backend drift is ~1e-6 and this test FAILED at 1e-5 with a 43%
# corrupted stream — the motivation for detctx.py.)
DRIFT_REL = 1e-9


def _decoded_planes(dec_state, n):
    a = dec_state.anchors
    return {
        "anchor": np.asarray(a.anchor)[:n],
        "feat": np.asarray(a.feat)[:n],
        "scaling": np.asarray(a.scaling)[:n],
        "offset": np.asarray(a.offset)[:n],
        "mask": np.asarray(a.mask)[:n],
    }


def test_context_drift_absorbed(monkeypatch):
    cfg, state = make_state(n=200, capacity=256, seed=3)
    state = _randomize_state(state, seed=4)
    streams, meta, bit_info, enc_state, _ = conduct_encoding(state, cfg)

    clean_state, meta_c, _ = conduct_decoding(streams, cfg, enc_state,
                                              capacity=256)
    clean = _decoded_planes(clean_state, meta_c.anchor_num)

    orig = bs._context_batch_padded
    rng = np.random.default_rng(7)

    def drifted(state_, cfg_, anchors_np, size):
        ec = orig(state_, cfg_, anchors_np, size)
        # deterministic multiplicative drift on every context field the
        # CDFs depend on (means, scales, and the q modifiers)
        def jiggle(v):
            v = np.asarray(v)
            eps = rng.uniform(-DRIFT_REL, DRIFT_REL, v.shape)
            return (v * (1.0 + eps)).astype(v.dtype)
        return type(ec)(*[jiggle(f) for f in ec])

    monkeypatch.setattr(bs, "_context_batch_padded", drifted)
    drift_state, meta_d, _ = conduct_decoding(streams, cfg, enc_state,
                                              capacity=256)
    drifted_pl = _decoded_planes(drift_state, meta_d.anchor_num)

    # a single desynced rANS bin corrupts everything after it, producing
    # O(symbol-range) garbage — surviving with ~drift-scale deltas
    # proves every CDF landed on the same grid point
    for k in clean:
        np.testing.assert_allclose(
            drifted_pl[k], clean[k], rtol=1e-6, atol=1e-6,
            err_msg=f"decoded plane {k!r} diverged: rANS desync")


@pytest.mark.slow
def test_decode_in_fresh_process(tmp_path):
    cfg, state = make_state(n=150, capacity=192, seed=5)
    state = _randomize_state(state, seed=6)
    streams, meta, bit_info, enc_state, _ = conduct_encoding(state, cfg)

    ref_state, meta_r, _ = conduct_decoding(streams, cfg, enc_state,
                                            capacity=192)
    ref = _decoded_planes(ref_state, meta_r.anchor_num)

    import jax
    blob = tmp_path / "case.pkl"
    with open(blob, "wb") as f:
        pickle.dump({
            "streams": streams,
            "mc": None,
            "template": jax.tree.map(np.asarray, enc_state),
        }, f)
    out = tmp_path / "decoded.pkl"

    child = f"""
import pickle, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
sys.path.insert(0, {str(tmp_path.parent.parent)!r})
sys.path.insert(0, "/root/repo")
from gsvc_tpu.codec.bitstream import conduct_decoding
from tests.test_model import make_state

with open({str(blob)!r}, "rb") as f:
    case = pickle.load(f)
cfg, _ = make_state(n=150, capacity=192, seed=5)
template = jax.tree.map(jnp.asarray, case["template"])
dec, meta, _ = conduct_decoding(case["streams"], cfg, template,
                                capacity=192)
n = meta.anchor_num
with open({str(out)!r}, "wb") as f:
    pickle.dump({{
        "anchor": np.asarray(dec.anchors.anchor)[:n],
        "feat": np.asarray(dec.anchors.feat)[:n],
        "scaling": np.asarray(dec.anchors.scaling)[:n],
        "offset": np.asarray(dec.anchors.offset)[:n],
        "mask": np.asarray(dec.anchors.mask)[:n],
    }}, f)
"""
    r = subprocess.run([sys.executable, "-c", child],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"child failed:\n{r.stdout}\n{r.stderr}"
    with open(out, "rb") as f:
        got = pickle.load(f)
    for k in ref:
        np.testing.assert_allclose(
            got[k], ref[k], rtol=1e-5, atol=1e-6,
            err_msg=f"fresh-process decode diverged on {k!r}")
