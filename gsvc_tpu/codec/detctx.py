"""Deterministic host entropy context — the cross-backend decode anchor.

The attribute rANS streams are coded against entropy contexts (μ, σ, q)
produced by tiny MLPs over a hash-grid interpolation.  If those contexts
came from the accelerator, encode-on-TPU → decode-on-CPU would hinge on
two different XLA backends producing bit-identical f32 — they do not,
and one flipped CDF boundary desyncs the entire stream (demonstrated by
tests/test_cross_backend.py's drift-injection test at 1e-5 drift).

This module re-implements the decode-relevant context path in plain
numpy float64 with a *fixed summation order* (np.einsum with
optimize=False runs its own C sum-of-products loop; it never dispatches
to BLAS, whose blocking/threading varies across builds and CPUs):

    exact int anchors → dequantize → bound-normalize → mix-grid
    interpolation (gathers + elementwise) → 3 entropy nets (einsum
    matmuls + tanh-GELU) → clip/exp/floor

Every input is exact on both sides (octree-decoded integer anchor
indices, ±1 hash signs, 8-bit-dequantized MLP weights, f32 bound
scalars), and every op is either IEEE-exact (add/mul/floor/gather) or a
libm transcendental (tanh, exp) whose cross-platform disagreement is a
few ulps (~1e-15 relative).  The Q_PROBA=1024 snap in bitstream.py then
absorbs that residue: a boundary flip needs ~5e-4 drift, eleven orders
of magnitude above the libm residue.

Semantics parity: models/gaussians.py:calc_entropy_context /
ops/hashgrid.py:mix_grid_encode (reference: scene/gaussian_model.py:
81-147 Mix3d2dEncoding, utils/encodings.py:485-709 GridEncoder), with
``binarize`` = plain sign (STE at f64: sign of the stored table — the
encoder's table is pre-binarization, the decoder's already ±1; sign() is
idempotent on both).  Verified against the jitted f32 path in
tests/test_detctx.py.
"""

from __future__ import annotations

import numpy as np

from gsvc_tpu.models.gaussians import EntropyContext
from gsvc_tpu.ops.hashgrid import HashGridSpec, MixGridSpec

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint64)


def _matmul(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    # optimize=False keeps einsum on its deterministic C SOP loop —
    # never BLAS (whose summation order is platform-dependent)
    return np.einsum("nd,dh->nh", x, w, optimize=False)


def _linear(p, x: np.ndarray) -> np.ndarray:
    return _matmul(x, np.asarray(p["w"], np.float64)) \
        + np.asarray(p["b"], np.float64)


def _gelu_tanh(x: np.ndarray) -> np.ndarray:
    """jax.nn.gelu(approximate=True): tanh-form GELU."""
    c = np.float64(np.sqrt(2.0 / np.pi))
    return 0.5 * x * (1.0 + np.tanh(c * (x + 0.044715 * x ** 3)))


def _entropy_net(p, x: np.ndarray):
    h = _gelu_tanh(_linear(p["dist0"], x))
    if "dist1" in p:
        h = _gelu_tanh(_linear(p["dist1"], h))
    params = _linear(p["dist_out"], h)
    mean, scale = np.split(params, 2, axis=-1)
    q = _linear(p["q1"], _gelu_tanh(_linear(p["q0"], x)))
    return mean, scale, q


def _grid_level(x: np.ndarray, res: int, level_size: int,
                level_offset: int, num_dim: int):
    """Corner (rows, weights) for one level — hashgrid.py:_level_indices
    in f64 numpy."""
    pos = x * np.float64(res - 2) + 0.5
    pos_grid = np.floor(pos)
    frac = pos - pos_grid
    pos_grid = pos_grid.astype(np.int64)

    use_hash = (res ** num_dim) > level_size
    n_corners = 1 << num_dim
    idxs, ws = [], []
    for corner in range(n_corners):
        w = np.ones((x.shape[0],), np.float64)
        coords = []
        for d in range(num_dim):
            if (corner >> d) & 1:
                w = w * frac[:, d]
                coords.append(np.minimum(pos_grid[:, d] + 1, res - 1))
            else:
                w = w * (1.0 - frac[:, d])
                coords.append(pos_grid[:, d])
        coords = np.stack(coords, axis=-1)
        valid = np.all((coords > 0) & (coords < res - 1), axis=-1)
        if use_hash:
            h = np.zeros((x.shape[0],), np.uint64)
            for d in range(num_dim):
                h = h ^ ((coords[:, d].astype(np.uint64) * _PRIMES[d])
                         & np.uint64(0xFFFFFFFF))
            idx = (h % np.uint64(level_size)).astype(np.int64)
        else:
            stride = 1
            idx = np.zeros((x.shape[0],), np.int64)
            for d in range(num_dim):
                idx = idx + coords[:, d] * stride
                stride *= res
            idx = idx % level_size
        idxs.append(idx + level_offset)
        ws.append(np.where(valid, w, 0.0))
    return np.stack(idxs, axis=1), np.stack(ws, axis=1)


def _grid_encode(params: np.ndarray, x: np.ndarray,
                 spec: HashGridSpec) -> np.ndarray:
    n = x.shape[0]
    c = 1 << spec.num_dim
    outs = []
    for lvl in range(spec.n_levels):
        idx, w = _grid_level(x, spec.resolutions[lvl],
                             spec.level_sizes[lvl],
                             spec.level_offsets[lvl], spec.num_dim)
        acc = np.zeros((n, spec.n_features), np.float64)
        wn = np.zeros((n, 1), np.float64)
        for corner in range(c):
            wc = w[:, corner]
            acc = acc + wc[:, None] * params[idx[:, corner]]
            wn = wn + wc[:, None]
        outs.append(acc / np.maximum(wn, 1e-9))
    return np.concatenate(outs, axis=-1)


def _mix_grid(table: np.ndarray, xn: np.ndarray,
              spec: MixGridSpec) -> np.ndarray:
    s = spec.param_splits()
    p_xyz, p_xy, p_xz, p_yz = (table[s[0]:s[1]], table[s[1]:s[2]],
                               table[s[2]:s[3]], table[s[3]:s[4]])
    return np.concatenate([
        _grid_encode(p_xyz, xn, spec.grid_3d),
        _grid_encode(p_xy, xn[:, (0, 1)], spec.grid_2d),
        _grid_encode(p_xz, xn[:, (0, 2)], spec.grid_2d),
        _grid_encode(p_yz, xn[:, (1, 2)], spec.grid_2d),
    ], axis=-1)


def det_entropy_context(state, cfg, anchors: np.ndarray) -> EntropyContext:
    """EntropyContext from f64 host math (encode AND decode side).

    ``state``: ModelState whose nets carry the CODED weights (quantized
    MLPs; hash table pre- or post-binarization — sign() is applied).
    ``anchors``: [N, 3] float — the decoder-identical anchor positions.
    Returns numpy float64 EntropyContext.
    """
    x = np.asarray(anchors, np.float64)
    lo = np.asarray(state.x_bound_min, np.float64)
    hi = np.asarray(state.x_bound_max, np.float64)
    xn = (x - lo) / (hi - lo)

    table = np.sign(np.asarray(state.nets.hash_table, np.float64))
    table = np.where(table == 0.0, 1.0, table)  # ste_binary maps 0 -> +1
    feat_ctx = _mix_grid(table, xn, cfg.grid)

    nets = state.nets
    m_f, s_f, qf = _entropy_net(_np_tree(nets.mlp_feature_enet), feat_ctx)
    m_s, s_s, qs = _entropy_net(_np_tree(nets.mlp_scaling_enet), feat_ctx)
    m_o, s_o, qo = _entropy_net(_np_tree(nets.mlp_offset_enet), feat_ctx)

    clip_exp = lambda v: np.exp(np.clip(v, -10.0, 10.0))  # noqa: E731
    floor = lambda v: np.maximum(v, 1e-9)                 # noqa: E731
    return EntropyContext(
        mean_feat=m_f, scale_feat=floor(s_f),
        mean_scaling=m_s, scale_scaling=floor(s_s),
        mean_offsets=m_o, scale_offsets=floor(s_o),
        q_feat_adj=clip_exp(qf), q_scaling_adj=clip_exp(qs),
        q_offsets_adj=clip_exp(qo),
    )


def _np_tree(p):
    return {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
            if isinstance(v, dict) else np.asarray(v, np.float64)
            for k, v in p.items()}
