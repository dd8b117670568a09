"""Attribute bitstream encode/decode — the full codec pipeline.

Parity with conduct_encoding / conduct_decoding and the z-sliced streaming
variants (scene/gaussian_model.py:1837-2311, 2313-2804):

  encode:  quantize+pack MLPs -> octree-code surviving anchors (+ Morton
           alignment permutation) -> per-batch: entropy context from the
           *decoder-identical* anchors -> deterministic symbol
           quantization -> rANS attribute streams -> Bernoulli-coded hash
           signs & gaussian masks -> zlib'd pickled meta.
  decode:  geometry -> masks & hash -> per-batch context from decoded
           anchors (the context-is-side-info trick: the entropy model's
           input is itself decodable first) -> rANS -> a decoded
           ModelState (activations bypassed, z-resorted for rendering).

The stream variants sort anchors into z-slices (interval 0.01) so each
frame needs only a prefix of the stream (reorder_and_split,
utils/encodings.py:827-861).

Bit-exactness rule: every quantity the decoder must reproduce is computed
by THE SAME jitted function over THE SAME batch slicing on both sides.
"""

from __future__ import annotations

import dataclasses
import functools
import pickle
import time
import zlib
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsvc_tpu.codec.native import (
    decode_binary, decode_gaussian_symbols, decode_octree, encode_binary,
    encode_gaussian_symbols, encode_octree, morton_sort_indices,
)
from gsvc_tpu.codec.hashctx import decode_hash_table, encode_hash_table
from gsvc_tpu.codec.param_codec import decode_mlp_params, encode_mlp_params
from gsvc_tpu.models.gaussians import (
    AnchorState, GaussianConfig, ModelState, NetParams, Q_FEAT, Q_OFFSETS,
    Q_SCALING, calc_entropy_context, get_anchor, get_mask, get_mask_anchor,
    get_scaling,
)
from gsvc_tpu.ops import ste_binary
from gsvc_tpu.ops.quant import (
    ANCHOR_ROUND_DIGITS, CLAMP_BOUND, quantize_anchor_indices,
)

MAX_BATCH = 1000
BIT2MB = 8 * 1024 * 1024
STREAM_Z_INTERVAL = 0.01

# Probability-parameter quantization grid (reference:
# common/range_coder.py:20,31-43 — Q_PROBA hard-coded to 1024).  μ and σ
# in symbol units are snapped to a 1/1024 grid before CDF construction on
# BOTH encode and decode, so the two sides build bit-identical CDFs as
# long as their independently computed f32 entropy contexts agree within
# half a grid step (~5e-4) — orders of magnitude above cross-backend XLA
# drift (~1e-6 relative).  Without this, encode-on-TPU → decode-on-CPU
# could shift one CDF boundary and desync the whole rANS stream.
Q_PROBA = 1024.0


def _flat_level_sizes(grid) -> list:
    """Per-level row counts in flattened table order (the 3D grid's
    levels, then the xy/xz/yz 2D grids' levels — MixGridSpec layout)."""
    return (list(grid.grid_3d.level_sizes)
            + list(grid.grid_2d.level_sizes) * 3)


def _quantize_proba(x: np.ndarray) -> np.ndarray:
    """Snap probability parameters to the 1/Q_PROBA grid (the reference's
    quantize_proba_parameters, common/range_coder.py:31-43; the +1e-6
    nudge keeps σ strictly positive after rounding)."""
    return np.round(np.asarray(x, np.float64) * Q_PROBA) / Q_PROBA + 1e-6


@dataclasses.dataclass
class EncodeMeta:
    """Side info shipped with the streams (utils/codec_utils.py:21-33)."""

    total_anchor_num: int
    anchor_num: int
    batch_size: int
    anchor_interval: np.ndarray       # [1, 3] float32
    anchor_min: np.ndarray            # [1, 3] float32
    batch_ranges: List[Tuple]         # per batch: ((f_lo,f_hi),(s..),(o..))
    prob_hash: float
    prob_masks: float
    streaming: bool = False
    index_splits: Optional[List[Tuple[int, int]]] = None
    # 2 = context-modeled hash stream (codec/hashctx.py); unpickled
    # pre-round-5 metas lack the attribute -> getattr default 1 (global
    # Bernoulli at prob_hash)
    hash_fmt: int = 2
    # self-contained decode info: model hyperparams + video geometry
    model_config: Optional[dict] = None
    video_info: Optional[dict] = None   # {width, height, num_frames}


@dataclasses.dataclass
class BitInfo:
    """Per-stream bit accounting (scene/gaussian_model.py:55-66)."""

    bit_anchor: int = 0
    bit_anchor_gpcc: int = 0
    bit_feat: int = 0
    bit_scaling: int = 0
    bit_offsets: int = 0
    bit_hash: int = 0
    bit_masks: int = 0
    bit_mlp: int = 0
    bit_mlp_encoded: int = 0
    bit_meta: int = 0

    @property
    def total_bits(self) -> int:
        return (self.bit_anchor_gpcc + self.bit_feat + self.bit_scaling
                + self.bit_offsets + self.bit_hash + self.bit_masks
                + self.bit_mlp_encoded + self.bit_meta)

    @property
    def total_mb(self) -> float:
        return self.total_bits / BIT2MB


@functools.partial(jax.jit, static_argnames=("cfg",))
def _context_batch(state: ModelState, cfg: GaussianConfig, anchors):
    """Device entropy context — training-time rate estimation only; the
    codec itself uses the deterministic host context below."""
    ec = calc_entropy_context(state, cfg, anchors, decoded=False)
    return ec


def _context_batch_padded(state, cfg, anchors_np, size: int):
    """Entropy context for one batch of decoder-order anchors.

    Computed by the DETERMINISTIC HOST path (codec/detctx.py): plain
    numpy float64 with fixed summation order, identical on encode and
    decode regardless of which accelerator either side runs on.  This is
    what makes encode-on-TPU → decode-on-CPU streams decodable — device
    f32 contexts differ across XLA backends, and one flipped CDF bin
    desyncs the whole rANS stream (tests/test_cross_backend.py).

    It is also much faster at encode time than the former padded device
    programs: no remote-compile round-trips through the TPU tunnel for
    ~100 flagship batches (``size`` is kept for signature compatibility;
    ragged batches are free on the host)."""
    from gsvc_tpu.codec.detctx import det_entropy_context

    del size  # host path has no fixed-shape compile constraint
    a = np.asarray(anchors_np, np.float32)
    return det_entropy_context(state, cfg, a)


def _symbol_range(mean: np.ndarray, q: np.ndarray) -> Tuple[int, int]:
    """calc_symbol_min_max (scene/gaussian_model.py:236-239)."""
    c = float(np.asarray(mean, np.float64).mean()
              / np.asarray(q, np.float64).mean())
    return int(c) - CLAMP_BOUND, int(c) + CLAMP_BOUND


def _quantize_clip(x, q, lo, hi):
    return np.clip(np.round(np.asarray(x, np.float64)
                            / np.asarray(q, np.float64)), lo, hi)


def _z_order_splits(anchors: np.ndarray, interval: float = STREAM_Z_INTERVAL):
    """Sort by (z, x, y) and split into z-interval bands
    (reorder_and_split, utils/encodings.py:827-861)."""
    order = np.lexsort((anchors[:, 1], anchors[:, 0], anchors[:, 2]))
    z = anchors[order, 2]
    z_lo = np.floor(z.min() / interval) * interval
    z_hi = np.ceil(z.max() / interval) * interval + 1e-10
    splits = []
    lb = z_lo
    while lb < z_hi:
        ub = lb + interval
        s = int(np.searchsorted(z, lb, side="left"))
        e = int(np.searchsorted(z, ub, side="left"))
        if e > s:
            splits.append((s, e))
        lb = ub
    return order, splits


CTX_CHUNK = 16_384


def _fullset_context(state, cfg, anchors_ordered, chunk: int = CTX_CHUNK):
    """Entropy context over the FULL ordered anchor set, computed in
    chunks and concatenated.  One pass serves both the global symbol
    ranges and every per-batch encode slice (the per-batch contexts are
    exactly rows [lo:hi] of this — the context is pointwise per anchor),
    halving flagship encode time (~24 s per 100k-anchor detctx pass)."""
    n = anchors_ordered.shape[0]
    parts = []
    for lo in range(0, n, chunk):
        a = anchors_ordered[lo:min(lo + chunk, n)]
        parts.append(_context_batch_padded(state, cfg, a, chunk))
    if len(parts) == 1:
        return parts[0]
    return type(parts[0])(*[
        np.concatenate([np.asarray(getattr(p, f)) for p in parts], axis=0)
        for f in parts[0]._fields])


def _fullset_symbol_ranges(ec) -> list:
    """(feat, scaling, offsets) symbol clip ranges from a full-set
    context (calc_symbol_min_max over the whole model,
    scene/gaussian_model.py:236-239)."""
    out = []
    for m, q in ((ec.mean_feat, Q_FEAT * ec.q_feat_adj),
                 (ec.mean_scaling, Q_SCALING * ec.q_scaling_adj),
                 (ec.mean_offsets, Q_OFFSETS * ec.q_offsets_adj)):
        m = np.asarray(m, np.float64)
        q = np.asarray(q, np.float64)
        c = m.mean() / q.mean()
        out.append((int(c) - CLAMP_BOUND, int(c) + CLAMP_BOUND))
    return out


def _encode_attribute_batches(state, cfg, anchors_ordered, feat, scaling,
                              offsets, masks, batches, streams, bit_info):
    """Shared batch loop for flat and streaming encoders."""
    k = cfg.n_offsets

    # ONE full-set context pass (chunked): global symbol clip ranges +
    # every per-batch slice come from it (the context is pointwise per
    # anchor, so batch rows [lo:hi] are exactly the full-set rows)
    ec_full = _fullset_context(state, cfg, anchors_ordered)
    feat_rng, scaling_rng, offsets_rng = _fullset_symbol_ranges(ec_full)

    batch_ranges = []
    for s, (lo, hi) in enumerate(batches):
        ec = type(ec_full)(*[np.asarray(getattr(ec_full, f))[lo:hi]
                             for f in ec_full._fields])
        qf = (Q_FEAT * ec.q_feat_adj).astype(np.float64)
        qs = (Q_SCALING * ec.q_scaling_adj).astype(np.float64)
        qo = (Q_OFFSETS * ec.q_offsets_adj).astype(np.float64)

        def _one(x, mean, scale, q, rng, name, mask=None):
            q_b = np.broadcast_to(q, x.shape)
            sym = _quantize_clip(x, q_b, rng[0], rng[1])
            if mask is not None:
                sym = sym[mask]
                mean = mean[mask]
                scale = scale[mask]
                q_b = q_b[mask]
            sym = sym.astype(np.int32).ravel()
            if sym.size == 0:
                streams[f"{name}_{s}.b"] = b""
                return (0, 1), 0
            lo_l, hi_l = int(sym.min()), int(sym.max())
            if lo_l == hi_l:
                hi_l += 1
            mu = _quantize_proba(
                (np.asarray(mean, np.float64) / q_b).ravel())
            sg = _quantize_proba(
                (np.asarray(scale, np.float64) / q_b).ravel())
            data = encode_gaussian_symbols(sym, mu, sg, lo_l, hi_l)
            streams[f"{name}_{s}.b"] = data
            return (lo_l, hi_l), len(data) * 8

        f_rng, f_bits = _one(feat[lo:hi], ec.mean_feat, ec.scale_feat, qf,
                             feat_rng, "feat")
        s_rng, s_bits = _one(scaling[lo:hi], ec.mean_scaling,
                             ec.scale_scaling, qs, scaling_rng, "scaling")
        mask3 = np.repeat(masks[lo:hi], 3, axis=-1).reshape(hi - lo, 3 * k)
        o_rng, o_bits = _one(offsets[lo:hi].reshape(hi - lo, 3 * k),
                             ec.mean_offsets, ec.scale_offsets, qo,
                             offsets_rng, "offsets",
                             mask=mask3.astype(bool))
        batch_ranges.append((f_rng, s_rng, o_rng))
        bit_info.bit_feat += f_bits
        bit_info.bit_scaling += s_bits
        bit_info.bit_offsets += o_bits
        if s % 16 == 0 and len(batches) > 20:
            print(f"[encode] batch {s + 1}/{len(batches)}", flush=True)
    return batch_ranges


def conduct_encoding(state: ModelState, cfg: GaussianConfig,
                     streaming: bool = False,
                     model_config: Optional[dict] = None,
                     video_info: Optional[dict] = None):
    """Full encode.  Returns (streams dict, EncodeMeta, BitInfo,
    state-with-quantized-MLPs)."""
    t0 = time.time()
    streams: Dict[str, bytes] = {}
    bit_info = BitInfo()

    # 1. MLPs: quantize (replacing live params) + pack
    mlp_stream, nets_q = encode_mlp_params(state.nets)
    state = state._replace(nets=nets_q)
    streams["mlp.pkl"] = mlp_stream
    bit_info.bit_mlp = sum(
        int(np.asarray(x).size) * 32
        for x in jax.tree.leaves((state.nets.mlp_opacity,
                                  state.nets.mlp_cov, state.nets.mlp_color,
                                  state.nets.mlp_deform,
                                  state.nets.mlp_feature_enet,
                                  state.nets.mlp_scaling_enet,
                                  state.nets.mlp_offset_enet)))
    bit_info.bit_mlp_encoded = len(mlp_stream) * 8

    # 2. surviving anchors -> octree geometry
    n_total = int(state.n_active)
    anchors_all = np.asarray(state.anchors.anchor)
    active = np.arange(anchors_all.shape[0]) < n_total
    mask_anchor = np.asarray(get_mask_anchor(state.anchors)) & active
    keep_idx = np.where(mask_anchor)[0]

    q_idx, interval, min_v = quantize_anchor_indices(
        jnp.asarray(anchors_all), state.x_bound_min, state.x_bound_max)
    q_np = np.asarray(q_idx).astype(np.uint32)[keep_idx]

    geom = encode_octree(q_np, ANCHOR_ROUND_DIGITS)
    streams["anchor.drc"] = geom
    sel = morton_sort_indices(q_np, ANCHOR_ROUND_DIGITS)
    n = q_np.shape[0]
    bit_info.bit_anchor = n * 3 * ANCHOR_ROUND_DIGITS
    bit_info.bit_anchor_gpcc = len(geom) * 8

    # 3. attributes in decoder order (quantized anchor positions!)
    # host-numpy dequantization: XLA may fuse idx*interval+min into an
    # FMA with backend-dependent rounding; two correctly-rounded numpy
    # f32 ops are bit-identical everywhere, and the decoder does the
    # same (cross-backend anchor-position determinism feeds detctx)
    order = keep_idx[sel]
    interval_np = np.asarray(interval, np.float32)
    min_np = np.asarray(min_v, np.float32)
    anchors_ordered = (q_np[sel].astype(np.float32) * interval_np
                       + min_np).astype(np.float32)
    feat = np.asarray(state.anchors.feat)[order]
    offsets = np.asarray(state.anchors.offset)[order]
    scaling = np.asarray(get_scaling(state.anchors))[order]
    masks = np.asarray(get_mask(state.anchors))[order]  # [n, K, 1] {0,1}

    index_splits = None
    if streaming:
        z_order, index_splits = _z_order_splits(anchors_ordered)
        anchors_ordered = anchors_ordered[z_order]
        feat, offsets = feat[z_order], offsets[z_order]
        scaling, masks = scaling[z_order], masks[z_order]
        batches = index_splits
    else:
        steps = (n + MAX_BATCH - 1) // MAX_BATCH
        batches = [(i * MAX_BATCH, min((i + 1) * MAX_BATCH, n))
                   for i in range(steps)]

    batch_ranges = _encode_attribute_batches(
        state, cfg, anchors_ordered, feat, scaling, offsets,
        masks[:, :, 0], batches, streams, bit_info)

    # 4. binary streams: hash signs + gaussian masks.  Hash bits are
    # context-coded (codec/hashctx.py): conditioning on the previous two
    # feature channels per (level, channel) beats the reference's single
    # global Bernoulli (utils/encodings.py:265-304) by ~25% measured on a
    # real fitted table.  prob_hash is still recorded: the TRAINING rate
    # estimate (and the reference) use the global-Bernoulli model, so the
    # telemetry cross-check stays comparable.
    hash_bin = np.asarray(ste_binary(state.nets.hash_table))
    hash_bits01 = ((hash_bin + 1) / 2).astype(np.uint8)
    prob_hash = float(hash_bits01.mean())
    streams["hash.b"] = encode_hash_table(hash_bits01,
                                          _flat_level_sizes(cfg.grid))
    bit_info.bit_hash = len(streams["hash.b"]) * 8

    mask_bits = masks.reshape(-1).astype(np.uint8)
    prob_masks = float(mask_bits.mean())
    streams["masks.b"] = encode_binary(mask_bits, prob_masks)
    bit_info.bit_masks = len(streams["masks.b"]) * 8

    meta = EncodeMeta(
        total_anchor_num=state.anchors.anchor.shape[0],
        anchor_num=n, batch_size=MAX_BATCH,
        anchor_interval=np.asarray(interval, np.float32),
        anchor_min=np.asarray(min_v, np.float32),
        batch_ranges=batch_ranges, prob_hash=prob_hash,
        prob_masks=prob_masks, streaming=streaming,
        index_splits=index_splits, model_config=model_config,
        video_info=video_info)
    streams["meta.bin"] = zlib.compress(pickle.dumps(meta), 9)
    bit_info.bit_meta = len(streams["meta.bin"]) * 8

    return streams, meta, bit_info, state, time.time() - t0


def conduct_decoding(streams: Dict[str, bytes], cfg: GaussianConfig,
                     template: ModelState, capacity: Optional[int] = None,
                     max_slices: Optional[int] = None):
    """Decode streams into a render-ready ModelState (decoded=True
    semantics: activations bypassed, anchors z-sorted).

    ``max_slices`` (streaming bitstreams only) decodes just the first k
    z-slices — the stream-decodability property: a frame near the start
    of the video needs only a prefix of the attribute streams (the
    geometry/mask/hash side info is global, as in the reference where
    tmc3 decodes all anchors up front).  Undedecoded anchors keep zero
    masks, so they render as absent."""
    t0 = time.time()
    meta: EncodeMeta = pickle.loads(zlib.decompress(streams["meta.bin"]))
    n = meta.anchor_num
    k = cfg.n_offsets

    nets = decode_mlp_params(streams["mlp.pkl"], template.nets)

    # geometry (host-numpy dequantization — mirrors the encoder exactly;
    # see the encode-side comment on FMA rounding)
    q_dec = decode_octree(streams["anchor.drc"], n, ANCHOR_ROUND_DIGITS)
    anchors_dec = (q_dec.astype(np.float32)
                   * np.asarray(meta.anchor_interval, np.float32)
                   + np.asarray(meta.anchor_min, np.float32)
                   ).astype(np.float32)

    # binary streams
    spec = cfg.grid
    hash_rows = spec.total_rows
    if getattr(meta, "hash_fmt", 1) >= 2:
        hash_bits = decode_hash_table(streams["hash.b"],
                                      _flat_level_sizes(spec),
                                      spec.n_features)
    else:  # pre-round-5 global-Bernoulli streams
        hash_bits = decode_binary(
            streams["hash.b"], hash_rows * spec.n_features,
            meta.prob_hash).reshape(hash_rows, spec.n_features)
    hash_table = hash_bits.astype(np.float32) * 2 - 1
    mask_bits = decode_binary(streams["masks.b"], n * k, meta.prob_masks)
    masks = mask_bits.astype(np.float32).reshape(n, k, 1)

    nets = nets._replace(hash_table=jnp.asarray(hash_table))

    # decode-side state for the entropy context: decoded hash + quantized
    # MLPs + the same bounds
    ctx_state = template._replace(nets=nets)

    if meta.streaming:
        z_order, index_splits = _z_order_splits(anchors_dec)
        anchors_ordered = anchors_dec[z_order]
        batches = meta.index_splits
    else:
        anchors_ordered = anchors_dec
        steps = (n + MAX_BATCH - 1) // MAX_BATCH
        batches = [(i * MAX_BATCH, min((i + 1) * MAX_BATCH, n))
                   for i in range(steps)]

    feat_out = np.zeros((n, cfg.feat_dim), np.float32)
    scaling_out = np.zeros((n, 6), np.float32)
    offsets_out = np.zeros((n, k, 3), np.float32)
    mask_ordered = masks.copy()  # mask stream was written in ordered layout

    if max_slices is not None:
        assert meta.streaming, "prefix decode needs a streaming bitstream"
        batches = batches[:max_slices]
        # anchors beyond the decoded prefix must not render
        if batches:
            mask_ordered[batches[-1][1]:] = 0.0
        else:
            mask_ordered[:] = 0.0

    for s, (lo, hi) in enumerate(batches):
        ec = _context_batch_padded(ctx_state, cfg, anchors_ordered[lo:hi],
                                   MAX_BATCH)
        qf = (Q_FEAT * ec.q_feat_adj).astype(np.float64)
        qs = (Q_SCALING * ec.q_scaling_adj).astype(np.float64)
        qo = (Q_OFFSETS * ec.q_offsets_adj).astype(np.float64)
        (f_rng, s_rng, o_rng) = meta.batch_ranges[s]

        def _dec(name, mean, scale, q, rng, count_shape, mask=None):
            data = streams[f"{name}_{s}.b"]
            q_b = np.broadcast_to(q, count_shape)
            mu = _quantize_proba(
                (np.asarray(mean, np.float64) / q_b).ravel())
            sg = _quantize_proba(
                (np.asarray(scale, np.float64) / q_b).ravel())
            qv = q_b.ravel()
            if mask is not None:
                mm = mask.ravel()
                mu, sg, qv = mu[mm], sg[mm], qv[mm]
            if mu.size == 0:
                return np.zeros(0, np.float64), np.zeros(0, np.float64)
            sym = decode_gaussian_symbols(data, mu, sg, rng[0], rng[1])
            return sym.astype(np.float64) * qv, None

        nb = hi - lo
        vals, _ = _dec("feat", ec.mean_feat, ec.scale_feat, qf, f_rng,
                       (nb, cfg.feat_dim))
        feat_out[lo:hi] = vals.reshape(nb, cfg.feat_dim)
        vals, _ = _dec("scaling", ec.mean_scaling, ec.scale_scaling, qs,
                       s_rng, (nb, 6))
        scaling_out[lo:hi] = vals.reshape(nb, 6)

        m3 = np.repeat(mask_ordered[lo:hi, :, 0], 3,
                       axis=-1).reshape(nb, 3 * k).astype(bool)
        vals, _ = _dec("offsets", ec.mean_offsets, ec.scale_offsets, qo,
                       o_rng, (nb, 3 * k), mask=m3)
        full = np.zeros((nb, 3 * k), np.float64)
        full[m3] = vals
        offsets_out[lo:hi] = full.reshape(nb, k, 3)

    if meta.streaming:
        # map back from z-order to morton order for a uniform layout
        inv = np.empty_like(z_order)
        inv[z_order] = np.arange(n)
        anchors_fin = anchors_ordered[inv]
        feat_fin, scaling_fin = feat_out[inv], scaling_out[inv]
        offsets_fin, masks_fin = offsets_out[inv], mask_ordered[inv]
    else:
        anchors_fin, feat_fin = anchors_ordered, feat_out
        scaling_fin, offsets_fin, masks_fin = (scaling_out, offsets_out,
                                               mask_ordered)

    # build render-ready state: z-sorted + padded
    cap = capacity or meta.total_anchor_num
    cap = max(cap, n)
    order = np.argsort(anchors_fin[:, 2], kind="stable")

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:n] = x[order]
        return jnp.asarray(out)

    anchor_pad = np.zeros((cap, 3), np.float32)
    anchor_pad[:n] = anchors_fin[order]
    anchor_pad[n:, 2] = 1e9
    rot = np.zeros((n, 4), np.float32)
    rot[:, 0] = 1
    anchors_state = AnchorState(
        anchor=jnp.asarray(anchor_pad),
        feat=pad(feat_fin),
        offset=pad(offsets_fin),
        mask=pad(masks_fin),
        scaling=pad(scaling_fin),
        rotation=pad(rot),
        opacity=pad(np.full((n, 1), float(np.log(0.1 / 0.9)), np.float32)),
    )
    decoded_state = template._replace(
        anchors=anchors_state, nets=nets,
        n_active=jnp.asarray(n, jnp.int32))
    return decoded_state, meta, time.time() - t0
