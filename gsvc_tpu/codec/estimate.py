"""Whole-model rate estimation (estimate_final_bits,
scene/gaussian_model.py:1599-1725).

Runs fully on device with static shapes: masked-out / padding anchors
contribute zero bits via weights instead of gathers.  This is the
"estimated" tier of the reference's three-tier rate telemetry
(train-sampled / estimated / real — pipeline/train.py:153-261).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsvc_tpu.models.gaussians import (
    GaussianConfig, ModelState, Q_FEAT, Q_OFFSETS, Q_SCALING,
    calc_entropy_context, get_anchor, get_mask, get_mask_anchor, get_scaling,
)
from gsvc_tpu.ops import binary_vxl_size, gaussian_bits, ste_binary
from gsvc_tpu.ops.quant import ANCHOR_ROUND_DIGITS, CLAMP_BOUND


class EstimatedBits(NamedTuple):
    bit_anchor: jnp.ndarray
    bit_feat: jnp.ndarray
    bit_scaling: jnp.ndarray
    bit_offsets: jnp.ndarray
    bit_hash: jnp.ndarray
    bit_masks: jnp.ndarray
    bit_mlp: jnp.ndarray

    @property
    def total(self):
        return (self.bit_anchor + self.bit_feat + self.bit_scaling
                + self.bit_offsets + self.bit_hash + self.bit_masks
                + self.bit_mlp)


def _mlp_bits(state: ModelState) -> float:
    n = sum(int(x.size) for x in jax.tree.leaves((
        state.nets.mlp_opacity, state.nets.mlp_cov, state.nets.mlp_color,
        state.nets.mlp_deform, state.nets.mlp_feature_enet,
        state.nets.mlp_scaling_enet, state.nets.mlp_offset_enet)))
    return float(n * 32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _estimate_device(state: ModelState, cfg: GaussianConfig):
    anchors = state.anchors
    k = cfg.n_offsets
    cap = anchors.anchor.shape[0]

    active = jnp.arange(cap) < state.n_active
    w_anchor = (get_mask_anchor(anchors) & active).astype(jnp.float32)
    w = w_anchor[:, None]

    anchor_q = get_anchor(state)
    ec = calc_entropy_context(state, cfg, anchor_q)
    q_feat = Q_FEAT * ec.q_feat_adj
    q_scaling = Q_SCALING * ec.q_scaling_adj
    q_offsets = Q_OFFSETS * ec.q_offsets_adj

    def rng_of(mean, q):
        c = jnp.sum(mean * w) / jnp.maximum(jnp.sum(w) * mean.shape[-1], 1.0) \
            / (jnp.sum(q * w) / jnp.maximum(jnp.sum(w), 1.0))
        c = jnp.floor(c)
        return c - CLAMP_BOUND, c + CLAMP_BOUND

    f_lo, f_hi = rng_of(ec.mean_feat, q_feat)
    s_lo, s_hi = rng_of(ec.mean_scaling, q_scaling)
    o_lo, o_hi = rng_of(ec.mean_offsets, q_offsets)

    feat_sym = jnp.clip(jnp.round(anchors.feat / q_feat), f_lo, f_hi)
    scaling_sym = jnp.clip(jnp.round(get_scaling(anchors) / q_scaling),
                           s_lo, s_hi)
    offsets_flat = anchors.offset.reshape(cap, 3 * k)
    offsets_sym = jnp.clip(jnp.round(offsets_flat / q_offsets), o_lo, o_hi)

    bit_feat = jnp.sum(gaussian_bits(
        feat_sym, ec.mean_feat, ec.scale_feat, q_feat, quantized=True) * w)
    bit_scaling = jnp.sum(gaussian_bits(
        scaling_sym, ec.mean_scaling, ec.scale_scaling, q_scaling,
        quantized=True) * w)
    mask = get_mask(anchors)
    mask3 = jnp.repeat(mask[:, :, 0], 3, axis=-1).reshape(cap, 3 * k)
    bit_offsets = jnp.sum(gaussian_bits(
        offsets_sym, ec.mean_offsets, ec.scale_offsets, q_offsets,
        quantized=True) * mask3 * w)

    n_kept = jnp.sum(w_anchor)
    bit_anchor = n_kept * 3 * ANCHOR_ROUND_DIGITS

    hash_bin = (ste_binary(state.nets.hash_table) + 1) / 2
    _, bit_hash, _, _ = binary_vxl_size(hash_bin)
    # mask bits over kept anchors only (weighted closed form)
    pos = jnp.sum(mask[:, :, 0] * w)
    tot = jnp.maximum(jnp.sum(w) * k, 1.0)
    p = jnp.clip(pos / tot, 1e-6, 1 - 1e-6)
    bit_masks = pos * (-jnp.log2(p)) + (tot - pos) * (-jnp.log2(1 - p)) + 32.0
    return (bit_anchor, bit_feat, bit_scaling, bit_offsets, bit_hash,
            bit_masks)


def estimate_final_bits(state: ModelState, cfg: GaussianConfig) -> EstimatedBits:
    (ba, bf, bs, bo, bh, bm) = jax.device_get(_estimate_device(state, cfg))
    return EstimatedBits(
        bit_anchor=float(ba), bit_feat=float(bf), bit_scaling=float(bs),
        bit_offsets=float(bo), bit_hash=float(bh), bit_masks=float(bm),
        bit_mlp=_mlp_bits(state))
