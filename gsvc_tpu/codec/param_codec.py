"""MLP weight compression: 8-bit quantization + canonical Huffman + zlib.

Parity with the reference's MLP path (utils/param_utils.py:4-61,
utils/mask.py:9-48, quantize_model/encode_mlp scene/gaussian_model.py:
1727-1835): 2D weights are quantized per output dimension, 1D biases per
tensor; exact zeros keep a sparsity bitmask; the quantized ints are
Huffman coded and the scale/min metadata zlib-pickled.

Importantly, quantization *replaces* the live parameters before attribute
encoding, so the entropy-context networks the decoder reconstructs are
bit-identical to the ones the encoder used.
"""

from __future__ import annotations

import pickle
import zlib
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from gsvc_tpu.codec.huffman import (build_canonical_code, huffman_decode,
                                    huffman_encode)
from gsvc_tpu.models.gaussians import NetParams

_MLP_FIELDS = ("mlp_opacity", "mlp_cov", "mlp_color", "mlp_deform",
               "mlp_feature_enet", "mlp_scaling_enet", "mlp_offset_enet")


def _quantize_axis(t: np.ndarray, bits: int, axis: int):
    """Quantize along ``axis`` groups (axis=-1 => whole tensor).

    All arithmetic in float64 with a final float32 cast — the decoder
    dequantizes in float64, and the replaced live parameters must be
    BIT-IDENTICAL to what the decoder reconstructs (the entropy-context
    networks feed the rANS coder on both sides)."""
    valid = t != 0
    t64 = t.astype(np.float64)
    if axis < 0:
        vals = t64[valid]
        if vals.size:
            lo, hi = float(vals.min()), float(vals.max())
        else:
            lo = hi = 0.0
        s = (hi - lo) / (2 ** bits)
        q = np.round((t64 - lo) / (s + 1e-19))
        # lo/s ship as float32 (the 28 KB of pickled per-group float64
        # lists were 9% of the MLP stream); dequantize from the SNAPPED
        # values so live params stay bit-identical to the decoder's
        lo32 = np.float32(lo)
        s32 = np.float32(s)
        deq = np.float64(lo32) + np.float64(s32) * q
        new = np.where(valid, deq, 0.0).astype(np.float32)
        return (q.astype(np.int64), valid, new,
                {"t_min": np.asarray([lo32], np.float32),
                 "scale": np.asarray([s32], np.float32)})
    # per-group along axis (our Linear weights are [in, out]; quantize per
    # OUTPUT dim, i.e. axis=1 — the reference's per-first-dim on [out, in])
    n = t.shape[axis]
    q = np.zeros(t.shape, np.float64)
    new = np.zeros(t.shape, np.float64)
    mins, scales = [], []
    for i in range(n):
        sl = tuple(slice(None) if d != axis else i for d in range(t.ndim))
        sub = t64[sl]
        vals = sub[sub != 0]
        lo, hi = (float(vals.min()), float(vals.max())) if vals.size else (0.0, 0.0)
        s = (hi - lo) / (2 ** bits)
        qq = np.round((sub - lo) / (s + 1e-19))
        q[sl] = qq
        lo32 = np.float32(lo)
        s32 = np.float32(s)
        new[sl] = np.where(sub != 0,
                           np.float64(lo32) + np.float64(s32) * qq, 0.0)
        mins.append(lo32)
        scales.append(s32)
    return (q.astype(np.int64), valid, new.astype(np.float32),
            {"t_min": np.asarray(mins, np.float32),
             "scale": np.asarray(scales, np.float32)})


def _pack_bits(mask: np.ndarray) -> bytes:
    return zlib.compress(np.packbits(mask.astype(np.uint8)).tobytes(), 9)


def _unpack_bits(data: bytes, n: int) -> np.ndarray:
    return np.unpackbits(np.frombuffer(zlib.decompress(data), np.uint8))[:n]


def _flatten_mlps(nets: NetParams):
    """Deterministic (key, leaf) list over all MLP fields (nested dicts)."""
    import jax.tree_util as jtu

    items = []
    treedefs = {}
    for field in _MLP_FIELDS:
        leaves, treedef = jtu.tree_flatten_with_path(getattr(nets, field))
        treedefs[field] = treedef
        for path, leaf in leaves:
            key = field + "".join(str(p) for p in path)
            items.append((key, leaf))
    return items, treedefs


def encode_mlp_params(nets: NetParams, bits: int = 8):
    """Returns (stream bytes, quantized NetParams with replaced leaves)."""
    import jax.tree_util as jtu

    quant_syms: List[int] = []
    masks = []
    meta_list = []
    items, treedefs = _flatten_mlps(nets)
    new_leaves = {f: [] for f in _MLP_FIELDS}
    for key, p in items:
        arr = np.asarray(p)
        axis = 1 if arr.ndim == 2 else -1
        q, valid, new, meta = _quantize_axis(arr, bits, axis)
        quant_syms.extend(int(v) for v in q[valid].ravel())
        masks.append(valid.ravel())
        meta.update({"key": key, "shape": list(arr.shape), "axis": axis})
        meta_list.append(meta)
        field = next(f for f in _MLP_FIELDS if key.startswith(f))
        new_leaves[field].append(jnp.asarray(new))

    mask_cat = np.concatenate(masks)
    table = build_canonical_code(quant_syms)
    payload = huffman_encode(quant_syms, table)
    blob = {
        "meta": zlib.compress(pickle.dumps(
            {"table": table, "meta_list": meta_list,
             "n_syms": len(quant_syms)}), 9),
        "mask": _pack_bits(mask_cat),
        "params": payload,
    }
    stream = pickle.dumps(blob)
    new_nets = {
        f: jtu.tree_unflatten(treedefs[f], new_leaves[f])
        for f in _MLP_FIELDS}
    replaced = nets._replace(**new_nets)
    return stream, replaced


def decode_mlp_params(stream: bytes, template: NetParams) -> NetParams:
    """Rebuild quantized MLP weights; ``template`` provides tree structure
    (shapes are cross-checked against the stream metadata)."""
    import jax.tree_util as jtu

    blob = pickle.loads(stream)
    info = pickle.loads(zlib.decompress(blob["meta"]))
    syms = huffman_decode(blob["params"], info["table"], info["n_syms"])
    total_mask = sum(int(np.prod(m["shape"])) for m in info["meta_list"])
    mask = _unpack_bits(blob["mask"], total_mask)

    syms_pos = 0
    mask_pos = 0
    by_key = {}
    for meta in info["meta_list"]:
        shape = tuple(meta["shape"])
        n = int(np.prod(shape))
        valid = mask[mask_pos:mask_pos + n].astype(bool).reshape(shape)
        mask_pos += n
        nv = int(valid.sum())
        q = np.zeros(shape, np.float64)
        q[valid] = np.asarray(syms[syms_pos:syms_pos + nv], np.float64)
        syms_pos += nv
        axis = meta["axis"]
        t_min = np.asarray(meta["t_min"], np.float64)
        scale = np.asarray(meta["scale"], np.float64)
        if axis < 0:
            deq = t_min[0] + scale[0] * q
        else:
            bshape = [1] * len(shape)
            bshape[axis] = shape[axis]
            deq = t_min.reshape(bshape) + scale.reshape(bshape) * q
        by_key[meta["key"]] = np.where(valid, deq, 0.0).astype(np.float32)

    items, treedefs = _flatten_mlps(template)
    new_leaves = {f: [] for f in _MLP_FIELDS}
    for key, p in items:
        arr = by_key[key]
        assert arr.shape == tuple(np.asarray(p).shape), \
            f"shape mismatch for {key}"
        field = next(f for f in _MLP_FIELDS if key.startswith(f))
        new_leaves[field].append(jnp.asarray(arr))
    result = {
        f: jtu.tree_unflatten(treedefs[f], new_leaves[f])
        for f in _MLP_FIELDS}
    return template._replace(**result)
