"""Context-modeled entropy coding of the binarized hash table.

The reference codes the hash-grid sign bits with ONE global Bernoulli
probability (utils/encodings.py:265-304 via torchac); at the fitted
p≈0.42 that is ~0.98 bits/bit — essentially incompressible.  Measured on
a real fitted table (artifacts/rd_r3 flagship), the bits are strongly
correlated across FEATURE channels within a row: conditioning each bit
on the previous two feature bits of the same row, with statistics kept
per (level, channel), drops the empirical conditional entropy from
424 KB to ~317 KB (-25%).

Model (static, two-pass — probabilities are estimated on the encoder,
quantized to a 1/4096 grid, and shipped in the stream header):

  channel 0:  ctx = level(row)                       (L contexts)
  channel c:  ctx = (c, level(row), b[r,c-1], b[r,c-2])   (c>=1; the
              second previous bit is 0 for c==1)      (7*L*4 contexts)

Decoding is plane-sequential: channel planes are decoded in order, so
every context bit is available before it is needed — each plane is one
vectorized rANS call (codec/native.py per-element-probability API).

Stream layout (self-contained):
  [u8 version=2][u16 n_ctx][n_ctx x u16 prob_q]
  [u32 plane_len x F][plane streams...]

On SMALL tables the probability-table header (2 bytes/context) can
outweigh the context gain; the encoder then falls back to the
reference's single global Bernoulli as a version-1 stream
  [u8 version=1][u16 prob_q][rANS stream]
choosing whichever encoding is smaller — so the coded size never
exceeds the global-Bernoulli estimate (estimate_final_bits) by more
than the rANS constant (tests/test_estimate.py consistency gates).
"""

from __future__ import annotations

import struct
from typing import Sequence, Tuple

import numpy as np

from gsvc_tpu.codec.native import decode_binary, encode_binary

PROB_Q = 4096
VERSION = 2


def _level_ids(level_sizes: Sequence[int]) -> np.ndarray:
    return np.repeat(np.arange(len(level_sizes), dtype=np.int64),
                     np.asarray(level_sizes, np.int64))


def _plane_ctx(levels: np.ndarray, n_levels: int, c: int,
               bits: np.ndarray) -> np.ndarray:
    """Context ids for channel plane ``c`` given previously (de)coded
    planes.  Layout: plane 0 uses [0, L); plane c>=1 uses
    [L + (c-1)*4L, L + c*4L)."""
    if c == 0:
        return levels
    b1 = bits[:, c - 1].astype(np.int64)
    b2 = (bits[:, c - 2].astype(np.int64) if c >= 2
          else np.zeros_like(b1))
    base = n_levels + (c - 1) * 4 * n_levels
    return base + levels * 4 + b1 * 2 + b2


def n_contexts(n_levels: int, n_features: int) -> int:
    return n_levels + (n_features - 1) * 4 * n_levels


def encode_hash_table(bits: np.ndarray,
                      level_sizes: Sequence[int]) -> bytes:
    """bits: uint8 {0,1} [rows, F] in table row order (3D levels then the
    three 2D grids, matching MixGridSpec's flattened layout)."""
    bits = np.ascontiguousarray(bits, np.uint8)
    rows, nf = bits.shape
    n_levels = len(level_sizes)
    levels = _level_ids(level_sizes)
    assert levels.shape[0] == rows, (levels.shape, rows)
    nc = n_contexts(n_levels, nf)

    # pass 1: per-context counts -> KT-smoothed, grid-quantized probs
    ones = np.zeros(nc, np.float64)
    total = np.zeros(nc, np.float64)
    for c in range(nf):
        ctx = _plane_ctx(levels, n_levels, c, bits)
        ones += np.bincount(ctx, weights=bits[:, c], minlength=nc)
        total += np.bincount(ctx, minlength=nc)
    p = (ones + 0.5) / (total + 1.0)
    prob_q = np.clip(np.round(p * PROB_Q), 1, PROB_Q - 1).astype(np.uint16)
    p_grid = prob_q.astype(np.float64) / PROB_Q

    # pass 2: one rANS stream per channel plane
    planes = []
    for c in range(nf):
        ctx = _plane_ctx(levels, n_levels, c, bits)
        planes.append(encode_binary(bits[:, c], p_grid[ctx]))

    head = struct.pack("<BH", VERSION, nc) + prob_q.tobytes()
    head += struct.pack(f"<{nf}I", *(len(s) for s in planes))
    ctx_blob = head + b"".join(planes)

    # global-Bernoulli fallback (the reference's model): pick whichever
    # stream is smaller, so tiny tables never pay the context header
    flat = bits.reshape(-1)
    p1 = (float(flat.sum()) + 0.5) / (flat.size + 1.0)
    pq = int(np.clip(round(p1 * PROB_Q), 1, PROB_Q - 1))
    glob = encode_binary(flat, np.full(flat.size, pq / PROB_Q))
    glob_blob = struct.pack("<BH", 1, pq) + glob
    return glob_blob if len(glob_blob) < len(ctx_blob) else ctx_blob


def decode_hash_table(blob: bytes, level_sizes: Sequence[int],
                      n_features: int) -> np.ndarray:
    version = blob[0]
    if version == 1:
        (pq,) = struct.unpack_from("<H", blob, 1)
        rows = int(np.sum(np.asarray(level_sizes, np.int64)))
        n = rows * n_features
        flat = decode_binary(blob[3:], n, np.full(n, pq / PROB_Q))
        return np.asarray(flat, np.uint8).reshape(rows, n_features)
    _, nc = struct.unpack_from("<BH", blob, 0)
    assert version == VERSION, f"unknown hash stream version {version}"
    off = 3
    n_levels = len(level_sizes)
    assert nc == n_contexts(n_levels, n_features)
    prob_q = np.frombuffer(blob, np.uint16, nc, off)
    off += 2 * nc
    lens = struct.unpack_from(f"<{n_features}I", blob, off)
    off += 4 * n_features
    p_grid = prob_q.astype(np.float64) / PROB_Q

    rows = int(np.sum(np.asarray(level_sizes, np.int64)))
    levels = _level_ids(level_sizes)
    bits = np.zeros((rows, n_features), np.uint8)
    for c in range(n_features):
        ctx = _plane_ctx(levels, n_levels, c, bits)
        plane = blob[off:off + lens[c]]
        off += lens[c]
        bits[:, c] = decode_binary(plane, rows, p_grid[ctx])
    return bits
