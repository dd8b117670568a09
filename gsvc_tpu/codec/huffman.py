"""Canonical Huffman coding for small integer alphabets.

Used for the 8-bit-quantized MLP weights (the reference uses the
``dahuffman`` package at scene/gaussian_model.py:1802-1804; this is a
self-contained replacement with a canonical code so the table serializes
as just (symbol, length) pairs).
"""

from __future__ import annotations

import heapq
from collections import Counter
from typing import Dict, List, Sequence, Tuple


def _code_lengths(freqs: Dict[int, int]) -> Dict[int, int]:
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    lengths = {s: 0 for s in freqs}
    counter = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, counter, s1 + s2))
        counter += 1
    return lengths


def build_canonical_code(symbols: Sequence[int]) -> List[Tuple[int, int]]:
    """Returns [(symbol, bit_length)] sorted canonically."""
    lengths = _code_lengths(Counter(symbols))
    return sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))


def _assign_codes(table: List[Tuple[int, int]]) -> Dict[int, Tuple[int, int]]:
    codes = {}
    code = 0
    prev_len = 0
    for sym, length in table:
        code <<= (length - prev_len)
        codes[sym] = (code, length)
        code += 1
        prev_len = length
    return codes


def huffman_encode(symbols: Sequence[int],
                   table: List[Tuple[int, int]]) -> bytes:
    codes = _assign_codes(table)
    acc = 0
    nbits = 0
    out = bytearray()
    for s in symbols:
        code, length = codes[s]
        acc = (acc << length) | code
        nbits += length
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def huffman_decode(data: bytes, table: List[Tuple[int, int]],
                   n_symbols: int) -> List[int]:
    codes = _assign_codes(table)
    decode_map = {(c, l): s for s, (c, l) in codes.items()}
    out = []
    acc = 0
    length = 0
    bit_iter = (
        (byte >> (7 - i)) & 1 for byte in data for i in range(8))
    for bit in bit_iter:
        acc = (acc << 1) | bit
        length += 1
        key = (acc, length)
        if key in decode_map:
            out.append(decode_map[key])
            acc = 0
            length = 0
            if len(out) == n_symbols:
                break
    if len(out) != n_symbols:
        raise ValueError("huffman stream truncated")
    return out
