from gsvc_tpu.codec.native import (
    encode_gaussian_symbols, decode_gaussian_symbols,
    encode_binary, decode_binary,
    encode_octree, decode_octree, morton_sort_indices,
    native_available,
)

__all__ = [
    "encode_gaussian_symbols", "decode_gaussian_symbols",
    "encode_binary", "decode_binary",
    "encode_octree", "decode_octree", "morton_sort_indices",
    "native_available",
]
