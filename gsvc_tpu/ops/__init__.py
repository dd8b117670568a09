from gsvc_tpu.ops.quant import (
    ANCHOR_ROUND_DIGITS,
    Q_ANCHOR,
    ste_binary,
    ste_round,
    ste_quantize,
    quantize_symbols,
    uniform_noise_quantize,
    quantize_anchor,
    quantize_anchor_indices,
    dequantize_anchor,
)
from gsvc_tpu.ops.entropy import (
    gaussian_bits,
    bernoulli_bits,
    binary_vxl_size,
)
from gsvc_tpu.ops.embed import positional_embedder

__all__ = [
    "ANCHOR_ROUND_DIGITS",
    "Q_ANCHOR",
    "ste_binary",
    "ste_round",
    "ste_quantize",
    "quantize_symbols",
    "uniform_noise_quantize",
    "quantize_anchor",
    "quantize_anchor_indices",
    "dequantize_anchor",
    "gaussian_bits",
    "bernoulli_bits",
    "binary_vxl_size",
    "positional_embedder",
]
