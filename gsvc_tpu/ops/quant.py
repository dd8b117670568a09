"""Quantization primitives as pure JAX functions.

Straight-through estimators are expressed with ``jax.lax.stop_gradient``
instead of autograd.Function subclasses (reference: utils/encodings.py:
STE_binary :375-392, STE_multistep :395-431, UniformQuantizer :434-449,
Quantize_anchor :452-482).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ANCHOR_ROUND_DIGITS = 16
Q_ANCHOR = 1.0 / (2 ** ANCHOR_ROUND_DIGITS - 1)
# symbol clamp half-range shared by quantizers / entropy model / coder
CLAMP_BOUND = 15_000


def _ste(value, surrogate):
    """EXACTLY ``value`` in the forward pass, surrogate's gradient in the
    backward.  The textbook ``s + stop_grad(v - s)`` is NOT forward-exact
    in floating point (s + (v-s) != v); codec bit-exactness requires the
    ``s - stop_grad(s) + stop_grad(v)`` form whose forward is v exactly."""
    return (surrogate - jax.lax.stop_gradient(surrogate)
            + jax.lax.stop_gradient(value))


def ste_binary(x: jnp.ndarray) -> jnp.ndarray:
    """Sign binarization to EXACTLY {-1, +1}; gradient passes only inside
    [-1, 1].

    Reference: utils/encodings.py:375-392.  Forward exactness matters: the
    entropy context computed from these embeddings must be bit-identical
    between the encoder (raw float table) and the decoder (±1 table).
    """
    out = jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)
    inside = (jnp.abs(x) <= 1.0).astype(x.dtype)
    surrogate = x * inside
    return (surrogate - jax.lax.stop_gradient(surrogate)
            + jax.lax.stop_gradient(out))


def ste_round(x: jnp.ndarray, q, x_mean=None) -> jnp.ndarray:
    """Round to the nearest multiple of ``q`` with a straight-through grad.

    Matches STE_multistep.forward (utils/encodings.py:395-417): the input
    is first clamped to ``x_mean/q.mean() ± 15000`` symbol steps.
    """
    q = jnp.asarray(q, dtype=x.dtype)
    if x_mean is None:
        x_mean = jnp.mean(x)
    q_mean = jax.lax.stop_gradient(jnp.mean(q))
    lo = jnp.floor(x_mean / q_mean).astype(jnp.int32) - CLAMP_BOUND
    hi = jnp.floor(x_mean / q_mean).astype(jnp.int32) + CLAMP_BOUND
    lo = jax.lax.stop_gradient(lo).astype(x.dtype)
    hi = jax.lax.stop_gradient(hi).astype(x.dtype)
    x_c = jnp.clip(x / q, lo, hi) * q
    return _ste(jnp.round(x_c / q) * q, x_c)


def ste_quantize(x, q, min_value, max_value):
    """Deterministic integer quantization (STE_multistep.quantize,
    utils/encodings.py:423-431): symbols = clip(round(x / q))."""
    return jnp.clip(jnp.round(x / q), min_value, max_value)


# alias used by the codec layer
quantize_symbols = ste_quantize


def uniform_noise_quantize(x, q, key, x_mean=None):
    """Additive-uniform-noise quantization surrogate (UniformQuantizer,
    utils/encodings.py:434-449), including the symbol-range clamp."""
    q = jnp.asarray(q, dtype=x.dtype)
    if x_mean is None:
        x_mean = jnp.mean(x)
    q_mean = jax.lax.stop_gradient(jnp.mean(q))
    lo = jax.lax.stop_gradient(x_mean / q_mean - CLAMP_BOUND)
    hi = jax.lax.stop_gradient(x_mean / q_mean + CLAMP_BOUND)
    x = jnp.clip(x / q, lo, hi) * q
    noise = jax.random.uniform(key, x.shape, x.dtype, -0.5, 0.5)
    return x + noise * q


def quantize_anchor(anchors, min_v, max_v):
    """16-bit-per-axis anchor quantization with STE (Quantize_anchor,
    utils/encodings.py:452-465).  Returns dequantized anchors."""
    interval = (max_v - min_v) * Q_ANCHOR + 1e-6
    q = jnp.clip(jnp.floor((anchors - min_v) / interval),
                 0, 2 ** ANCHOR_ROUND_DIGITS - 1)
    anchors_q = q * interval + min_v
    return _ste(anchors_q, anchors)


def quantize_anchor_indices(anchors, min_v, max_v):
    """Integer anchor voxel indices + (interval, min_v) side info
    (Quantize_anchor.quantized, utils/encodings.py:467-473)."""
    interval = (max_v - min_v) * Q_ANCHOR + 1e-6
    q = jnp.clip(jnp.floor((anchors - min_v) / interval),
                 0, 2 ** ANCHOR_ROUND_DIGITS - 1)
    return q, interval, min_v


def dequantize_anchor(indices, interval, min_v):
    """Quantize_anchor.dequantized (utils/encodings.py:475-478)."""
    return indices * interval + min_v
