"""Differentiable bit-rate estimators.

Reference: utils/entropy_models.py (EntropyGaussian :32-68,
Entropy_bernoulli :71-82, Low_bound :159-175) and
utils/encodings.py:get_binary_vxl_size (:34-51).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsvc_tpu.ops.quant import CLAMP_BOUND

_LIKELIHOOD_FLOOR = 2.0 ** -16
_LOG2E = 1.4426950408889634


def _low_bound(x):
    """Clamp at 2^-16 with the reference's asymmetric gradient rule
    (Low_bound: grads pass when x >= floor OR the gradient is negative,
    i.e. when the optimizer is pushing the likelihood up)."""

    @jax.custom_vjp
    def f(v):
        return jnp.maximum(v, _LIKELIHOOD_FLOOR)

    def fwd(v):
        return jnp.maximum(v, _LIKELIHOOD_FLOOR), v

    def bwd(v, g):
        pass_through = (v >= _LIKELIHOOD_FLOOR) | (g < 0.0)
        return (jnp.where(pass_through, g, 0.0),)

    f.defvjp(fwd, bwd)
    return f(x)


def _std_normal_cdf(z):
    return 0.5 * (1.0 + jax.lax.erf(z / jnp.sqrt(2.0).astype(z.dtype)))


def gaussian_bits(x, mean, scale, q=1.0, x_mean=None, quantized=False):
    """bits = -log2( Phi((x + Q/2 - mu)/sigma) - Phi((x - Q/2 - mu)/sigma) ).

    ``quantized=True`` means x is already in integer symbol units and the
    model is evaluated at (mu/Q, sigma/Q) with +-0.5 bins
    (EntropyGaussian.forward, utils/entropy_models.py:36-68).
    """
    q = jnp.asarray(q, dtype=x.dtype)
    if not quantized:
        if x_mean is None:
            x_mean = jnp.mean(x)
        q_mean = jnp.mean(q)
        lo = jax.lax.stop_gradient(x_mean - CLAMP_BOUND * q_mean)
        hi = jax.lax.stop_gradient(x_mean + CLAMP_BOUND * q_mean)
        x = jnp.clip(x, lo, hi)
        upper = _std_normal_cdf((x + 0.5 * q - mean) / scale)
        lower = _std_normal_cdf((x - 0.5 * q - mean) / scale)
    else:
        mu = mean / q
        sigma = scale / q
        upper = _std_normal_cdf((x + 0.5 - mu) / sigma)
        lower = _std_normal_cdf((x - 0.5 - mu) / sigma)
    likelihood = _low_bound(upper - lower)
    return -jnp.log(likelihood) * _LOG2E


def bernoulli_bits(x, p):
    """Bits of a {-1,+1} tensor under Bernoulli(p of +1)
    (Entropy_bernoulli, utils/entropy_models.py:71-82)."""
    p = jnp.clip(p, 1e-6, 1 - 1e-6)
    pos = (1 + x) / 2.0
    neg = (1 - x) / 2.0
    return -jnp.log2(p) * pos + -jnp.log2(1 - p) * neg


def factorized_entropy_init(key, channels: int, init_scale: float = 10.0,
                            filters=(3, 3, 3)):
    """Ballé-style fully-factorized entropy model parameters
    (Entropy_factorized, utils/entropy_models.py:85-156; kept for API
    parity — the reference's main path uses the Gaussian conditional
    model).  Returns a dict pytree of per-channel monotone-MLP params."""
    import numpy as np

    rng = np.random.default_rng(0)
    fs = (1,) + tuple(filters) + (1,)
    scale = init_scale ** (1.0 / (len(filters) + 1))
    params = {"matrices": [], "biases": [], "factors": []}
    for i in range(len(filters) + 1):
        init = np.log(np.expm1(1.0 / scale / fs[i + 1]))
        params["matrices"].append(jnp.full(
            (channels, fs[i + 1], fs[i]), init, jnp.float32))
        params["biases"].append(jnp.asarray(
            rng.uniform(-0.5, 0.5, (channels, fs[i + 1], 1)), jnp.float32))
        if i < len(filters):
            params["factors"].append(jnp.zeros(
                (channels, fs[i + 1], 1), jnp.float32))
    return params


def factorized_bits(params, x, q=1.0):
    """bits for x [N, C] under the factorized model (quantization bin q)."""
    q = jnp.asarray(q, jnp.float32)

    def logits_cumulative(v):  # v: [C, 1, N]
        for i, m in enumerate(params["matrices"]):
            v = jax.nn.softplus(m) @ v + params["biases"][i]
            if i < len(params["factors"]):
                v = v + jnp.tanh(params["factors"][i]) * jnp.tanh(v)
        return v

    xt = x.T[:, None, :]                      # [C, 1, N]
    lower = logits_cumulative(xt - 0.5 * (1.0 / q))
    upper = logits_cumulative(xt + 0.5 * (1.0 / q))
    sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
    likelihood = jnp.abs(jax.nn.sigmoid(sign * upper)
                         - jax.nn.sigmoid(sign * lower))
    likelihood = _low_bound(likelihood)
    bits = -jnp.log(likelihood) * _LOG2E
    return bits[:, 0, :].T                    # [N, C]


def binary_vxl_size(binary, dtype=jnp.float32):
    """Closed-form bits for a {0,1} tensor from its empirical 1-rate,
    +32 bits for transmitting the probability
    (get_binary_vxl_size, utils/encodings.py:34-51).

    Returns (p1, total_bits, total_MB, numel).
    """
    binary = binary.astype(dtype)
    n = binary.size
    pos = jnp.sum(binary)
    p = jnp.clip(pos / n, 1e-6, 1 - 1e-6)
    bits = pos * (-jnp.log2(p)) + (n - pos) * (-jnp.log2(1 - p)) + 32.0
    return p, bits, bits / 8.0 / 1024.0 / 1024.0, n
