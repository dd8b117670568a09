"""NeRF-style sin/cos positional embedding (reference: utils/time_util.py:7-55).

Used for the camera-z ("time") condition and the (anchor_z - cam_z) offset
condition of the FiLM MLP heads.  multires=16, input dim 1 -> 33 dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_embedder(multires: int, input_dims: int = 1):
    """Returns (embed_fn, out_dim).  embed = [x, sin(2^k x), cos(2^k x)]
    for k in 0..multires-1 (log-sampled)."""
    if multires <= 0:
        return (lambda x: x), input_dims

    freqs = 2.0 ** jnp.linspace(0.0, multires - 1, multires)
    out_dim = input_dims * (1 + 2 * multires)

    def embed(x):
        parts = [x]
        for f in freqs:
            parts.append(jnp.sin(x * f))
            parts.append(jnp.cos(x * f))
        return jnp.concatenate(parts, axis=-1)

    return embed, out_dim
