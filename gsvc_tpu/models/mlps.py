"""MLP heads as pure pytree parameter dicts + apply functions.

Architecture parity with the reference (scene/gaussian_model.py):
  * FiLM            :150-170  — two-layer gamma/beta conditioning
  * GeneratorNet    :173-196  — 2-layer GELU trunk, FiLM, output head
  * EntropyParamsNet:198-232  — dist_net (mu, sigma) + quant_step_net
  * deform MLP      :468-489  — 5 linear layers with GELU, out 3K

Plain dict pytrees (no flax) keep per-group learning rates and optimizer
surgery trivial, and everything jit/vmaps cleanly.  Linear init matches
torch.nn.Linear defaults: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
weight and bias, so training dynamics match the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_init(key, in_dim: int, out_dim: int):
    bound = 1.0 / jnp.sqrt(in_dim)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32,
                                -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound),
    }


def linear_apply(p, x):
    return x @ p["w"] + p["b"]


# -- FiLM -------------------------------------------------------------------

def film_init(key, condition_dim: int, input_dim: int):
    k = jax.random.split(key, 4)
    return {
        "gamma0": linear_init(k[0], condition_dim, condition_dim),
        "beta0": linear_init(k[1], condition_dim, condition_dim),
        "gamma1": linear_init(k[2], condition_dim, input_dim),
        "beta1": linear_init(k[3], condition_dim, input_dim),
    }


def film_apply(p, x, condition):
    gamma = linear_apply(p["gamma1"],
                         jax.nn.relu(linear_apply(p["gamma0"], condition)))
    beta = linear_apply(p["beta1"],
                        jax.nn.relu(linear_apply(p["beta0"], condition)))
    return gamma * x + beta


# -- GeneratorNet (opacity / cov / color heads) -----------------------------

def generator_net_init(key, input_dim: int, output_dim: int, inner_dim: int,
                       condition_dim: int):
    k = jax.random.split(key, 4)
    return {
        "linear1": linear_init(k[0], input_dim, inner_dim),
        "linear2": linear_init(k[1], inner_dim, inner_dim),
        "film": film_init(k[2], condition_dim, inner_dim),
        "out": linear_init(k[3], inner_dim, output_dim),
    }


def generator_net_apply(p, feature, condition, out_act=None):
    h = linear_apply(p["linear1"], feature)
    h = jax.nn.gelu(h)
    h = linear_apply(p["linear2"], h)
    h = film_apply(p["film"], h, condition)
    out = linear_apply(p["out"], h)
    if out_act is not None:
        out = out_act(out)
    return out


# -- EntropyParamsNet -------------------------------------------------------

def entropy_params_net_init(key, input_dim: int, inner_dim: int,
                            inner_dim2: int, output_dim: int, layer: int = 2):
    assert layer in (2, 3)
    k = jax.random.split(key, 5)
    p = {
        "dist0": linear_init(k[0], input_dim, inner_dim),
        "dist_out": linear_init(k[1], inner_dim, output_dim * 2),
        "q0": linear_init(k[2], input_dim, inner_dim2),
        "q1": linear_init(k[3], inner_dim2, 1),
    }
    if layer == 3:
        p["dist1"] = linear_init(k[4], inner_dim, inner_dim)
    return p


def entropy_params_net_apply(p, x):
    h = jax.nn.gelu(linear_apply(p["dist0"], x))
    if "dist1" in p:
        h = jax.nn.gelu(linear_apply(p["dist1"], h))
    params = linear_apply(p["dist_out"], h)
    mean, scale = jnp.split(params, 2, axis=-1)
    q = linear_apply(p["q1"], jax.nn.gelu(linear_apply(p["q0"], x)))
    return mean, scale, q


# -- Deform MLP -------------------------------------------------------------

def deform_mlp_init(key, input_dim: int, hidden: int, output_dim: int):
    k = jax.random.split(key, 5)
    return {
        "l0": linear_init(k[0], input_dim, hidden),
        "l1": linear_init(k[1], hidden, hidden),
        "l2": linear_init(k[2], hidden, hidden),
        "l3": linear_init(k[3], hidden, hidden),
        "out": linear_init(k[4], hidden, output_dim),
    }


def deform_mlp_apply(p, x):
    h = jax.nn.gelu(linear_apply(p["l0"], x))
    h = jax.nn.gelu(linear_apply(p["l1"], h))
    h = jax.nn.gelu(linear_apply(p["l2"], h))
    h = jax.nn.gelu(linear_apply(p["l3"], h))
    return linear_apply(p["out"], h)
