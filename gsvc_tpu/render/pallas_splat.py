"""Pallas TPU kernel for tile compositing — the inference fast path.

The pure-JAX compositor (splat.py) processes every (tile, chunk) pair;
XLA cannot skip work per tile because ``vmap`` lowers ``cond`` to
``select``.  This kernel runs one grid step per tile with a real
``while_loop`` over gaussian chunks, so a tile stops as soon as

  * its binned gaussian list is exhausted, or
  * every pixel's transmittance has saturated (< T_EPS).

Per-tile gaussian data is pre-gathered in XLA (one fused gather) into
[n_tiles, cap, ...] arrays; BlockSpecs stream one tile's rows into VMEM
per grid step, and the color accumulation is a [P, C] x [C, 3] MXU dot.

Used by the decode/eval path (rasterize with grad=False); training keeps
the differentiable jnp compositor until the custom-VJP backward kernel
lands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsvc_tpu.render.splat import (
    ALPHA_MAX, ALPHA_MIN, T_EPS, Projected, RasterOutput, RasterSettings,
    _bin_gaussians, project_gaussians,
)


def _composite_kernel(count_ref, mu_ref, con_ref, op_ref, col_ref,
                      img_ref, t_ref, *, settings: RasterSettings):
    th, tw = settings.tile_h, settings.tile_w
    p = th * tw
    chunk = settings.chunk
    n_chunks = settings.gaussian_cap // chunk

    tile_id = pl.program_id(0)
    tile_x = tile_id % settings.n_tiles_x
    tile_y = tile_id // settings.n_tiles_x

    px0 = (tile_x * tw).astype(jnp.float32)
    py0 = (tile_y * th).astype(jnp.float32)
    # pixel coords as [1, P] rows (flattened row-major over the tile)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    xs = px0 + (lin % tw).astype(jnp.float32)
    ys = py0 + (lin // tw).astype(jnp.float32)

    count = count_ref[0]

    def body(state):
        c, t_carry, acc = state
        sl = pl.ds(c * chunk, chunk)
        mu = mu_ref[0, sl, :]          # [C, 2]
        con = con_ref[0, sl, :]        # [C, 3]
        op = op_ref[0, sl]             # [C]
        col = col_ref[0, sl, :]        # [C, 3]

        pos = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        row_valid = pos < count        # [C, 1]

        d0 = xs - mu[:, 0:1]           # [C, P]
        d1 = ys - mu[:, 1:2]
        q = con[:, 0:1] * d0 * d0 + 2.0 * con[:, 1:2] * d0 * d1 \
            + con[:, 2:3] * d1 * d1
        alpha = jnp.minimum(op[:, None] * jnp.exp(-0.5 * q), ALPHA_MAX)
        alpha = jnp.where(row_valid & (alpha >= ALPHA_MIN), alpha, 0.0)

        log_t = jnp.log1p(-alpha)
        cum = jnp.cumsum(log_t, axis=0) - log_t
        t_before = t_carry * jnp.exp(cum)            # [C, P]
        live = t_before >= T_EPS
        w = jnp.where(live, alpha * t_before, 0.0)

        acc = acc + jax.lax.dot_general(
            w, col, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [P, 3]
        t_carry = t_carry * jnp.exp(jnp.sum(
            jnp.where(live, log_t, 0.0), axis=0, keepdims=True))
        return c + 1, t_carry, acc

    def cond(state):
        c, t_carry, _ = state
        more_gaussians = c * chunk < count
        any_live = jnp.max(t_carry) >= T_EPS
        return jnp.logical_and(c < n_chunks,
                               jnp.logical_and(more_gaussians, any_live))

    t0 = jnp.ones((1, p), jnp.float32)
    acc0 = jnp.zeros((p, 3), jnp.float32)
    _, t_final, acc = jax.lax.while_loop(cond, body, (0, t0, acc0))

    img_ref[0, :, :] = acc + t_final.reshape(p, 1) * settings.bg
    t_ref[0, :] = t_final[0]


@functools.partial(jax.jit, static_argnames=("settings", "flip"))
def rasterize_pallas(xyz, color, opacity, scaling, rot, valid,
                     frame_z, x_min, y_min, scale,
                     settings: RasterSettings, flip: bool = False
                     ) -> RasterOutput:
    """Forward-only rasterization with the Pallas tile kernel.

    Signature-compatible with splat.rasterize (minus means2d, which only
    matters for gradients)."""
    proj = project_gaussians(xyz, scaling, rot, valid, frame_z, x_min,
                             y_min, scale, settings, flip=flip)
    opacity = jnp.where(proj.valid[:, None], opacity, 0.0)

    tile_lists, tile_counts, overflow, n_rendered = _bin_gaussians(
        proj, settings)

    safe = jnp.maximum(tile_lists, 0)                 # [T, cap]
    mu_t = proj.mean2d[safe]                          # [T, cap, 2]
    con_t = proj.conic[safe]                          # [T, cap, 3]
    op_t = jnp.where(tile_lists >= 0, opacity[safe, 0], 0.0)
    col_t = color[safe]                               # [T, cap, 3]

    th, tw = settings.tile_h, settings.tile_w
    p = th * tw
    n_tiles = settings.n_tiles
    cap = settings.gaussian_cap

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cap, 2), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap, 3), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap, 3), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, p, 3), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    tile_imgs, tile_ts = pl.pallas_call(
        functools.partial(_composite_kernel, settings=settings),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, p, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(tile_counts, mu_t, con_t, op_t, col_t)

    img = tile_imgs.reshape(settings.n_tiles_y, settings.n_tiles_x, th, tw, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        settings.n_tiles_y * th, settings.n_tiles_x * tw, 3)
    img = img[:settings.image_height, :settings.image_width]
    t_map = tile_ts.reshape(settings.n_tiles_y, settings.n_tiles_x, th, tw)
    t_map = t_map.transpose(0, 2, 1, 3).reshape(
        settings.n_tiles_y * th, settings.n_tiles_x * tw)
    t_map = t_map[:settings.image_height, :settings.image_width]

    return RasterOutput(image=img, transmittance=t_map, radii=proj.radius,
                        num_rendered=n_rendered, overflow=overflow)
