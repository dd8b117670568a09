"""Pallas TPU kernel for tile compositing — the inference fast path.

The pure-JAX compositor (splat.py) processes every (tile, chunk) pair;
XLA cannot skip work per tile because ``vmap`` lowers ``cond`` to
``select``.  This kernel runs one grid step per tile with a real
``while_loop`` over gaussian chunks, so a tile stops as soon as

  * its binned gaussian list is exhausted, or
  * every pixel's transmittance has saturated (< T_EPS).

All per-gaussian data is pre-gathered in XLA (one fused gather) into
struct-of-arrays [n_tiles, cap] planes — scalar-per-gaussian layout keeps
every VMEM block (cap,)-wide on the lane dimension (a [cap, 2/3] layout
would pad lanes 64x).  BlockSpecs stream one tile's rows per grid step.

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
    ALPHA_MAX, ALPHA_MIN, T_EPS, RasterOutput, RasterSettings,
    _bin_gaussians, project_gaussians,
)


def _composite_kernel(count_ref, mux_ref, muy_ref, cona_ref, conb_ref,
                      conc_ref, op_ref, colr_ref, colg_ref, colb_ref,
                      out_ref, *, settings: RasterSettings):
    th, tw = settings.tile_h, settings.tile_w
    p = th * tw
    chunk = settings.chunk
    n_chunks = settings.gaussian_cap // chunk

    tile_id = pl.program_id(0)
    tile_x = tile_id % settings.n_tiles_x
    tile_y = tile_id // settings.n_tiles_x
    # count_ref is the scalar-prefetch [n_tiles] array (SMEM)
    count = count_ref[tile_id]

    px0 = (tile_x * tw).astype(jnp.float32)
    py0 = (tile_y * th).astype(jnp.float32)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    xs = px0 + (lin % tw).astype(jnp.float32)
    ys = py0 + (lin // tw).astype(jnp.float32)

    def body(state):
        c, t_carry, acc_r, acc_g, acc_b = state
        sl = pl.ds(c * chunk, chunk)
        mu_x = mux_ref[0, 0, sl]       # [C]
        mu_y = muy_ref[0, 0, sl]
        con_a = cona_ref[0, 0, sl]
        con_b = conb_ref[0, 0, sl]
        con_c = conc_ref[0, 0, sl]
        op = op_ref[0, 0, sl]
        col_r = colr_ref[0, 0, sl]
        col_g = colg_ref[0, 0, sl]
        col_b = colb_ref[0, 0, sl]

        pos = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        row_valid = pos < count        # [C, 1]

        d0 = xs - mu_x[:, None]        # [C, P]
        d1 = ys - mu_y[:, None]
        q = con_a[:, None] * d0 * d0 + 2.0 * con_b[:, None] * d0 * d1 \
            + con_c[:, None] * d1 * d1
        alpha = jnp.minimum(op[:, None] * jnp.exp(-0.5 * q), ALPHA_MAX)
        alpha = jnp.where(row_valid & (alpha >= ALPHA_MIN), alpha, 0.0)

        log_t = jnp.log1p(-alpha)
        cum = jnp.cumsum(log_t, axis=0) - log_t
        t_before = t_carry * jnp.exp(cum)            # [C, P]
        live = t_before >= T_EPS
        w = jnp.where(live, alpha * t_before, 0.0)

        acc_r = acc_r + jnp.sum(w * col_r[:, None], axis=0, keepdims=True)
        acc_g = acc_g + jnp.sum(w * col_g[:, None], axis=0, keepdims=True)
        acc_b = acc_b + jnp.sum(w * col_b[:, None], axis=0, keepdims=True)
        t_carry = t_carry * jnp.exp(jnp.sum(
            jnp.where(live, log_t, 0.0), axis=0, keepdims=True))
        return c + 1, t_carry, acc_r, acc_g, acc_b

    def cond(state):
        c, t_carry, *_ = state
        more_gaussians = c * chunk < count
        any_live = jnp.max(t_carry) >= T_EPS
        return jnp.logical_and(c < n_chunks,
                               jnp.logical_and(more_gaussians, any_live))

    t0 = jnp.ones((1, p), jnp.float32)
    z = jnp.zeros((1, p), jnp.float32)
    _, t_final, acc_r, acc_g, acc_b = jax.lax.while_loop(
        cond, body, (0, t0, z, z, z))

    bg = settings.bg
    out_ref[0, 0, :] = (acc_r + t_final * bg)[0]
    out_ref[0, 1, :] = (acc_g + t_final * bg)[0]
    out_ref[0, 2, :] = (acc_b + t_final * bg)[0]
    out_ref[0, 3, :] = t_final[0]


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

    from gsvc_tpu.render.splat import gather_tile_planes

    planes = gather_tile_planes(proj, opacity, color, tile_lists)

    th, tw = settings.tile_h, settings.tile_w
    p = th * tw
    n_tiles = settings.n_tiles
    cap = settings.gaussian_cap

    # index maps receive (grid_idx, *scalar_refs); use the grid index.
    # planes are [T, 1, cap]: TPU rank-2 blocks need sublane multiples of
    # 8, so a unit middle dim makes the (1, cap) trailing block legal
    planes = tuple(p_[:, None, :] for p_ in planes)
    plane_spec = pl.BlockSpec((1, 1, cap), lambda g, counts: (g, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # tile_counts lives in SMEM
        grid=(n_tiles,),
        in_specs=[plane_spec] * 9,
        out_specs=pl.BlockSpec((1, 4, p), lambda g, counts: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        functools.partial(_composite_kernel, settings=settings),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 4, p), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(tile_counts, *planes)

    # [n_tiles, 4, p] -> [4, H, W] -> split
    full = out.reshape(settings.n_tiles_y, settings.n_tiles_x, 4, th, tw)
    full = full.transpose(2, 0, 3, 1, 4).reshape(
        4, settings.n_tiles_y * th, settings.n_tiles_x * tw)
    full = full[:, :settings.image_height, :settings.image_width]
    img = full[:3]
    t_map = full[3]

    return RasterOutput(image=img, transmittance=t_map, radii=proj.radius,
                        num_rendered=n_rendered, overflow=overflow)
