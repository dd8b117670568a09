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
        sl = pl.ds(pl.multiple_of(c * chunk, chunk), chunk)
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

        one_m = 1.0 - alpha
        excl = _cumprod_excl(one_m, chunk)
        t_before = t_carry * excl                    # [C, P]
        live = t_before >= T_EPS
        w = jnp.where(live, alpha * t_before, 0.0)

        acc_r = acc_r + jnp.sum(w * col_r[:, None], axis=0, keepdims=True)
        acc_g = acc_g + jnp.sum(w * col_g[:, None], axis=0, keepdims=True)
        acc_b = acc_b + jnp.sum(w * col_b[:, None], axis=0, keepdims=True)
        t_carry = t_carry * _masked_prod(one_m, live, chunk)
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


# ---------------------------------------------------------------------------
# Differentiable pallas compositing (custom VJP): forward kernel saves the
# per-chunk transmittance checkpoints; the backward kernel replays chunks in
# REVERSE with a suffix accumulator (the classic splatting backward), all in
# VMEM.  Gradients land on the gathered planes; XLA's gather-transpose
# scatter-adds them back to per-gaussian arrays.
# ---------------------------------------------------------------------------

def _tri_excl_lower(chunk):
    # int32 iota: Mosaic rejects float-typed tpu.iota
    return (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
            > jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
            ).astype(jnp.float32)


def _tri_excl_upper(chunk):
    return (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
            ).astype(jnp.float32)


def _cumprod_incl(x, chunk):
    """Inclusive prefix product along the chunk (sublane) axis via
    Hillis-Steele doubling — log2(C) roll+multiply steps, no
    transcendentals (vs log/matmul/exp)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    d = 1
    while d < chunk:
        shifted = pltpu.roll(x, d, axis=0)
        x = x * jnp.where(rows < d, 1.0, shifted)
        d *= 2
    return x


def _cumprod_excl(one_m, chunk):
    rows = jax.lax.broadcasted_iota(jnp.int32, one_m.shape, 0)
    incl = _cumprod_incl(one_m, chunk)
    excl = pltpu.roll(incl, 1, axis=0)
    return jnp.where(rows < 1, 1.0, excl)


def _masked_prod(vals, mask, chunk):
    """prod over the chunk axis of where(mask, vals, 1) — reduce_prod has
    no Pallas lowering, so take the last row of the inclusive scan."""
    m = jnp.where(mask, vals, 1.0)
    incl = _cumprod_incl(m, chunk)
    return incl[chunk - 1:chunk, :]


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _chunk_alpha(planes_refs, sl, xs, ys, count, c, chunk,
                 compute_dtype="float32"):
    """Shared fwd/bwd per-chunk alpha math.  Returns per-gaussian scalars
    and the [C, P] alpha/diff arrays."""
    (mux_ref, muy_ref, cona_ref, conb_ref, conc_ref, op_ref,
     colr_ref, colg_ref, colb_ref) = planes_refs
    mu_x = mux_ref[0, 0, sl]
    mu_y = muy_ref[0, 0, sl]
    con_a = cona_ref[0, 0, sl]
    con_b = conb_ref[0, 0, sl]
    con_c = conc_ref[0, 0, sl]
    op = op_ref[0, 0, sl]
    col_r = colr_ref[0, 0, sl]
    col_g = colg_ref[0, 0, sl]
    col_b = colb_ref[0, 0, sl]

    pos = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    row_valid = pos < count

    if compute_dtype == "bfloat16":
        # bf16 alpha evaluation (the VPU-bound bulk); everything the
        # transmittance/accumulation touches returns to fp32
        cd = jnp.bfloat16
        # expand minor dims in fp32 first: Mosaic only supports no-op
        # minor-dim insertion for 32-bit types
        d0b = xs.astype(cd) - mu_x[:, None].astype(cd)
        d1b = ys.astype(cd) - mu_y[:, None].astype(cd)
        qb = (con_a[:, None].astype(cd) * d0b * d0b
              + 2.0 * con_b[:, None].astype(cd) * d0b * d1b
              + con_c[:, None].astype(cd) * d1b * d1b)
        alpha_raw = (op[:, None].astype(cd)
                     * jnp.exp(-0.5 * qb)).astype(jnp.float32)
        d0 = d0b.astype(jnp.float32)
        d1 = d1b.astype(jnp.float32)
    else:
        d0 = xs - mu_x[:, None]
        d1 = ys - mu_y[:, None]
        q = con_a[:, None] * d0 * d0 + 2.0 * con_b[:, None] * d0 * d1 \
            + con_c[:, None] * d1 * d1
        alpha_raw = op[:, None] * jnp.exp(-0.5 * q)
    alpha = jnp.minimum(alpha_raw, ALPHA_MAX)
    act = row_valid & (alpha >= ALPHA_MIN) & (alpha_raw < ALPHA_MAX)
    alpha = jnp.where(row_valid & (alpha >= ALPHA_MIN), alpha, 0.0)
    return (mu_x, mu_y, con_a, con_b, con_c, op, col_r, col_g, col_b,
            d0, d1, alpha, act)


def _fwd_train_kernel(count_ref, *refs, settings: RasterSettings):
    planes_refs = refs[:9]
    out_ref, tchk_ref = refs[9], refs[10]
    th, tw = settings.tile_h, settings.tile_w
    p = th * tw
    chunk = settings.chunk
    n_chunks = settings.gaussian_cap // chunk

    tile_id = pl.program_id(0)
    tile_x = tile_id % settings.n_tiles_x
    tile_y = tile_id // settings.n_tiles_x
    count = count_ref[tile_id]

    px0 = (tile_x * tw).astype(jnp.float32)
    py0 = (tile_y * th).astype(jnp.float32)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    xs = px0 + (lin % tw).astype(jnp.float32)
    ys = py0 + (lin // tw).astype(jnp.float32)
    tri = _tri_excl_lower(chunk)

    def body(state):
        c, t_carry, acc_r, acc_g, acc_b = state
        tchk_ref[0, c, :] = t_carry[0]
        sl = pl.ds(pl.multiple_of(c * chunk, chunk), chunk)
        (_, _, _, _, _, _, col_r, col_g, col_b, _, _, alpha, _) = \
            _chunk_alpha(planes_refs, sl, xs, ys, count, c, chunk,
                         settings.compute_dtype)
        one_m = 1.0 - alpha
        excl = _cumprod_excl(one_m, chunk)
        t_before = t_carry * excl
        live = t_before >= T_EPS
        w = jnp.where(live, alpha * t_before, 0.0)
        acc_r = acc_r + jnp.sum(w * col_r[:, None], axis=0, keepdims=True)
        acc_g = acc_g + jnp.sum(w * col_g[:, None], axis=0, keepdims=True)
        acc_b = acc_b + jnp.sum(w * col_b[:, None], axis=0, keepdims=True)
        t_carry = t_carry * _masked_prod(one_m, live, chunk)
        return c + 1, t_carry, acc_r, acc_g, acc_b

    def cond(state):
        c, t_carry, *_ = state
        return jnp.logical_and(
            c < n_chunks,
            jnp.logical_and(c * chunk < count,
                            jnp.max(t_carry) >= T_EPS))

    t0 = jnp.ones((1, p), jnp.float32)
    z = jnp.zeros((1, p), jnp.float32)
    c_end, t_final, acc_r, acc_g, acc_b = jax.lax.while_loop(
        cond, body, (0, t0, z, z, z))
    # fill checkpoints for chunks after early exit with the final T
    def fill_body(ci, _):
        @pl.when(ci >= c_end)
        def _():
            tchk_ref[0, ci, :] = t_final[0]
        return 0
    jax.lax.fori_loop(0, n_chunks, fill_body, 0)

    bg = settings.bg
    out_ref[0, 0, :] = (acc_r + t_final * bg)[0]
    out_ref[0, 1, :] = (acc_g + t_final * bg)[0]
    out_ref[0, 2, :] = (acc_b + t_final * bg)[0]
    out_ref[0, 3, :] = t_final[0]


def _bwd_train_kernel(count_ref, *refs, settings: RasterSettings):
    planes_refs = refs[:9]
    g_ref, tchk_ref = refs[9], refs[10]
    grad_refs = refs[11:20]
    th, tw = settings.tile_h, settings.tile_w
    p = th * tw
    chunk = settings.chunk
    n_chunks = settings.gaussian_cap // chunk

    tile_id = pl.program_id(0)
    tile_x = tile_id % settings.n_tiles_x
    tile_y = tile_id // settings.n_tiles_x
    count = count_ref[tile_id]

    px0 = (tile_x * tw).astype(jnp.float32)
    py0 = (tile_y * th).astype(jnp.float32)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    xs = px0 + (lin % tw).astype(jnp.float32)
    ys = py0 + (lin // tw).astype(jnp.float32)
    tri_lo = _tri_excl_lower(chunk)
    tri_up = _tri_excl_upper(chunk)

    for r in grad_refs:
        r[0, 0, :] = jnp.zeros((settings.gaussian_cap,), jnp.float32)

    g_r = g_ref[0, 0, :][None, :]
    g_g = g_ref[0, 1, :][None, :]
    g_b = g_ref[0, 2, :][None, :]
    g_t = g_ref[0, 3, :][None, :]

    n_used = jnp.minimum(
        (count + chunk - 1) // chunk, n_chunks).astype(jnp.int32)
    bg = settings.bg

    def last_chunk_tfinal():
        # recompute T_final by replaying the last used chunk
        c = jnp.maximum(n_used - 1, 0)
        sl = pl.ds(pl.multiple_of(c * chunk, chunk), chunk)
        (_, _, _, _, _, _, _, _, _, _, _, alpha, _) = _chunk_alpha(
            planes_refs, sl, xs, ys, count, c, chunk,
            settings.compute_dtype)
        one_m = 1.0 - alpha
        t_start = tchk_ref[0, c, :][None, :]
        excl = _cumprod_excl(one_m, chunk)
        t_before = t_start * excl
        live = t_before >= T_EPS
        return t_start * _masked_prod(one_m, live, chunk)

    t_final = last_chunk_tfinal()

    a_init = t_final * (bg * (g_r + g_g + g_b) + g_t)

    def body(state):
        c, a_acc = state
        sl = pl.ds(pl.multiple_of(c * chunk, chunk), chunk)
        (mu_x, mu_y, con_a, con_b, con_c, op, col_r, col_g, col_b,
         d0, d1, alpha, act) = _chunk_alpha(planes_refs, sl, xs, ys, count,
                                            c, chunk,
                                            settings.compute_dtype)
        one_m_raw = 1.0 - alpha
        t_start = tchk_ref[0, c, :][None, :]
        excl = _cumprod_excl(one_m_raw, chunk)
        t_before = t_start * excl
        live = t_before >= T_EPS
        w = jnp.where(live, alpha * t_before, 0.0)

        gc = (col_r[:, None] * g_r + col_g[:, None] * g_g
              + col_b[:, None] * g_b)                        # [C, P]
        wgc = w * gc
        suffix = _mm(tri_up, wgc)                            # [C, P]
        a_i = a_acc + suffix

        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        d_alpha = jnp.where(live & act,
                            gc * t_before - a_i / one_m, 0.0)

        # chain through alpha = op * exp(-q/2)
        safe_op = jnp.maximum(op, 1e-12)[:, None]
        d_op = jnp.sum(d_alpha * (alpha / safe_op), axis=1)
        dq = d_alpha * alpha * (-0.5)
        d_cona = jnp.sum(dq * d0 * d0, axis=1)
        d_conb = jnp.sum(dq * 2.0 * d0 * d1, axis=1)
        d_conc = jnp.sum(dq * d1 * d1, axis=1)
        dq_d0 = dq * (2.0 * con_a[:, None] * d0 + 2.0 * con_b[:, None] * d1)
        dq_d1 = dq * (2.0 * con_c[:, None] * d1 + 2.0 * con_b[:, None] * d0)
        d_mux = -jnp.sum(dq_d0, axis=1)
        d_muy = -jnp.sum(dq_d1, axis=1)
        d_colr = jnp.sum(w * g_r, axis=1)
        d_colg = jnp.sum(w * g_g, axis=1)
        d_colb = jnp.sum(w * g_b, axis=1)

        grad_refs[0][0, 0, sl] = d_mux
        grad_refs[1][0, 0, sl] = d_muy
        grad_refs[2][0, 0, sl] = d_cona
        grad_refs[3][0, 0, sl] = d_conb
        grad_refs[4][0, 0, sl] = d_conc
        grad_refs[5][0, 0, sl] = d_op
        grad_refs[6][0, 0, sl] = d_colr
        grad_refs[7][0, 0, sl] = d_colg
        grad_refs[8][0, 0, sl] = d_colb

        a_acc = a_acc + jnp.sum(wgc, axis=0, keepdims=True)
        return c - 1, a_acc

    def cond(state):
        c, _ = state
        return c >= 0

    jax.lax.while_loop(cond, body, (n_used - 1, a_init))


def _train_planes_composite(settings: RasterSettings, planes, tile_counts):
    """pallas forward returning (out4 [T,4,P], t_chk [T,n_chunks,P])."""
    assert settings.chunk % 128 == 0 or jax.default_backend() != "tpu", \
        "pallas compositing needs chunk % 128 == 0 (lane-aligned slices)"
    n_tiles = settings.n_tiles
    cap = settings.gaussian_cap
    p = settings.tile_h * settings.tile_w
    n_chunks = cap // settings.chunk
    planes3 = tuple(q[:, None, :] for q in planes)
    plane_spec = pl.BlockSpec((1, 1, cap), lambda g, counts: (g, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[plane_spec] * 9,
        out_specs=[
            pl.BlockSpec((1, 4, p), lambda g, counts: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, p), lambda g, counts: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out, t_chk = pl.pallas_call(
        functools.partial(_fwd_train_kernel, settings=settings),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 4, p), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, n_chunks, p), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(tile_counts, *planes3)
    return out, t_chk


def _train_planes_composite_bwd(settings: RasterSettings, planes,
                                tile_counts, t_chk, g_out):
    n_tiles = settings.n_tiles
    cap = settings.gaussian_cap
    p = settings.tile_h * settings.tile_w
    n_chunks = cap // settings.chunk
    planes3 = tuple(q[:, None, :] for q in planes)
    plane_spec = pl.BlockSpec((1, 1, cap), lambda g, counts: (g, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[plane_spec] * 9 + [
            pl.BlockSpec((1, 4, p), lambda g, counts: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, p), lambda g, counts: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[plane_spec] * 9,
    )
    grads = pl.pallas_call(
        functools.partial(_bwd_train_kernel, settings=settings),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 1, cap), jnp.float32)] * 9,
        interpret=jax.default_backend() != "tpu",
    )(tile_counts, *planes3, g_out, t_chk)
    return tuple(g[:, 0, :] for g in grads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pallas_tile_composite(settings: RasterSettings, planes, tile_counts):
    out, _ = _train_planes_composite(settings, planes, tile_counts)
    return out


def _ptc_fwd(settings, planes, tile_counts):
    out, t_chk = _train_planes_composite(settings, planes, tile_counts)
    return out, (planes, tile_counts, t_chk)


def _ptc_bwd(settings, res, g_out):
    planes, tile_counts, t_chk = res
    grads = _train_planes_composite_bwd(settings, planes, tile_counts,
                                        t_chk, g_out)
    return grads, None


pallas_tile_composite.defvjp(_ptc_fwd, _ptc_bwd)


def rasterize_pallas_train(xyz, color, opacity, scaling, rot, valid,
                           frame_z, x_min, y_min, scale,
                           settings: RasterSettings, flip: bool = False,
                           means2d=None) -> RasterOutput:
    """Differentiable rasterization via the custom-VJP Pallas kernels.

    Drop-in for splat.rasterize in the training step: projection/binning
    stay in XLA (differentiable / integer respectively); compositing runs
    in the fwd/bwd kernel pair with per-tile early exit; plane gradients
    scatter-add back through the gather transpose (including means2d)."""
    from gsvc_tpu.render.splat import gather_tile_planes

    proj = project_gaussians(xyz, scaling, rot, valid, frame_z, x_min,
                             y_min, scale, settings, flip=flip,
                             means2d=means2d)
    opacity = jnp.where(proj.valid[:, None], opacity, 0.0)
    tile_lists, tile_counts, overflow, n_rendered = _bin_gaussians(
        proj, settings)
    planes = gather_tile_planes(proj, opacity, color, tile_lists)

    out4 = pallas_tile_composite(settings, planes, tile_counts)

    th, tw = settings.tile_h, settings.tile_w
    full = out4.reshape(settings.n_tiles_y, settings.n_tiles_x, 4, th, tw)
    full = full.transpose(2, 0, 3, 1, 4).reshape(
        4, settings.n_tiles_y * th, settings.n_tiles_x * tw)
    full = full[:, :settings.image_height, :settings.image_width]
    return RasterOutput(image=full[:3], transmittance=full[3],
                        radii=proj.radius, num_rendered=n_rendered,
                        overflow=overflow)


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
