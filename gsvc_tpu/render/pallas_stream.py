"""Stream-resident Pallas compositing (v4) — cost scales with content.

The v2/v3 kernels (pallas_splat.py) consume ``[n_tiles, cap]`` padded
tile planes: gather, scatter-add, checkpoint and grad traffic all scale
with ``tiles x gaussian_cap`` REGARDLESS of how many copies are actually
binned.  That is the dominant fixed cost of a train step (bench round 3:
representative content runs at the same it/s as the cap-saturated worst
case, so ~95% of the step is content-independent machinery), and it is
why the flagship fit at gaussian_cap 4096 pays ~8x its actual copy count
in HBM traffic.

Here the kernels walk the depth-sorted copy stream itself, re-laid so
every tile's span starts on a chunk boundary (splat.bin_gaussians_stream):

  * the grid is (view, stream_block): one 128-copy block per step,
    standard BlockSpec pipelining (Mosaic prefetches the next block
    while the current one computes) — no [T, cap] padding anywhere;
  * per-tile state (transmittance carry, color accumulator, backward
    suffix) lives in VMEM scratch, reset at each tile's first block —
    tiles own consecutive blocks by construction;
  * the x-mirror views composite the SAME stream in the opposite
    direction (the v3 mirror identity: negated tile-local xs, reversed
    chunk order), as a second grid pass over the blocks;
  * transmittance checkpoints are stored PER STREAM BLOCK
    ([2, B, 1, P]), so backward checkpoint traffic also scales with
    actual copies (a [tiles, cap/chunk, P] layout would re-pad);
  * dead blocks (alignment/tail padding) route their output blocks to a
    trash row via the index maps and skip all compute.

Chunk math (alpha evaluation, triangular log-transmittance cumsum on the
MXU, pixel-basis moment backward) is shared with pallas_splat.py, so the
two rasterizers are bit-identical per chunk; parity is enforced by
tests/test_pallas_stream.py.

Replaces the reference's CUDA rasterizer's per-tile range walk over the
duplicate-key radix-sorted copy list (diff_gaussian_rasterization
vendored CUDA, driven from ortho_gaussian_renderer/renderer.py:63-98) —
this is the TPU analog of that design: tile ranges over one sorted
stream, with the sort done device-wide in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsvc_tpu.render.splat import T_EPS, RasterSettings
from gsvc_tpu.render.pallas_splat import (
    _basis8, _chunk_alpha, _matmul_fns, _mm, _tile_coords, _trans_chunk,
    _tri_excl_lower, _tri_excl_upper,
)

# stream rows: mux, muy, con_a, con_b, con_c, op, col_r, col_g, col_b
# padded to 16 sublanes (two (8,128) tiles per block)
_N_ATTR = 9
_STREAM_ROWS = 16


def _scalars_from_stream(stream_ref, cx, cy):
    """Per-gaussian scalars of one stream block, means tile-local."""
    mu_x = stream_ref[0, :] - cx
    mu_y = stream_ref[1, :] - cy
    con_a = stream_ref[2, :]
    con_b = stream_ref[3, :]
    con_c = stream_ref[4, :]
    op = stream_ref[5, :]
    col_r = stream_ref[6, :]
    col_g = stream_ref[7, :]
    col_b = stream_ref[8, :]
    return mu_x, mu_y, con_a, con_b, con_c, op, col_r, col_g, col_b


def _view_geometry(settings: RasterSettings, d, v):
    """(xs_eff, ys, cx, cy, rev) for data tile d seen from view v."""
    rev = v == 1
    xs, ys, cx, cy = _tile_coords(settings, d)
    xs_eff = jnp.where(rev, -xs, xs)
    return xs_eff, ys, cx, cy, rev


def _out_row(settings: RasterSettings, d, v, n_rows):
    """Output row for (data tile d, view v); trash row n_rows when dead.

    View order matches assemble_views: (2f + v) * T + tile, where the
    flip view writes the x-mirrored tile (the v3 mirror identity)."""
    t_n = settings.n_tiles
    ntx = settings.n_tiles_x
    f = d // t_n
    u = d % t_n
    mirror_u = u + (ntx - 1) - 2 * (u % ntx)
    tile_out = jnp.where(v == 1, mirror_u, u)
    return jnp.where(d < 0, n_rows, (2 * f + v) * t_n + tile_out)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel_stream(blk_tile_ref, blk_cc_ref, nblk_ref, stream_ref,
                       *refs, settings: RasterSettings, save_tchk: bool,
                       b_tot: int):
    if save_tchk:
        out_ref, tchk_ref, t_scr, acc_scr = refs
    else:
        (out_ref,), (t_scr, acc_scr) = refs[:1], refs[1:]
    chunk = settings.chunk
    p_pix = settings.tile_h * settings.tile_w
    mm_tri, _, _ = _matmul_fns(settings)

    v = pl.program_id(0)
    c = pl.program_id(1)
    c_eff = jnp.where(v == 1, b_tot - 1 - c, c)
    d = blk_tile_ref[c_eff]

    @pl.when(d >= 0)
    def _():
        cc = blk_cc_ref[c_eff]
        nb = nblk_ref[d]
        xs_eff, ys, cx, cy, rev = _view_geometry(settings, d, v)
        p_pos = jnp.where(rev, nb - 1 - cc, cc)
        tri_fwd = jnp.where(rev, _tri_excl_upper(chunk),
                            _tri_excl_lower(chunk))

        @pl.when(p_pos == 0)
        def _():
            t_scr[...] = jnp.ones((1, p_pix), jnp.float32)
            acc_scr[...] = jnp.zeros((3, p_pix), jnp.float32)

        t_carry = t_scr[...]
        if save_tchk:
            # T at this block's composite START, indexed by stream block
            tchk_ref[0, 0, 0, :] = t_carry[0]

        @pl.when(jnp.max(t_carry) >= T_EPS)
        def _():
            scalars = _scalars_from_stream(stream_ref, cx, cy)
            alpha, _, _, _ = _chunk_alpha(scalars, xs_eff, ys,
                                          settings.compute_dtype)
            alpha32 = alpha.astype(jnp.float32)
            excl, chunk_t = _trans_chunk(alpha32, chunk, tri=tri_fwd,
                                         mm_tri=mm_tri)
            t_before = t_carry * excl                     # [C, P] fp32
            w = jnp.where(t_before >= T_EPS, alpha32 * t_before, 0.0)
            col_r, col_g, col_b = scalars[6:9]
            # masked-iota assembly: Mosaic concatenate cannot relayout
            # inputs with mismatched vregister offsets (sublane slices
            # of the stream block) — broadcasts/selects can
            ri = jax.lax.broadcasted_iota(jnp.int32, (3, chunk), 0)
            cols3 = (jnp.where(ri == 0, col_r[None, :], 0.0)
                     + jnp.where(ri == 1, col_g[None, :], 0.0)
                     + jnp.where(ri == 2, col_b[None, :], 0.0))
            acc_scr[...] = acc_scr[...] + _mm(cols3, w)   # MXU [3, P]
            t_scr[...] = t_carry * chunk_t

        # final values land on the block-index change writeback; interim
        # stores are VMEM-resident (the out row is pinned for the whole
        # tile span)
        t_fin = t_scr[...]
        out_ref[0, 0:3, :] = acc_scr[...] + t_fin * settings.bg
        out_ref[0, 3, :] = t_fin[0]


# ---------------------------------------------------------------------------
# Backward kernel: reverse composite-order walk per view pass, suffix
# accumulator in scratch, per-view gradient streams (combined in XLA)
# ---------------------------------------------------------------------------

def _bwd_kernel_stream(blk_tile_ref, blk_cc_ref, nblk_ref, stream_ref,
                       out4_ref, g_ref, tchk_ref, gs_ref, a_scr, *,
                       settings: RasterSettings, b_tot: int):
    chunk = settings.chunk
    mm_tri, mm, mm_rhs_t = _matmul_fns(settings)

    v = pl.program_id(0)
    c = pl.program_id(1)
    # reverse of each view's composite order (see _fwd_kernel_stream)
    c_eff = jnp.where(v == 1, c, b_tot - 1 - c)
    d = blk_tile_ref[c_eff]

    @pl.when(d >= 0)
    def _():
        cc = blk_cc_ref[c_eff]
        nb = nblk_ref[d]
        xs_eff, ys, cx, cy, rev = _view_geometry(settings, d, v)
        p_pos = jnp.where(rev, nb - 1 - cc, cc)
        tri_fwd = jnp.where(rev, _tri_excl_upper(chunk),
                            _tri_excl_lower(chunk))
        tri_bwd = jnp.where(rev, _tri_excl_lower(chunk),
                            _tri_excl_upper(chunk))

        g3 = g_ref[0, 0:3, :]                             # [3, P]
        g_t = g_ref[0, 3, :][None, :]

        @pl.when(p_pos == nb - 1)                         # composite-last
        def _():
            g_sum = jnp.sum(g3, axis=0, keepdims=True)
            t_final = out4_ref[0, 3, :][None, :]
            a_scr[...] = t_final * (settings.bg * g_sum + g_t)

        t_start = tchk_ref[0, 0, 0, :][None, :]

        @pl.when(jnp.max(t_start) >= T_EPS)
        def _():
            scalars = _scalars_from_stream(stream_ref, cx, cy)
            alpha, act, _, _ = _chunk_alpha(scalars, xs_eff, ys,
                                            settings.compute_dtype)
            alpha32 = alpha.astype(jnp.float32)
            excl, _ = _trans_chunk(alpha32, chunk, with_total=False,
                                   tri=tri_fwd, mm_tri=mm_tri)
            t_before = t_start * excl
            mu_x, mu_y, con_a, con_b, con_c, op = scalars[:6]

            live = t_before >= T_EPS
            w = jnp.where(live, alpha32 * t_before, 0.0)
            col_r, col_g, col_b = scalars[6:9]
            # masked-iota assembly (Mosaic concatenate cannot relayout
            # mismatched offsets); gc MUST go through the same MXU
            # matmul as the mirror backward — a VPU broadcast-FMA form
            # is exact f32 while the MXU f32 path is multipass-bf16,
            # and that drift amplifies through the quadratic basis into
            # O(10) absolute conic-gradient deviations (measured on v5e)
            ci = jax.lax.broadcasted_iota(jnp.int32, (chunk, 3), 1)
            c3 = (jnp.where(ci == 0, col_r[:, None], 0.0)
                  + jnp.where(ci == 1, col_g[:, None], 0.0)
                  + jnp.where(ci == 2, col_b[:, None], 0.0))   # [C, 3]
            gc = mm(c3, g3)                                    # [C, P]
            wgc = w * gc
            a_i = a_scr[...] + mm(tri_bwd, wgc)                # suffix

            one_m32 = jnp.maximum(1.0 - alpha32, 1e-6)
            inv_one_m = pl.reciprocal(one_m32, approx=True) \
                if jax.default_backend() == "tpu" else 1.0 / one_m32
            d_alpha = jnp.where(live & act,
                                gc * t_before - a_i * inv_one_m, 0.0)
            dq = d_alpha * alpha32 * (-0.5)                    # [C, P]

            basis = _basis8(xs_eff, ys)
            m = mm_rhs_t(dq, basis)                            # [C, 8]
            m0, m1, m2 = m[:, 0:1], m[:, 1:2], m[:, 2:3]
            m3, m4, m5 = m[:, 3:4], m[:, 4:5], m[:, 5:6]
            mxl = mu_x[:, None]
            myl = mu_y[:, None]
            a2 = 2.0 * con_a[:, None]
            b2 = 2.0 * con_b[:, None]
            c2 = 2.0 * con_c[:, None]

            d_cona = m3 - 2.0 * mxl * m1 + mxl * mxl * m0
            d_conb = 2.0 * (m4 - myl * m1 - mxl * m2 + mxl * myl * m0)
            d_conc = m5 - 2.0 * myl * m2 + myl * myl * m0
            mx_c = m1 - mxl * m0
            my_c = m2 - myl * m0
            d_mux = -(a2 * mx_c + b2 * my_c)
            d_muy = -(c2 * my_c + b2 * mx_c)
            safe_op = jnp.maximum(op, 1e-12)[:, None]
            d_op = -2.0 * m0 / safe_op
            dcol = mm_rhs_t(w, g3)                             # [C, 3]

            # per-row stores: the 10-input concatenate of lane-sliced
            # columns fails Mosaic compilation ("result/input offset
            # mismatch on non-concat dimension") — stores relayout
            gs_ref[0, 0:1, :] = d_mux[:, 0][None, :]
            gs_ref[0, 1:2, :] = d_muy[:, 0][None, :]
            gs_ref[0, 2:3, :] = d_cona[:, 0][None, :]
            gs_ref[0, 3:4, :] = d_conb[:, 0][None, :]
            gs_ref[0, 4:5, :] = d_conc[:, 0][None, :]
            gs_ref[0, 5:6, :] = d_op[:, 0][None, :]
            gs_ref[0, 6:7, :] = dcol[:, 0][None, :]
            gs_ref[0, 7:8, :] = dcol[:, 1][None, :]
            gs_ref[0, 8:9, :] = dcol[:, 2][None, :]
            gs_ref[0, _N_ATTR:, :] = jnp.zeros(
                (_STREAM_ROWS - _N_ATTR, chunk), jnp.float32)
            a_scr[...] = a_scr[...] + jnp.sum(wgc, axis=0, keepdims=True)

        @pl.when(jnp.max(t_start) < T_EPS)
        def _():
            # saturated before this block: zero grads, suffix unchanged
            gs_ref[0, :, :] = jnp.zeros((_STREAM_ROWS, chunk), jnp.float32)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _stream_call(settings: RasterSettings, planes16, blk_tile, blk_cc,
                 nblk, n_rows: int, save_tchk: bool):
    chunk = settings.chunk
    p_pix = settings.tile_h * settings.tile_w
    b_tot = blk_tile.shape[0]

    def stream_map(v, c, bt, bc, nb):
        c_eff = jnp.where(v == 1, b_tot - 1 - c, c)
        # consecutive dead steps pin block 0 (no refetch per dead step)
        return (0, jnp.where(bt[c_eff] < 0, 0, c_eff))

    def out_map(v, c, bt, bc, nb):
        c_eff = jnp.where(v == 1, b_tot - 1 - c, c)
        return (_out_row(settings, bt[c_eff], v, n_rows), 0, 0)

    def tchk_map(v, c, bt, bc, nb):
        c_eff = jnp.where(v == 1, b_tot - 1 - c, c)
        return (v, jnp.where(bt[c_eff] < 0, b_tot, c_eff), 0, 0)

    out_specs = [pl.BlockSpec((1, 4, p_pix), out_map,
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((n_rows + 1, 4, p_pix), jnp.float32)]
    if save_tchk:
        out_specs.append(pl.BlockSpec((1, 1, 1, p_pix), tchk_map,
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((2, b_tot + 1, 1, p_pix), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(2, b_tot),
        in_specs=[pl.BlockSpec((_STREAM_ROWS, chunk), stream_map,
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((1, p_pix), jnp.float32),
                        pltpu.VMEM((3, p_pix), jnp.float32)],
    )
    res = pl.pallas_call(
        functools.partial(_fwd_kernel_stream, settings=settings,
                          save_tchk=save_tchk, b_tot=b_tot),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(blk_tile, blk_cc, nblk, planes16)
    return (res[0], res[1]) if save_tchk else (res[0], None)


def _stream_call_bwd(settings: RasterSettings, planes16, blk_tile, blk_cc,
                     nblk, n_rows: int, out4_pad, t_chk, g_out_pad):
    chunk = settings.chunk
    p_pix = settings.tile_h * settings.tile_w
    b_tot = blk_tile.shape[0]

    def ceff(v, c):
        return jnp.where(v == 1, c, b_tot - 1 - c)

    def stream_map(v, c, bt, bc, nb):
        c_eff = ceff(v, c)
        return (0, jnp.where(bt[c_eff] < 0, 0, c_eff))

    def row_map(v, c, bt, bc, nb):
        return (_out_row(settings, bt[ceff(v, c)], v, n_rows), 0, 0)

    def tchk_map(v, c, bt, bc, nb):
        c_eff = ceff(v, c)
        return (v, jnp.where(bt[c_eff] < 0, b_tot, c_eff), 0, 0)

    def gs_map(v, c, bt, bc, nb):
        c_eff = ceff(v, c)
        return (v, 0, jnp.where(bt[c_eff] < 0, b_tot, c_eff))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(2, b_tot),
        in_specs=[
            pl.BlockSpec((_STREAM_ROWS, chunk), stream_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, p_pix), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, p_pix), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p_pix), tchk_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, _STREAM_ROWS, chunk), gs_map,
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((1, p_pix), jnp.float32)],
    )
    gs = pl.pallas_call(
        functools.partial(_bwd_kernel_stream, settings=settings,
                          b_tot=b_tot),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(
            (2, _STREAM_ROWS, (b_tot + 1) * chunk), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(blk_tile, blk_cc, nblk, planes16, out4_pad, g_out_pad, t_chk)
    return gs[0][:, :, :b_tot * chunk]


# ---------------------------------------------------------------------------
# Differentiable API (mirror_composite_attrs drop-in, stream layout)
# ---------------------------------------------------------------------------

def _stream_rows(attrs_f, sids_f, m2d_f):
    """[M, 9] rows -> [S_MAX, 9] aligned-stream rows (dead slots zeroed;
    the zeroed conic+opacity make alpha exactly 0, so dead slots neither
    render nor receive gradients)."""
    a = attrs_f
    if m2d_f is not None:
        a = jnp.concatenate([a[:, 0:2] + m2d_f, a[:, 2:]], axis=1)
    rows = jnp.take(a, jnp.maximum(sids_f, 0), axis=0)
    return jnp.where((sids_f >= 0)[:, None], rows, 0.0)


def _build_planes16(attrs, sids, m2d):
    """attrs [F, M, 9], sids [F, S_MAX] -> [16, F*S_MAX] stream planes."""
    f_n = attrs.shape[0]
    rows = jnp.concatenate([
        _stream_rows(attrs[f], sids[f],
                     None if m2d is None else m2d[2 * f])
        for f in range(f_n)], axis=0)                      # [F*S, 9]
    rows = jnp.pad(rows, ((0, 0), (0, _STREAM_ROWS - _N_ATTR)))
    return rows.T                                          # [16, F*S]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def stream_composite_attrs(settings: RasterSettings, attrs, sids,
                           blk_tile, blk_cc, nblk, m2d):
    """Composite 2F views (fwd + x-mirror per frame) from the aligned
    copy stream.  attrs [F, M, 9] (attr_rows_from_proj packing); sids
    [F, S_MAX] stream slot -> gaussian id (bin_gaussians_stream); blk_*
    the frame-concatenated block maps (tiles offset by f * n_tiles);
    m2d [2F, M, 2] zeros or None.  Returns out4 [2F*T, 4, P]."""
    planes16 = _build_planes16(attrs, sids, m2d)
    n_rows = 2 * attrs.shape[0] * settings.n_tiles
    out, _ = _stream_call(settings, planes16, blk_tile, blk_cc, nblk,
                          n_rows, save_tchk=False)
    return out[:n_rows]


def _sca_fwd(settings, attrs, sids, blk_tile, blk_cc, nblk, m2d):
    planes16 = _build_planes16(attrs, sids, m2d)
    n_rows = 2 * attrs.shape[0] * settings.n_tiles
    out, t_chk = _stream_call(settings, planes16, blk_tile, blk_cc, nblk,
                              n_rows, save_tchk=True)
    m_shape = None if m2d is None else m2d.shape
    return out[:n_rows], (planes16, sids, blk_tile, blk_cc, nblk, out,
                          t_chk, attrs.shape, m_shape)


def _sca_bwd(settings, res, g_out):
    (planes16, sids, blk_tile, blk_cc, nblk, out4_pad, t_chk, a_shape,
     m_shape) = res
    f_n, m_rows, _ = a_shape
    n_rows = 2 * f_n * settings.n_tiles
    has_m2d = m_shape is not None
    g_out_pad = jnp.concatenate(
        [g_out, jnp.zeros((1,) + g_out.shape[1:], g_out.dtype)], axis=0)
    gs = _stream_call_bwd(settings, planes16, blk_tile, blk_cc, nblk,
                          n_rows, out4_pad, t_chk, g_out_pad)
    s_max = sids.shape[1]
    d_attrs, d_m2d = [], []
    for f in range(f_n):
        seg = slice(f * s_max, (f + 1) * s_max)
        g0 = gs[0, :, seg]                                 # fwd view
        g1 = gs[1, :, seg]                                 # flip view
        cols = [g0[0] + g1[0], g0[1] + g1[1]]
        cols += [g0[i] + g1[i] for i in range(2, _N_ATTR)]
        if has_m2d:
            cols += [g0[0], g0[1], g1[0], g1[1]]
        rows = jnp.stack(cols, axis=1)                     # [S, 9|13]
        dead = sids[f] < 0
        rows = jnp.where(dead[:, None], 0.0, rows)
        ids = jnp.maximum(sids[f], 0)
        scat = jnp.zeros((m_rows, rows.shape[1]), rows.dtype
                         ).at[ids].add(rows)
        d_attrs.append(scat[:, :_N_ATTR])
        if has_m2d:
            d_m2d.append(scat[:, 9:11])
            # the flip view's screen x is mirrored: d m2d_flip_x = -d mux
            d_m2d.append(jnp.stack([-scat[:, 11], scat[:, 12]], axis=1))
    d_attrs_out = jnp.stack(d_attrs)
    d_m2d_out = jnp.stack(d_m2d) if has_m2d else None
    return d_attrs_out, None, None, None, None, d_m2d_out


stream_composite_attrs.defvjp(_sca_fwd, _sca_bwd)


def stream_composite_inference(settings: RasterSettings, attrs, sids,
                               blk_tile, blk_cc, nblk):
    """Forward-only stream compositing (no checkpoints, early exit)."""
    planes16 = _build_planes16(attrs, sids, None)
    n_rows = 2 * attrs.shape[0] * settings.n_tiles
    out, _ = _stream_call(settings, planes16, blk_tile, blk_cc, nblk,
                          n_rows, save_tchk=False)
    return out[:n_rows]


def concat_stream_bins(sbs, settings: RasterSettings):
    """Frame-concatenate StreamBins: (sids [F, S_MAX], blk_tile [F*B],
    blk_cc [F*B], nblk [F*T]) with per-frame tile offsets applied."""
    t_n = settings.n_tiles
    sids = jnp.stack([sb.ids for sb in sbs])
    blk_tile = jnp.concatenate([
        jnp.where(sb.blk_tile >= 0, sb.blk_tile + f * t_n, -1)
        for f, sb in enumerate(sbs)])
    blk_cc = jnp.concatenate([sb.blk_cc for sb in sbs])
    nblk = jnp.concatenate([sb.nblk for sb in sbs])
    return sids, blk_tile, blk_cc, nblk
