"""Pallas TPU kernels for tile compositing — the rasterizer hot path.

The pure-JAX compositor (splat.py) processes every (tile, chunk) pair;
XLA cannot skip work per tile because ``vmap`` lowers ``cond`` to
``select``.  These kernels run one grid step per tile with a real
``while_loop`` over gaussian chunks, so a tile stops as soon as its
binned gaussian list is exhausted or every pixel's transmittance has
saturated (< T_EPS).

All per-gaussian data is pre-gathered in XLA (one fused gather) into
struct-of-arrays [n_tiles, cap] planes — scalar-per-gaussian layout keeps
every VMEM block (cap,)-wide on the lane dimension (a [cap, 2/3] layout
would pad lanes 64x).  BlockSpecs stream one tile's rows per grid step.
The grid may be a multiple of ``settings.n_tiles``: callers batch V views
(two frames x two flip directions of a train step) by concatenating
planes to [V*T, cap] and compositing them in ONE kernel launch; tile
pixel coordinates derive from ``program_id % n_tiles``.

Kernel design notes (v2 — the round-2 performance rewrite):

  * per-gaussian color accumulation and the backward's nine per-gaussian
    reductions run on the MXU:  ``acc += Cols[3,C] @ w[C,P]`` forward, and
    backward conic/mean gradients come from six pixel-basis moments
    ``M = dq[C,P] @ B6[P-basis]`` followed by O(C) algebra — instead of
    nine [C,P] elementwise products + lane reductions.
  * validity is implicit: padding rows carry opacity 0, so no per-chunk
    row-mask is materialized.
  * the per-pixel transmittance carry is updated with the UNMASKED chunk
    product (one row of the inclusive cumprod that the compositing needs
    anyway).  This differs from the jnp compositor only on pixels whose
    transmittance is already < T_EPS = 1e-4; since sum(alpha_i * T_i) <=
    T_start, any image deviation is bounded by T_EPS.  The per-gaussian
    contribution w is still gated by ``live`` for gradient parity.
  * ``compute_dtype="bfloat16"`` evaluates the alpha math (the VPU-bound
    bulk) in bf16 with fp32 transmittance/accumulation.  Pixel deltas are
    computed ``subtract-then-cast`` in tile-LOCAL coordinates so bf16
    never quantizes absolute pixel positions (at x~1900 a bf16 ulp is
    8 px; tile-local deltas keep the ulp below 1/2 px at radius 128).

Replaces the reference's CUDA rasterizer backward
(diff_gaussian_rasterization, driven from ortho_gaussian_renderer/
renderer.py:63-98); the binning/projection stay in XLA (splat.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsvc_tpu.render.splat import (
    ALPHA_MAX, ALPHA_MIN, T_EPS, RasterOutput, RasterSettings,
    _bin_gaussians, assemble_views, gather_tile_planes, project_gaussians,
    tile_harmful_overflow,
)


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------

def _tri_excl_upper(chunk):
    # int32 iota: Mosaic rejects float-typed tpu.iota
    return (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
            ).astype(jnp.float32)


def _tri_excl_lower(chunk):
    return (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
            > jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
            ).astype(jnp.float32)


def _mm_bf16(a, b):
    """bf16-input matmul, f32 accumulation (full MXU rate)."""
    return _mm(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))


def _mm_rhs_t_bf16(a, b):
    return _mm_rhs_t(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))


def _mm_tri_bf16x2(tri, b):
    """Error-compensated two-pass bf16 matmul for the transmittance
    cumsum: tri is exactly representable (0/1), b is split b = hi + lo
    with both halves bf16 — the residual carries ~9 extra mantissa bits,
    so the f32-accumulated sum matches the f32 matmul to ~2^-18 per
    term.  2 bf16 MXU passes replace the (slower) f32 emulation."""
    th = tri.astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    return _mm(th, bh) + _mm(th, bl)


def _matmul_fns(settings):
    """(mm_tri, mm_grad, mm_grad_rhs_t) per the matmul_dtype policy.

    mm_tri guards the transmittance cumsum (image-exactness sensitive);
    the grad pair feeds the backward's suffix/moment/color matmuls
    (~0.4% relative error in bf16, gated by the grad-cosine tests).
    compute_dtype=="bfloat16" implies bf16 gradient matmuls for
    backward compatibility with the v2 fast mode."""
    md = getattr(settings, "matmul_dtype", "float32")
    if md == "bfloat16":
        return _mm_bf16, _mm_bf16, _mm_rhs_t_bf16
    if md == "bf16x2":
        return _mm_tri_bf16x2, _mm_bf16, _mm_rhs_t_bf16
    if settings.compute_dtype == "bfloat16":
        return _mm, _mm_bf16, _mm_rhs_t_bf16
    return _mm, _mm, _mm_rhs_t


def _trans_chunk(alpha32, chunk, with_total: bool = True, tri=None,
                 mm_tri=None):
    """In-chunk transmittance factors from fp32 alpha.

    Returns (excl [C,P]: prod over rows before i in COMPOSITE order of
    (1-alpha_j), chunk_total [1,P] or None).  Log-space with the
    exclusive cumsum as a triangular matmul: 2 transcendental passes +
    one MXU op, versus log2(C) roll+mul+select rounds for a direct
    Hillis-Steele cumprod (and Mosaic's rotate has no sub-32-bit support
    anyway).  ``tri`` selects the composite direction: strictly-lower
    (default, rows composited top-down) or strictly-upper (mirror views,
    rows composited bottom-up).  ALPHA_MAX = 0.99 bounds log1p at ~-4.6,
    so the [C,P] sums stay well-conditioned."""
    l = jnp.log1p(-alpha32)                       # [C, P]
    if tri is None:
        tri = _tri_excl_lower(chunk)
    if mm_tri is None:
        mm_tri = _mm
    s_excl = mm_tri(tri, l)                       # MXU exclusive cumsum
    excl = jnp.exp(s_excl)
    if not with_total:
        return excl, None
    total = jnp.sum(l, axis=0, keepdims=True)     # [1, P]
    return excl, jnp.exp(total)


def _mm(a, b):
    """[M,K] @ [K,N] on the MXU, f32 accumulation."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_rhs_t(a, b):
    """[M,K] @ [N,K]^T -> [M,N] (contract both minor dims) on the MXU."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _tile_coords(settings: RasterSettings, tile_id):
    """(xs_local[1,P], ys_local[1,P], cx, cy) for one tile.

    Coordinates are TILE-CENTERED: the alpha math and the backward moment
    basis work entirely in local coordinates, which keeps magnitudes
    ~tile-sized (precision: bf16 deltas, fp32 moment cancellation)."""
    th, tw = settings.tile_h, settings.tile_w
    p = th * tw
    tile_id = tile_id % settings.n_tiles
    tile_x = tile_id % settings.n_tiles_x
    tile_y = tile_id // settings.n_tiles_x
    cx = (tile_x * tw).astype(jnp.float32) + (tw - 1) / 2.0
    cy = (tile_y * th).astype(jnp.float32) + (th - 1) / 2.0
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    xs = (lin % tw).astype(jnp.float32) - (tw - 1) / 2.0
    ys = (lin // tw).astype(jnp.float32) - (th - 1) / 2.0
    return xs, ys, cx, cy


def _chunk_scalars(planes_refs, t, sl, cx, cy):
    """Load one chunk's per-gaussian scalars; means shifted tile-local.
    ``t`` selects the tile row within a multi-tile block."""
    (mux_ref, muy_ref, cona_ref, conb_ref, conc_ref, op_ref,
     colr_ref, colg_ref, colb_ref) = planes_refs
    mu_x = mux_ref[t, 0, sl] - cx          # [C] tile-local
    mu_y = muy_ref[t, 0, sl] - cy
    con_a = cona_ref[t, 0, sl]
    con_b = conb_ref[t, 0, sl]
    con_c = conc_ref[t, 0, sl]
    op = op_ref[t, 0, sl]
    col_r = colr_ref[t, 0, sl]
    col_g = colg_ref[t, 0, sl]
    col_b = colb_ref[t, 0, sl]
    return mu_x, mu_y, con_a, con_b, con_c, op, col_r, col_g, col_b


def _basis8(xs, ys):
    """Pixel-polynomial basis rows [1, x, y, x^2, xy, y^2, 0, 0] — shared
    by the MXU quadratic form (forward) and the moment backward."""
    zeros = jnp.zeros_like(xs)
    return jnp.concatenate(
        [jnp.ones_like(xs), xs, ys, xs * xs, xs * ys, ys * ys,
         zeros, zeros], axis=0)                               # [8, P]


def _chunk_alpha(scalars, xs, ys, compute_dtype, basis=None):
    """[C,P] alpha evaluation.  Returns (alpha [C,P] compute-dtype with
    MIN/MAX clamps applied, act [C,P] bool gradient gate).

    Validity is implicit: padding/invalid rows have op == 0 -> alpha 0.
    bf16 mode: subtract in fp32, THEN cast the (small, tile-local) deltas.
    When ``basis`` ([8, P] from _basis8) is given in fp32 mode, the
    quadratic form is evaluated as ONE MXU matmul  q = G[C,8] @ basis
    (expanding q = a d0^2 + 2b d0 d1 + c d1^2 in the pixel polynomial
    basis) instead of ~8 elementwise VPU passes over [C, P].
    MEASURED SLOWER on v5e (bench 3.25 -> 2.97 it/s): the G form needs
    Precision.HIGHEST (mux^2 terms up to 1e6 cancel against the basis —
    single-pass bf16 MXU would lose the cancellation the d0-first VPU
    form performs exactly), and the 6-pass f32 matmul at K=8-padded-128
    costs more than the VPU passes it replaces.  Kept selectable for
    future TPU generations; no kernel passes ``basis`` today.
    """
    mu_x, mu_y, con_a, con_b, con_c, op = scalars[:6]
    if basis is not None and compute_dtype == "float32":
        a = con_a[:, None]
        b = con_b[:, None]
        c = con_c[:, None]
        mx = mu_x[:, None]
        my = mu_y[:, None]
        g = jnp.concatenate([
            a * mx * mx + 2.0 * b * mx * my + c * my * my,
            -2.0 * (a * mx + b * my),
            -2.0 * (c * my + b * mx),
            a, 2.0 * b, c,
            jnp.zeros_like(a), jnp.zeros_like(a)], axis=1)    # [C, 8]
        q = jax.lax.dot_general(
            g, basis, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        alpha_raw = op[:, None] * jnp.exp(-0.5 * q)
        alpha = jnp.minimum(alpha_raw, ALPHA_MAX)
        ge_min = alpha >= ALPHA_MIN
        alpha = jnp.where(ge_min, alpha, 0.0)
        act = ge_min & (alpha_raw < ALPHA_MAX)
        return alpha, act, None, None
    d0f = xs - mu_x[:, None]                      # [C, P] fp32
    d1f = ys - mu_y[:, None]
    if compute_dtype == "bfloat16":
        # bf16 for the quadratic-form + exp bulk; comparisons/clamps in
        # fp32 (Mosaic has no sub-32-bit cmpf)
        cd = jnp.bfloat16
        d0 = d0f.astype(cd)
        d1 = d1f.astype(cd)
        a = con_a[:, None].astype(cd)
        b = con_b[:, None].astype(cd)
        c = con_c[:, None].astype(cd)
        q = a * d0 * d0 + 2.0 * b * d0 * d1 + c * d1 * d1
        alpha_raw = (op[:, None].astype(cd)
                     * jnp.exp(-0.5 * q)).astype(jnp.float32)
    else:
        # FMA-reassociated -q/2 = d0*u + d1*v with the -1/2 folded into
        # the [C]-sized scalars: 6 broadcast passes over [C, P] instead
        # of 9 for the expanded quadratic (same values up to fp
        # reassociation rounding)
        ha = (-0.5) * con_a[:, None]
        hb = (-0.5) * con_b[:, None]
        hc = (-0.5) * con_c[:, None]
        u = ha * d0f + hb * d1f
        v = hb * d0f + hc * d1f
        alpha_raw = op[:, None] * jnp.exp(d0f * u + d1f * v)
    alpha = jnp.minimum(alpha_raw, ALPHA_MAX)
    ge_min = alpha >= ALPHA_MIN
    alpha = jnp.where(ge_min, alpha, 0.0)
    act = ge_min & (alpha_raw < ALPHA_MAX)
    return alpha, act, d0f, d1f


# ---------------------------------------------------------------------------
# Forward kernel (shared: inference and training; training also saves the
# per-chunk transmittance checkpoints for the backward replay)
# ---------------------------------------------------------------------------

def _fwd_kernel(count_ref, *refs, settings: RasterSettings, save_tchk: bool,
                tps: int = 1):
    """``tps`` tiles are processed per grid step (blocks carry tps tile
    rows) — amortizes per-grid-step scheduling/DMA overhead."""
    planes_refs = refs[:9]
    out_ref = refs[9]
    tchk_ref = refs[10] if save_tchk else None
    p = settings.tile_h * settings.tile_w
    chunk = settings.chunk
    n_chunks = settings.gaussian_cap // chunk
    mm_tri, _, _ = _matmul_fns(settings)

    for t in range(tps):
        tile_id = pl.program_id(0) * tps + t
        count = count_ref[tile_id]
        xs, ys, cx, cy = _tile_coords(settings, tile_id)

        def body(state, t=t, xs=xs, ys=ys, cx=cx, cy=cy, count=count):
            c, t_carry, acc = state
            if save_tchk:
                tchk_ref[t, c, :] = t_carry[0]
            sl = pl.ds(pl.multiple_of(c * chunk, chunk), chunk)
            scalars = _chunk_scalars(planes_refs, t, sl, cx, cy)
            alpha, _, _, _ = _chunk_alpha(scalars, xs, ys,
                                          settings.compute_dtype)
            alpha32 = alpha.astype(jnp.float32)
            excl, chunk_t = _trans_chunk(alpha32, chunk, mm_tri=mm_tri)
            t_before = t_carry * excl                         # [C, P] fp32
            w = jnp.where(t_before >= T_EPS, alpha32 * t_before, 0.0)
            col_r, col_g, col_b = scalars[6:9]
            cols3 = jnp.concatenate(
                [col_r[None, :], col_g[None, :], col_b[None, :]], axis=0)
            acc = acc + _mm(cols3, w)                         # MXU [3, P]
            t_carry = t_carry * chunk_t
            return c + 1, t_carry, acc

        def cond(state, count=count):
            c, t_carry, _ = state
            return jnp.logical_and(
                c < n_chunks,
                jnp.logical_and(c * chunk < count,
                                jnp.max(t_carry) >= T_EPS))

        t0 = jnp.ones((1, p), jnp.float32)
        acc0 = jnp.zeros((3, p), jnp.float32)
        c_end, t_final, acc = jax.lax.while_loop(cond, body, (0, t0, acc0))

        if save_tchk:
            # fill checkpoints for chunks after early exit with the final
            # T, and store the EXACT final transmittance in the extra
            # last row (the backward reads it instead of replaying)
            def fill_body(ci, _, t=t, t_final=t_final, c_end=c_end):
                @pl.when(ci >= c_end)
                def _():
                    tchk_ref[t, ci, :] = t_final[0]
                return 0
            jax.lax.fori_loop(0, n_chunks, fill_body, 0)
            tchk_ref[t, n_chunks, :] = t_final[0]

        out_ref[t, 0:3, :] = acc + t_final * settings.bg
        out_ref[t, 3, :] = t_final[0]


# ---------------------------------------------------------------------------
# Backward kernel: reverse chunk replay with a suffix accumulator.
# Per-gaussian gradients via pixel-basis moments on the MXU:
#   with tile-local d0 = xl - mxl, d1 = yl - myl and dq = -alpha*d_alpha/2,
#   every reduction  sum_p dq * poly(d0, d1)  expands into six moments
#   M_k = sum_p dq * b_k(xl, yl),  b = (1, xl, yl, xl^2, xl*yl, yl^2),
#   computed as ONE [C,P] @ [P,6] matmul, then O(C) vector algebra.
# ---------------------------------------------------------------------------

def _bwd_kernel(count_ref, *refs, settings: RasterSettings, tps: int = 1):
    planes_refs = refs[:9]
    g_ref, tchk_ref = refs[9], refs[10]
    grad_refs = refs[11:20]
    chunk = settings.chunk
    n_chunks = settings.gaussian_cap // chunk
    tri_up = _tri_excl_upper(chunk)
    # the backward's four gradient matmuls (gc, suffix, moments, dcol)
    # take bf16 inputs with f32 accumulation when matmul_dtype/bf16 fast
    # mode asks for it: 4x MXU rate, ~0.4% relative gradient error
    # (validated by the grad-cosine test); the transmittance cumsum
    # follows the forward's mm_tri policy so the replayed T matches the
    # forward's checkpoints
    mm_tri, mm, mm_rhs_t = _matmul_fns(settings)
    bg = settings.bg
    for t in range(tps):
        tile_id = pl.program_id(0) * tps + t
        count = count_ref[tile_id]
        xs, ys, cx, cy = _tile_coords(settings, tile_id)
        _bwd_one_tile(planes_refs, g_ref, tchk_ref, grad_refs, settings,
                      tri_up, mm_tri, mm, mm_rhs_t, t, count, xs, ys, cx,
                      cy, chunk, n_chunks, bg)


def _bwd_one_tile(planes_refs, g_ref, tchk_ref, grad_refs, settings,
                  tri_up, mm_tri, mm, mm_rhs_t, t, count, xs, ys, cx, cy,
                  chunk, n_chunks, bg):
    # pixel-polynomial basis rows: [1, xl, yl, xl^2, xl*yl, yl^2, 0, 0]
    basis = _basis8(xs, ys)

    for r in grad_refs:
        r[t, 0, :] = jnp.zeros((settings.gaussian_cap,), jnp.float32)

    g3 = g_ref[t, 0:3, :]                                     # [3, P]
    g_t = g_ref[t, 3, :][None, :]
    g_sum = jnp.sum(g3, axis=0, keepdims=True)                # [1, P]

    n_used = jnp.minimum(
        (count + chunk - 1) // chunk, n_chunks).astype(jnp.int32)

    def replay(c):
        sl = pl.ds(pl.multiple_of(c * chunk, chunk), chunk)
        scalars = _chunk_scalars(planes_refs, t, sl, cx, cy)
        alpha, act, _, _ = _chunk_alpha(scalars, xs, ys,
                                        settings.compute_dtype)
        alpha32 = alpha.astype(jnp.float32)
        excl, _ = _trans_chunk(alpha32, chunk, with_total=False,
                               mm_tri=mm_tri)
        t_start = tchk_ref[t, c, :][None, :]
        t_before = t_start * excl
        return scalars, alpha32, act, t_before

    # exact T_final from the forward's extra checkpoint row
    t_final = tchk_ref[t, n_chunks, :][None, :]
    a_init = t_final * (bg * g_sum + g_t)

    # skip chunks the forward never reached / that start fully dead:
    # max T < T_EPS at a chunk's start means every w in it is zero and
    # all its gradients stay at the zero-initialized refs
    def last_live(c, best):
        t_max = jnp.max(tchk_ref[t, c, :])
        return jnp.where(t_max >= T_EPS, c, best)
    c_hot = jax.lax.fori_loop(0, n_used, last_live, jnp.int32(-1))

    def body(state):
        c, a_acc = state
        sl = pl.ds(pl.multiple_of(c * chunk, chunk), chunk)
        scalars, alpha32, act, t_before = replay(c)
        mu_x, mu_y, con_a, con_b, con_c, op = scalars[:6]

        live = t_before >= T_EPS
        w = jnp.where(live, alpha32 * t_before, 0.0)

        # cols as [C, 3] for the MXU: gc[C,P] = C3 @ g3
        col_r, col_g, col_b = scalars[6:9]
        c3 = jnp.concatenate([col_r[:, None], col_g[:, None],
                              col_b[:, None]], axis=1)        # [C, 3]
        gc = mm(c3, g3)                                       # [C, P]
        wgc = w * gc
        a_i = a_acc + mm(tri_up, wgc)                         # suffix (MXU)

        one_m32 = jnp.maximum(1.0 - alpha32, 1e-6)
        # approx reciprocal: ~12-bit, well below the training tolerance;
        # replaces a full-precision VPU divide per element
        inv_one_m = pl.reciprocal(one_m32, approx=True) \
            if jax.default_backend() == "tpu" else 1.0 / one_m32
        d_alpha = jnp.where(live & act,
                            gc * t_before - a_i * inv_one_m, 0.0)
        dq = d_alpha * alpha32 * (-0.5)                       # [C, P]

        m = mm_rhs_t(dq, basis)                               # [C, 8] moments
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

        dcol = mm_rhs_t(w, g3)                                # [C, 3]

        grad_refs[0][t, 0, sl] = d_mux[:, 0]
        grad_refs[1][t, 0, sl] = d_muy[:, 0]
        grad_refs[2][t, 0, sl] = d_cona[:, 0]
        grad_refs[3][t, 0, sl] = d_conb[:, 0]
        grad_refs[4][t, 0, sl] = d_conc[:, 0]
        grad_refs[5][t, 0, sl] = d_op[:, 0]
        grad_refs[6][t, 0, sl] = dcol[:, 0]
        grad_refs[7][t, 0, sl] = dcol[:, 1]
        grad_refs[8][t, 0, sl] = dcol[:, 2]

        a_acc = a_acc + jnp.sum(wgc, axis=0, keepdims=True)
        return c - 1, a_acc

    def cond(state):
        c, _ = state
        return c >= 0

    jax.lax.while_loop(cond, body, (c_hot, a_init))


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _plane_spec(cap, tps: int = 1):
    return pl.BlockSpec((tps, 1, cap), lambda g, counts: (g, 0, 0),
                        memory_space=pltpu.VMEM)


def _tiles_per_step(n_grid: int) -> int:
    """Process 2 tiles per grid step when the grid divides evenly —
    amortizes per-step scheduling/DMA overhead in the Mosaic grid loop."""
    return 2 if n_grid % 2 == 0 else 1


def _check_chunk(settings):
    assert settings.chunk % 128 == 0 or jax.default_backend() != "tpu", \
        "pallas compositing needs chunk % 128 == 0 (lane-aligned slices)"


def _composite_call(settings: RasterSettings, planes, tile_counts,
                    save_tchk: bool):
    """Run the forward kernel over a grid of planes.shape[0] tiles.

    planes may be a V-view concatenation [V*n_tiles, cap]: the kernel maps
    grid step -> pixel coords via program_id % n_tiles."""
    _check_chunk(settings)
    n_grid = planes[0].shape[0]
    cap = settings.gaussian_cap
    p = settings.tile_h * settings.tile_w
    n_chunks = cap // settings.chunk
    tps = _tiles_per_step(n_grid)
    planes3 = tuple(q[:, None, :] for q in planes)
    out_specs = [pl.BlockSpec((tps, 4, p), lambda g, counts: (g, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((n_grid, 4, p), jnp.float32)]
    if save_tchk:
        # +1 row: the exact final transmittance (see _fwd_kernel)
        out_specs.append(
            pl.BlockSpec((tps, n_chunks + 1, p),
                         lambda g, counts: (g, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((n_grid, n_chunks + 1, p), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_grid // tps,),
        in_specs=[_plane_spec(cap, tps)] * 9,
        out_specs=out_specs,
    )
    res = pl.pallas_call(
        functools.partial(_fwd_kernel, settings=settings,
                          save_tchk=save_tchk, tps=tps),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(tile_counts, *planes3)
    return (res[0], res[1]) if save_tchk else (res[0], None)


def _composite_call_bwd(settings: RasterSettings, planes, tile_counts,
                        t_chk, g_out):
    _check_chunk(settings)
    n_grid = planes[0].shape[0]
    cap = settings.gaussian_cap
    p = settings.tile_h * settings.tile_w
    n_chunks = cap // settings.chunk
    tps = _tiles_per_step(n_grid)
    planes3 = tuple(q[:, None, :] for q in planes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_grid // tps,),
        in_specs=[_plane_spec(cap, tps)] * 9 + [
            pl.BlockSpec((tps, 4, p), lambda g, counts: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tps, n_chunks + 1, p),
                         lambda g, counts: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[_plane_spec(cap, tps)] * 9,
    )
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, settings=settings, tps=tps),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_grid, 1, cap), jnp.float32)] * 9,
        interpret=jax.default_backend() != "tpu",
    )(tile_counts, *planes3, g_out, t_chk)
    return tuple(g[:, 0, :] for g in grads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pallas_tile_composite(settings: RasterSettings, planes, tile_counts):
    """Differentiable tile compositing: planes 9x[T', cap] -> [T', 4, P].

    T' may be any multiple of settings.n_tiles (concatenated views)."""
    out, _ = _composite_call(settings, planes, tile_counts, save_tchk=False)
    return out


def _ptc_fwd(settings, planes, tile_counts):
    out, t_chk = _composite_call(settings, planes, tile_counts,
                                 save_tchk=True)
    return out, (planes, tile_counts, t_chk)


def _ptc_bwd(settings, res, g_out):
    planes, tile_counts, t_chk = res
    grads = _composite_call_bwd(settings, planes, tile_counts, t_chk, g_out)
    return grads, None


pallas_tile_composite.defvjp(_ptc_fwd, _ptc_bwd)


def composite_tiles_inference(settings: RasterSettings, planes, tile_counts):
    """Forward-only compositing (no checkpoint output, early exit)."""
    out, _ = _composite_call(settings, planes, tile_counts, save_tchk=False)
    return out


# ---------------------------------------------------------------------------
# Mirror-view kernels (v3): the x-flipped view of a frame is composited
# directly FROM THE FORWARD VIEW'S PLANES.  The flip view's tile lists are
# a permutation of the forward ones (mirror tiles, reverse depth order) and
# its attribute transform (mux' = (W-1)-mux, conic b' = -b) cancels against
# the mirrored pixel coordinate:  alpha_flip(x') = alpha_fwd((W-1)-x').
# So a flip grid step reads the MIRRORED data tile, evaluates alpha at
# negated tile-local xs, and composites chunks bottom-up (suffix products
# via the upper-triangular MXU cumsum).  This removes, per frame, one
# [T*cap] plane gather + one [T*cap, 9] scatter-add transpose + the
# integer mirror permutation — the dominant non-compositing costs of the
# round-2 step (~22 ms per scatter at 1M rows, measured at XLA's floor).
#
# Grid layout: g = (f*T + u)*2 + v with v (view) innermost, so the two
# views of a data tile are CONSECUTIVE grid steps sharing the same input
# plane block (one DMA) and, in the backward, the same gradient output
# block (accumulated across the two steps while resident in VMEM).
# ---------------------------------------------------------------------------


def _mirror_view_ids(settings: RasterSettings, g):
    """(data_row f*T+u, v, out_row) for mirror-grid step g.

    Flip steps (v == 1) write the x-mirrored OUTPUT tile: the data tile u
    renders the flip view's tile mirror(u)."""
    t_n = settings.n_tiles
    ntx = settings.n_tiles_x
    d = g // 2
    v = g % 2
    f = d // t_n
    u = d % t_n
    mirror_u = u + (ntx - 1) - 2 * (u % ntx)
    tile_out = jnp.where(v == 1, mirror_u, u)
    return d, v, (2 * f + v) * t_n + tile_out


def _fwd_kernel_mirror(count_ref, *refs, settings: RasterSettings,
                       save_tchk: bool):
    planes_refs = refs[:9]
    out_ref = refs[9]
    tchk_ref = refs[10] if save_tchk else None
    chunk = settings.chunk
    n_chunks = settings.gaussian_cap // chunk
    p_pix = settings.tile_h * settings.tile_w

    g = pl.program_id(0)
    u = (g // 2) % settings.n_tiles
    v = g % 2
    rev = v == 1
    count = count_ref[g // 2]
    xs, ys, cx, cy = _tile_coords(settings, u)
    xs_eff = jnp.where(rev, -xs, xs)
    tri_fwd = jnp.where(rev, _tri_excl_upper(chunk), _tri_excl_lower(chunk))
    n_used = jnp.minimum((count + chunk - 1) // chunk, n_chunks)
    mm_tri, _, _ = _matmul_fns(settings)

    def body(state):
        p, t_carry, acc = state
        if save_tchk:
            # checkpoints are stored by COMPOSITE position p (not data
            # chunk), so the backward replay is view-direction agnostic
            tchk_ref[0, p, :] = t_carry[0]
        c = jnp.where(rev, n_used - 1 - p, p)
        sl = pl.ds(pl.multiple_of(c * chunk, chunk), chunk)
        scalars = _chunk_scalars(planes_refs, 0, sl, cx, cy)
        alpha, _, _, _ = _chunk_alpha(scalars, xs_eff, ys,
                                      settings.compute_dtype)
        alpha32 = alpha.astype(jnp.float32)
        excl, chunk_t = _trans_chunk(alpha32, chunk, tri=tri_fwd,
                                     mm_tri=mm_tri)
        t_before = t_carry * excl                         # [C, P] fp32
        w = jnp.where(t_before >= T_EPS, alpha32 * t_before, 0.0)
        col_r, col_g, col_b = scalars[6:9]
        cols3 = jnp.concatenate(
            [col_r[None, :], col_g[None, :], col_b[None, :]], axis=0)
        acc = acc + _mm(cols3, w)                         # MXU [3, P]
        return p + 1, t_carry * chunk_t, acc

    def cond(state):
        p, t_carry, _ = state
        return jnp.logical_and(p < n_used, jnp.max(t_carry) >= T_EPS)

    t0 = jnp.ones((1, p_pix), jnp.float32)
    acc0 = jnp.zeros((3, p_pix), jnp.float32)
    p_end, t_final, acc = jax.lax.while_loop(cond, body, (0, t0, acc0))

    if save_tchk:
        def fill_body(pi, _, t_final=t_final, p_end=p_end):
            @pl.when(pi >= p_end)
            def _():
                tchk_ref[0, pi, :] = t_final[0]
            return 0
        jax.lax.fori_loop(0, n_chunks, fill_body, 0)
        tchk_ref[0, n_chunks, :] = t_final[0]

    out_ref[0, 0:3, :] = acc + t_final * settings.bg
    out_ref[0, 3, :] = t_final[0]


def _bwd_kernel_mirror(count_ref, *refs, settings: RasterSettings,
                       per_view_mu: bool):
    planes_refs = refs[:9]
    g_ref, tchk_ref = refs[9], refs[10]
    grad_refs = refs[11:20]
    chunk = settings.chunk
    n_chunks = settings.gaussian_cap // chunk
    cap = settings.gaussian_cap

    g = pl.program_id(0)
    u = (g // 2) % settings.n_tiles
    v = g % 2
    rev = v == 1
    count = count_ref[g // 2]
    xs, ys, cx, cy = _tile_coords(settings, u)
    xs_eff = jnp.where(rev, -xs, xs)
    tri_fwd = jnp.where(rev, _tri_excl_upper(chunk), _tri_excl_lower(chunk))
    # suffix-in-composite-order accumulation: for flip views the in-chunk
    # "later" gaussians are the LOWER data rows
    tri_bwd = jnp.where(rev, _tri_excl_lower(chunk), _tri_excl_upper(chunk))

    mm_tri, mm, mm_rhs_t = _matmul_fns(settings)

    # mux/muy may be per-view outputs (densification stats need each
    # view's screen gradients separately); the other seven accumulate
    # across the two consecutive view steps of a data tile
    pv_refs = grad_refs[:2] if per_view_mu else ()
    acc_refs = grad_refs[2:] if per_view_mu else grad_refs
    zeros_cap = jnp.zeros((cap,), jnp.float32)

    @pl.when(v == 0)
    def _():
        for r in acc_refs:
            r[0, 0, :] = zeros_cap

    for r in pv_refs:
        r[0, 0, :] = zeros_cap

    basis = _basis8(xs_eff, ys)

    g3 = g_ref[0, 0:3, :]
    g_t = g_ref[0, 3, :][None, :]
    g_sum = jnp.sum(g3, axis=0, keepdims=True)
    n_used = jnp.minimum((count + chunk - 1) // chunk, n_chunks)

    t_final = tchk_ref[0, n_chunks, :][None, :]
    a_init = t_final * (settings.bg * g_sum + g_t)

    def last_live(p, best):
        return jnp.where(jnp.max(tchk_ref[0, p, :]) >= T_EPS, p, best)
    p_hot = jax.lax.fori_loop(0, n_used, last_live, jnp.int32(-1))

    def body(state):
        p, a_acc = state
        c = jnp.where(rev, n_used - 1 - p, p)
        sl = pl.ds(pl.multiple_of(c * chunk, chunk), chunk)
        scalars = _chunk_scalars(planes_refs, 0, sl, cx, cy)
        alpha, act, _, _ = _chunk_alpha(scalars, xs_eff, ys,
                                        settings.compute_dtype)
        alpha32 = alpha.astype(jnp.float32)
        excl, _ = _trans_chunk(alpha32, chunk, with_total=False,
                               tri=tri_fwd, mm_tri=mm_tri)
        t_before = tchk_ref[0, p, :][None, :] * excl
        mu_x, mu_y, con_a, con_b, con_c, op = scalars[:6]

        live = t_before >= T_EPS
        w = jnp.where(live, alpha32 * t_before, 0.0)
        col_r, col_g, col_b = scalars[6:9]
        c3 = jnp.concatenate([col_r[:, None], col_g[:, None],
                              col_b[:, None]], axis=1)    # [C, 3]
        gc = mm(c3, g3)                                   # [C, P]
        wgc = w * gc
        a_i = a_acc + mm(tri_bwd, wgc)                    # suffix (MXU)

        one_m32 = jnp.maximum(1.0 - alpha32, 1e-6)
        inv_one_m = pl.reciprocal(one_m32, approx=True) \
            if jax.default_backend() == "tpu" else 1.0 / one_m32
        d_alpha = jnp.where(live & act,
                            gc * t_before - a_i * inv_one_m, 0.0)
        dq = d_alpha * alpha32 * (-0.5)                   # [C, P]

        m = mm_rhs_t(dq, basis)                           # [C, 8] moments
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
        dcol = mm_rhs_t(w, g3)                            # [C, 3]

        vals = (d_mux[:, 0], d_muy[:, 0], d_cona[:, 0], d_conb[:, 0],
                d_conc[:, 0], d_op[:, 0], dcol[:, 0], dcol[:, 1],
                dcol[:, 2])
        for i, (r, val) in enumerate(zip(grad_refs, vals)):
            if per_view_mu and i < 2:
                r[0, 0, sl] = val                         # per-view block
            else:
                r[0, 0, sl] = r[0, 0, sl] + val           # accumulated

        a_acc = a_acc + jnp.sum(wgc, axis=0, keepdims=True)
        return p - 1, a_acc

    def cond(state):
        return state[0] >= 0

    jax.lax.while_loop(cond, body, (p_hot, a_init))


def _mirror_call(settings: RasterSettings, planes, tile_counts,
                 save_tchk: bool):
    """Forward mirror kernel over 2 views x planes.shape[0] data tiles.

    planes: 9 x [F*T, cap] FORWARD-view planes; tile_counts [F*T].
    Returns out4 [2F*T, 4, P] in view order (f0 fwd, f0 flip, f1 fwd,
    f1 flip) — the assemble_views contract."""
    _check_chunk(settings)
    ft = planes[0].shape[0]
    n_grid = 2 * ft
    cap = settings.gaussian_cap
    p = settings.tile_h * settings.tile_w
    n_chunks = cap // settings.chunk
    planes3 = tuple(q[:, None, :] for q in planes)

    def data_map(g, counts):
        return (g // 2, 0, 0)

    def out_map(g, counts):
        _, _, row = _mirror_view_ids(settings, g)
        return (row, 0, 0)

    out_specs = [pl.BlockSpec((1, 4, p), out_map, memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((n_grid, 4, p), jnp.float32)]
    if save_tchk:
        out_specs.append(pl.BlockSpec((1, n_chunks + 1, p), out_map,
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((n_grid, n_chunks + 1, p), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_grid,),
        in_specs=[pl.BlockSpec((1, 1, cap), data_map,
                               memory_space=pltpu.VMEM)] * 9,
        out_specs=out_specs,
    )
    res = pl.pallas_call(
        functools.partial(_fwd_kernel_mirror, settings=settings,
                          save_tchk=save_tchk),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(tile_counts, *planes3)
    return (res[0], res[1]) if save_tchk else (res[0], None)


def _mirror_call_bwd(settings: RasterSettings, planes, tile_counts,
                     t_chk, g_out, per_view_mu: bool):
    _check_chunk(settings)
    ft = planes[0].shape[0]
    n_grid = 2 * ft
    cap = settings.gaussian_cap
    p = settings.tile_h * settings.tile_w
    n_chunks = cap // settings.chunk
    planes3 = tuple(q[:, None, :] for q in planes)

    def data_map(g, counts):
        return (g // 2, 0, 0)

    def out_map(g, counts):
        _, _, row = _mirror_view_ids(settings, g)
        return (row, 0, 0)

    def view_map(g, counts):
        return (g, 0, 0)

    acc_spec = pl.BlockSpec((1, 1, cap), data_map, memory_space=pltpu.VMEM)
    pv_spec = pl.BlockSpec((1, 1, cap), view_map, memory_space=pltpu.VMEM)
    acc_shape = jax.ShapeDtypeStruct((ft, 1, cap), jnp.float32)
    pv_shape = jax.ShapeDtypeStruct((n_grid, 1, cap), jnp.float32)
    if per_view_mu:
        out_specs = [pv_spec, pv_spec] + [acc_spec] * 7
        out_shape = [pv_shape, pv_shape] + [acc_shape] * 7
    else:
        out_specs = [acc_spec] * 9
        out_shape = [acc_shape] * 9

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_grid,),
        in_specs=[pl.BlockSpec((1, 1, cap), data_map,
                               memory_space=pltpu.VMEM)] * 9 + [
            pl.BlockSpec((1, 4, p), out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks + 1, p), out_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel_mirror, settings=settings,
                          per_view_mu=per_view_mu),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(tile_counts, *planes3, g_out, t_chk)
    return tuple(g[:, 0, :] for g in grads)


def _planes_from_attrs(attrs, tile_lists, m2d):
    """Gather forward-view planes for F frames.  attrs [F, M, 9];
    tile_lists [F, T, cap]; m2d [2F, M, 2] or None (fwd views 2f are
    embedded into the mux/muy columns — zeros numerically)."""
    from gsvc_tpu.render.splat import gather_tile_planes_rows

    f_n = attrs.shape[0]
    per_frame = []
    for f in range(f_n):
        a = attrs[f]
        if m2d is not None:
            a = jnp.concatenate(
                [a[:, 0:2] + m2d[2 * f], a[:, 2:]], axis=1)
        per_frame.append(gather_tile_planes_rows(a, tile_lists[f]))
    return tuple(
        jnp.concatenate([per_frame[f][i] for f in range(f_n)], axis=0)
        for i in range(9))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def mirror_composite_attrs(settings: RasterSettings, attrs, tile_lists,
                           counts, m2d):
    """Composite 2F views (fwd + x-mirror per frame) straight from the
    per-gaussian attribute rows.

    attrs [F, M, 9] (attr_rows_from_proj packing), tile_lists [F, T, cap]
    int32, counts [F, T], m2d [2F, M, 2] zeros or None.  Returns out4
    [2F*T, 4, P].  The backward performs ONE [T*cap]-row scatter-add per
    frame (9 or 13 columns) instead of two 9-column ones."""
    planes = _planes_from_attrs(attrs, tile_lists, m2d)
    out, _ = _mirror_call(settings, planes, counts.reshape(-1),
                          save_tchk=False)
    return out


def _mca_fwd(settings, attrs, tile_lists, counts, m2d):
    planes = _planes_from_attrs(attrs, tile_lists, m2d)
    out, t_chk = _mirror_call(settings, planes, counts.reshape(-1),
                              save_tchk=True)
    m_shape = None if m2d is None else m2d.shape
    return out, (planes, tile_lists, counts, t_chk, attrs.shape, m_shape)


# live padded stack per scatter chunk: rows x 128 lanes x 4 B (~256 MB);
# module-level so tests can shrink it to exercise the chunked path
_SCATTER_CHUNK_ROWS = 1 << 19


def _chunked_row_scatter(cols, ids2d, m_rows):
    """Scatter-add per-tile column grads into ``[m_rows, len(cols)]``.

    cols: list of [T, cap] grads; ids2d: [T, cap] int32 row ids (invalid
    entries already clamped to 0 with zero values).  The naive form
    stacks all T*cap rows into one ``[T*cap, n_cols]`` operand — XLA
    tiles that T(8,128), padding n_cols(9|13)->128 lanes, which at
    flagship geometry (2025 tiles x 4096 cap) is a 3.96 GB HLO temp
    (9.8x expansion) and OOMs the 16 GB HBM inside the multi-step scan
    (measured: round-3 flagship fit, entropy-phase compile).  Chunking
    the scatter over tile groups bounds the live stack to ~256 MB while
    keeping the row-major scatter form (per-plane scatters are 5x
    slower, CLAUDE.md)."""
    t_n, cap = cols[0].shape
    n_cols = len(cols)
    n_chunks = max(1, -(-(t_n * cap) // _SCATTER_CHUNK_ROWS))
    if n_chunks == 1:
        rows = jnp.stack([c.reshape(-1) for c in cols], axis=1)
        return jnp.zeros((m_rows, n_cols), rows.dtype
                         ).at[ids2d.reshape(-1)].add(rows)
    tc = -(-t_n // n_chunks)
    pad = n_chunks * tc - t_n
    if pad:
        cols = [jnp.pad(c, ((0, pad), (0, 0))) for c in cols]
        ids2d = jnp.pad(ids2d, ((0, pad), (0, 0)))  # row 0, zero values

    def body(i, acc):
        t0 = i * tc
        rows = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(c, t0, tc).reshape(-1)
             for c in cols], axis=1)
        ids = jax.lax.dynamic_slice_in_dim(ids2d, t0, tc).reshape(-1)
        return acc.at[ids].add(rows)

    return jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((m_rows, n_cols), cols[0].dtype))


def _mca_bwd(settings, res, g_out):
    planes, tile_lists, counts, t_chk, a_shape, m_shape = res
    f_n, m_rows, _ = a_shape
    has_m2d = m_shape is not None
    t_n = settings.n_tiles
    grads = _mirror_call_bwd(settings, planes, counts.reshape(-1), t_chk,
                             g_out, per_view_mu=has_m2d)
    d_attrs, d_m2d = [], []
    if has_m2d:
        # per-view blocks are written at GRID row order g = (f*T+u)*2+v
        # (u-major, view innermost — consecutive steps share the plane
        # block), NOT the view-major order of the image outputs
        cap = grads[0].shape[-1]
        mux_pv = grads[0].reshape(f_n, t_n, 2, cap)
        muy_pv = grads[1].reshape(f_n, t_n, 2, cap)
    for f in range(f_n):
        sl = slice(f * t_n, (f + 1) * t_n)
        if has_m2d:
            mux_v0 = mux_pv[f, :, 0]
            mux_v1 = mux_pv[f, :, 1]
            muy_v0 = muy_pv[f, :, 0]
            muy_v1 = muy_pv[f, :, 1]
            cols = [mux_v0 + mux_v1, muy_v0 + muy_v1]
        else:
            cols = [grads[0][sl], grads[1][sl]]
        cols += [grads[i][sl] for i in range(2, 9)]
        if has_m2d:
            cols += [mux_v0, muy_v0, mux_v1, muy_v1]
        ids2d = jnp.maximum(tile_lists[f], 0)
        scat = _chunked_row_scatter(cols, ids2d, m_rows)
        d_attrs.append(scat[:, :9])
        if has_m2d:
            d_m2d.append(scat[:, 9:11])
            # the flip view's screen x is mirrored: d m2d_flip_x = -d mux
            d_m2d.append(jnp.stack([-scat[:, 11], scat[:, 12]], axis=1))
    d_attrs_out = jnp.stack(d_attrs)
    d_m2d_out = jnp.stack(d_m2d) if has_m2d else None
    return d_attrs_out, None, None, d_m2d_out


mirror_composite_attrs.defvjp(_mca_fwd, _mca_bwd)


# ---------------------------------------------------------------------------
# Bidirectional inference kernel (v4, decode path): the codec's decoded
# frame is the AVERAGE of the forward and flip views (reference:
# report_utils.py:412-447 renders both z directions and averages).  After
# un-mirroring, the average at pixel p is
#
#   out(p) = 1/2 [ sum_i a_i c_i T_i  +  sum_i a_i c_i S_i ]
#
# over the SAME per-gaussian alphas a_i(p) of the FORWARD tile list, with
# T_i the front prefix product of (1-a) and S_i the back suffix product.
# So decode needs ONE alpha evaluation per (copy, pixel) — the mirror
# kernel (v3) shares the plane DMA between the two view steps but still
# evaluates alpha twice.  The suffix sum is accumulated front-to-back by
# Horner's rule (W <- W * P_k + B_k with P_k the chunk's total
# transmittance and B_k the chunk's intra-suffix-weighted color sum), so
# there is no division and no overflow for arbitrarily deep stacks.
#
# Early exit stays optimal: a FRONT while-loop runs until the forward
# transmittance saturates (covering both views' contributions of those
# chunks), then a BACK while-loop walks from the last chunk down toward
# the front stop, covering the flip view's remaining visible chunks.
# Chunk evaluations = min(n_used, front_live + back_live) — never more
# than the fused full pass and never more than the two views combined.
# All dropped terms carry weight < T_EPS (the same bound every kernel in
# this file documents); the splice multiplies the front chunks' Horner
# sum by the back loop's final carry, which is exact when the loops meet
# and < T_EPS-weighted otherwise.
# ---------------------------------------------------------------------------

def _fwd_kernel_bidir(count_ref, *refs, settings: RasterSettings):
    planes_refs = refs[:9]
    out_ref = refs[9]
    chunk = settings.chunk
    n_chunks = settings.gaussian_cap // chunk
    p_pix = settings.tile_h * settings.tile_w

    g = pl.program_id(0)
    u = g % settings.n_tiles
    count = count_ref[g]
    xs, ys, cx, cy = _tile_coords(settings, u)
    tri_lo = _tri_excl_lower(chunk)
    tri_up = _tri_excl_upper(chunk)
    mm_tri, _, _ = _matmul_fns(settings)
    n_used = jnp.minimum((count + chunk - 1) // chunk, n_chunks)

    def load_chunk(c):
        sl = pl.ds(pl.multiple_of(c * chunk, chunk), chunk)
        scalars = _chunk_scalars(planes_refs, 0, sl, cx, cy)
        alpha, _, _, _ = _chunk_alpha(scalars, xs, ys,
                                      settings.compute_dtype)
        alpha32 = alpha.astype(jnp.float32)
        col_r, col_g, col_b = scalars[6:9]
        cols3 = jnp.concatenate(
            [col_r[None, :], col_g[None, :], col_b[None, :]], axis=0)
        return alpha32, cols3                  # [C, P], [3, C]

    # ---- front loop: fwd-view contributions + Horner back-accumulator
    def f_body(state):
        p, t_f, acc_f, acc_h = state
        alpha32, cols3 = load_chunk(p)
        l = jnp.log1p(-alpha32)
        excl_lo = jnp.exp(mm_tri(tri_lo, l))
        excl_up = jnp.exp(mm_tri(tri_up, l))
        chunk_t = jnp.exp(jnp.sum(l, axis=0, keepdims=True))
        t_before = t_f * excl_lo
        w_f = jnp.where(t_before >= T_EPS, alpha32 * t_before, 0.0)
        acc_f = acc_f + _mm(cols3, w_f)
        acc_h = acc_h * chunk_t + _mm(cols3, alpha32 * excl_up)
        return p + 1, t_f * chunk_t, acc_f, acc_h

    def f_cond(state):
        p, t_f, _, _ = state
        return jnp.logical_and(p < n_used, jnp.max(t_f) >= T_EPS)

    t0 = jnp.ones((1, p_pix), jnp.float32)
    z3 = jnp.zeros((3, p_pix), jnp.float32)
    p_stop, t_f, acc_f, acc_h = jax.lax.while_loop(
        f_cond, f_body, (0, t0, z3, z3))

    # ---- back loop: flip-view contributions of chunks past the front stop
    def b_body(state):
        q, t_b, acc_b = state
        alpha32, cols3 = load_chunk(q)
        l = jnp.log1p(-alpha32)
        excl_up = jnp.exp(mm_tri(tri_up, l))
        chunk_t = jnp.exp(jnp.sum(l, axis=0, keepdims=True))
        s_before = t_b * excl_up
        w_b = jnp.where(s_before >= T_EPS, alpha32 * s_before, 0.0)
        acc_b = acc_b + _mm(cols3, w_b)
        return q - 1, t_b * chunk_t, acc_b

    def b_cond(state):
        q, t_b, _ = state
        return jnp.logical_and(q >= p_stop, jnp.max(t_b) >= T_EPS)

    _, t_b, acc_b = jax.lax.while_loop(
        b_cond, b_body, (n_used - 1, t0, z3))

    tau = t_f * t_b                               # total transmittance
    avg = 0.5 * (acc_f + acc_b + acc_h * t_b)
    out_ref[0, 0:3, :] = avg + tau * settings.bg
    out_ref[0, 3, :] = tau[0]


def _bidir_call(settings: RasterSettings, planes, tile_counts):
    """Run the bidirectional kernel over planes.shape[0] data tiles.

    planes: 9 x [F*T, cap] FORWARD-view planes; tile_counts [F*T].
    Returns out4 [F*T, 4, P]: rows 0:3 the fwd/flip-AVERAGED image tile,
    row 3 the total per-pixel transmittance."""
    _check_chunk(settings)
    ft = planes[0].shape[0]
    cap = settings.gaussian_cap
    p = settings.tile_h * settings.tile_w
    planes3 = tuple(q[:, None, :] for q in planes)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ft,),
        in_specs=[pl.BlockSpec((1, 1, cap), lambda g, counts: (g, 0, 0),
                               memory_space=pltpu.VMEM)] * 9,
        out_specs=[pl.BlockSpec((1, 4, p), lambda g, counts: (g, 0, 0),
                                memory_space=pltpu.VMEM)],
    )
    res = pl.pallas_call(
        functools.partial(_fwd_kernel_bidir, settings=settings),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ft, 4, p), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(tile_counts, *planes3)
    return res[0]


def bidir_composite_attrs(settings: RasterSettings, attrs, tile_lists,
                          counts):
    """Fwd/flip-averaged decode composite straight from attribute rows.

    attrs [F, M, 9], tile_lists [F, T, cap], counts [F, T].  Returns
    ([F, 3, H, W] averaged images, [F, H, W] total transmittance).
    Inference-only (no VJP): the training step needs the per-view images
    for the loss, so it stays on mirror_composite_attrs."""
    planes = _planes_from_attrs(attrs, tile_lists, None)
    out4 = _bidir_call(settings, planes, counts.reshape(-1))
    return assemble_views(settings, out4)


# ---------------------------------------------------------------------------
# Single-view drop-in APIs (tests, eval paths)
# ---------------------------------------------------------------------------

def rasterize_pallas_train(xyz, color, opacity, scaling, rot, valid,
                           frame_z, x_min, y_min, scale,
                           settings: RasterSettings, flip: bool = False,
                           means2d=None) -> RasterOutput:
    """Differentiable rasterization via the custom-VJP Pallas kernels.

    Drop-in for splat.rasterize in the training step: projection/binning
    stay in XLA (differentiable / integer respectively); compositing runs
    in the fwd/bwd kernel pair with per-tile early exit; plane gradients
    scatter-add back through the gather transpose (including means2d)."""
    proj = project_gaussians(xyz, scaling, rot, valid, frame_z, x_min,
                             y_min, scale, settings, flip=flip,
                             means2d=means2d)
    opacity = jnp.where(proj.valid[:, None], opacity, 0.0)
    tile_lists, tile_counts, dropped, overflow, n_rendered = _bin_gaussians(
        proj, settings)
    planes = gather_tile_planes(proj, opacity, color, tile_lists)

    out4 = pallas_tile_composite(settings, planes, tile_counts)
    imgs, ts = assemble_views(settings, out4)
    return RasterOutput(image=imgs[0], transmittance=ts[0],
                        radii=proj.radius, num_rendered=n_rendered,
                        overflow=overflow,
                        harmful_overflow=tile_harmful_overflow(
                            settings, ts[0], dropped))


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
    tile_lists, tile_counts, dropped, overflow, n_rendered = _bin_gaussians(
        proj, settings)
    planes = gather_tile_planes(proj, opacity, color, tile_lists)

    out4 = composite_tiles_inference(settings, planes, tile_counts)
    imgs, ts = assemble_views(settings, out4)
    return RasterOutput(image=imgs[0], transmittance=ts[0],
                        radii=proj.radius, num_rendered=n_rendered,
                        overflow=overflow,
                        harmful_overflow=tile_harmful_overflow(
                            settings, ts[0], dropped))
