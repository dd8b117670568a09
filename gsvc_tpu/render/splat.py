"""TPU-native orthographic gaussian splatting.

Replaces the reference's external CUDA rasterizer
(``diff_gaussian_rasterization.cuda_ortho_gaussian_rasterizer``, driven from
ortho_gaussian_renderer/renderer.py:63-98 and preprocess.py:58-104).  The
interface was reconstructed from those call sites; the implementation is a
from-scratch TPU design:

  * static shapes end-to-end — the caller passes fixed-capacity gaussian
    arrays with a validity mask;
  * the Toast-like Sliding Window is the ``threshold`` z-test around the
    frame plane (settings.threshold, renderer.py:71);
  * compositing is reformulated *associatively*: for depth-sorted gaussians
    ``out = sum_i c_i a_i prod_{j<i}(1 - a_j)`` is computed with an
    exclusive cum-product per chunk plus a carried transmittance, so the
    color accumulation becomes a [P, C] x [C, 3] matmul (MXU) instead of a
    sequential per-pixel loop;
  * tile binning is done with one device-wide sort of (tile, depth-rank)
    keys — the TPU replacement for CUDA per-tile atomics.

The forward is plain jnp, so ``jax.grad`` provides the backward (including
gradients to means2d for densification statistics, the analog of the
reference's screenspace_points.grad).  A Pallas kernel with per-tile early
exit provides the fast path (gsvc_tpu/render/pallas_splat.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# per-pixel transmittance saturation: once T drops below this, later
# gaussians no longer contribute (standard 3DGS early-stop semantics)
T_EPS = 1e-4
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


@dataclasses.dataclass(frozen=True)
class RasterSettings:
    """Static rasterization configuration (one compilation per value set).

    Mirrors GaussianRasterizationSettings (renderer.py:63-83): image size,
    the NDC->pixel mapping (x_min, y_min, scale), the TSW z half-width
    ``threshold``, and the low-pass kernel added to the 2D covariance
    (ModelParams.kernel_size).  ``tile_h/tile_w/gaussian_cap/chunk`` are
    TPU execution knobs.
    """

    image_height: int
    image_width: int
    threshold: float
    kernel_size: float = 0.3
    tile_h: int = 16
    tile_w: int = 128
    gaussian_cap: int = 1024     # max binned gaussians per tile
    chunk: int = 64              # gaussians per compositing step
    tiles_per_gaussian: int = 64 # max tile copies emitted per gaussian
    # Clamp the activated 3D scale at projection so every footprint bbox
    # fits the tiles_per_gaussian copy budget.  The reference rasterizer
    # emits unbounded per-tile copy lists, so giant transient gaussians
    # (random-init explosions before scaling_reg bites) merely render
    # slowly; our fixed budget would instead TRUNCATE their coverage
    # row-major (spatially biased drops -> corrupted images/gradients ->
    # runaway scale growth, observed live at the 100k-anchor 1080p
    # operating point).  With the clamp, coverage clipping is impossible
    # by construction; converged scales sit far below the bound (~0.05
    # NDC at the flagship geometry) and scaling_reg still sees the raw
    # value, so over-bound gaussians keep their shrink gradient.
    clamp_to_coverage: bool = True
    # Compacted copy-stream binning: sort a budget of ``factor * window``
    # copy keys derived from the EXCLUSIVE-CUMSUM positions of each
    # gaussian's actual tile coverage, instead of padding every gaussian
    # to ``tiles_per_gaussian`` copies.  Real coverage averages a few
    # tiles, so the device-wide binning sort shrinks ~t_max/factor x
    # (e.g. 8x at the flagship's grown t_max=128).  0 = legacy padded
    # stream.  Copies beyond the budget (deepest-z gaussians, whole-
    # gaussian drops) are counted in ``overflow`` and the fitter grows
    # the factor like the other capacities.
    copy_budget_factor: int = 0
    bg: float = 0.0

    @property
    def max_radius_px(self) -> float:
        """Largest pixel radius whose tile bbox fits tiles_per_gaussian:
        (2R/tw + 1)(2R/th + 1) <= t_max, solved for R."""
        a = 2.0 / self.tile_w
        b = 2.0 / self.tile_h
        s = a + b
        t_max = float(self.tiles_per_gaussian)
        return (-s + np.sqrt(s * s + 4 * a * b * (t_max - 1))) / (2 * a * b)
    # "bfloat16" runs the Pallas alpha evaluation in bf16 (2x VPU) with
    # fp32 transmittance/accumulation; ~0.4% alpha error — training only
    compute_dtype: str = "float32"
    # Input precision of the Pallas kernels' MXU matmuls (the dominant
    # per-chunk cost: the triangular log-transmittance cumsums fwd+bwd
    # and the backward's moment/suffix/color matmuls).  The MXU is
    # bf16-native — f32 matmuls are emulated at a fraction of peak — so:
    #   "float32"  exact (legacy default);
    #   "bf16x2"   transmittance cumsum via an error-compensated two-pass
    #              bf16 split (|err| ~2^-18 per log1p term, absorbed by
    #              exp; image-exactness preserved to ~1e-4) + straight
    #              bf16 inputs for the backward's gradient matmuls
    #              (~0.4% relative, validated by the grad-cosine test);
    #   "bfloat16" straight bf16 everywhere (fastest; T error ~0.4%).
    # Accumulation is always f32 (preferred_element_type).
    matmul_dtype: str = "float32"

    @property
    def n_tiles_x(self) -> int:
        return -(-self.image_width // self.tile_w)

    @property
    def n_tiles_y(self) -> int:
        return -(-self.image_height // self.tile_h)

    @property
    def n_tiles(self) -> int:
        return self.n_tiles_x * self.n_tiles_y


class Projected(NamedTuple):
    """Screen-space gaussians after orthographic projection."""

    mean2d: jnp.ndarray    # [M, 2] pixel centers
    conic: jnp.ndarray     # [M, 3] inverse 2D covariance (a, b, c)
    depth: jnp.ndarray     # [M] compositing depth (ascending = front first)
    radius: jnp.ndarray    # [M] pixel radius (0 => culled)
    valid: jnp.ndarray     # [M] bool


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Normalized quaternion [.., 4] (w, x, y, z) -> rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack([
        jnp.stack([r00, r01, r02], -1),
        jnp.stack([r10, r11, r12], -1),
        jnp.stack([r20, r21, r22], -1),
    ], axis=-2)


def cov2d_from_scaling_rotation(scaling, rot, flip_x: bool):
    """Top-left 2x2 block of R diag(s^2) R^T, as (xx, xy, yy).

    Orthographic projection along z needs no Jacobian: the screen
    covariance is just the xy block of the world covariance.  The reversed
    ("_s") view mirrors x, which flips the sign of the xy term only.
    """
    r = quat_to_rotmat(rot)                     # [M, 3, 3]
    m = r * scaling[..., None, :]               # R @ diag(s)
    cov = m @ jnp.swapaxes(m, -1, -2)           # [M, 3, 3]
    sxy = -cov[..., 0, 1] if flip_x else cov[..., 0, 1]
    return cov[..., 0, 0], sxy, cov[..., 1, 1]


def project_gaussians(
    xyz, scaling, rot, valid,
    frame_z: float, x_min: float, y_min: float, scale: float,
    settings: RasterSettings, flip: bool = False,
    means2d: Optional[jnp.ndarray] = None,
) -> Projected:
    """Orthographic projection + TSW cull.

    ``flip`` selects the reversed view direction (frame.view_matrix_s):
    screen x is mirrored and the depth order reverses.  ``means2d`` is an
    optional zero [M, 2] tensor added to the pixel centers so the caller
    can read d(loss)/d(screen position) — the densification statistic
    (reference: screenspace_points, renderer.py:37-42).
    """
    if settings.clamp_to_coverage:
        # sigma bound: 3 sqrt(sigma^2 scale^2 + kernel) <= max_radius_px
        r = settings.max_radius_px
        sig_max = float(np.sqrt(max((r / 3.0) ** 2 - settings.kernel_size,
                                    1e-6))) / scale
        scaling = jnp.minimum(scaling, sig_max)
    x = -xyz[:, 0] if flip else xyz[:, 0]
    y = xyz[:, 1]
    z = xyz[:, 2]

    px = (x - x_min) * scale - 0.5
    py = (y - y_min) * scale - 0.5
    mean2d = jnp.stack([px, py], axis=-1)
    if means2d is not None:
        mean2d = mean2d + means2d

    # TSW: only gaussians within +-threshold of the frame plane render
    dz = z - frame_z
    in_window = jnp.abs(dz) <= settings.threshold
    # compositing order: forward view looks toward -z => larger z is nearer
    depth = dz if flip else -dz

    sxx, sxy, syy = cov2d_from_scaling_rotation(scaling, rot, flip)
    s2 = scale * scale
    a = sxx * s2 + settings.kernel_size
    b = sxy * s2
    c = syy * s2 + settings.kernel_size

    det = a * c - b * b
    det = jnp.maximum(det, 1e-12)
    conic = jnp.stack([c / det, -b / det, a / det], axis=-1)

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))

    on_screen = (
        (px + radius >= 0) & (px - radius <= settings.image_width - 1)
        & (py + radius >= 0) & (py - radius <= settings.image_height - 1)
    )
    ok = valid & in_window & on_screen
    radius = jnp.where(ok, radius, 0.0)
    return Projected(mean2d=mean2d, conic=conic, depth=depth,
                     radius=radius, valid=ok)


# ---------------------------------------------------------------------------
# Tile binning
# ---------------------------------------------------------------------------

def _sorted_copy_stream(proj: Projected, settings: RasterSettings):
    """Device-wide sorted copy stream shared by both binning layouts.

    One stable sort of (tile_id, depth_rank) keys replaces the CUDA
    duplicate-key radix sort of 3DGS.  Each gaussian emits up to
    ``tiles_per_gaussian`` copies covering its bbox in tile units; very
    large gaussians are clamped to that coverage (scaling_reg and the
    prune-time scale clamp keep footprints small in practice).

    Returns (gauss_sorted [S] int32 gaussian id per sorted copy, bounds
    [n_tiles+1] int32 per-tile stream offsets, coverage_clipped,
    budget_dropped, src_len).
    """
    m = proj.mean2d.shape[0]
    t_max = settings.tiles_per_gaussian

    if m >= 4096:
        # large scenes: QUANTIZED depth rank — the TSW bounds depth to
        # [-threshold, threshold], so an 18-bit quantization (quantum
        # ~4e-7 NDC at threshold 0.05) keeps strict compositing order
        # except for exactly-coincident depths, and drops the device-wide
        # argsort + rank scatter per render
        rank_bits = 18
        thr = settings.threshold
        rank = jnp.clip(
            ((proj.depth + thr) * ((2 ** rank_bits - 1) / (2 * thr))),
            0, 2 ** rank_bits - 1).astype(jnp.int32)
    else:
        # small scenes (tests/oracles): exact rank via argsort
        depth_key = jnp.where(proj.valid, proj.depth, jnp.inf)
        order = jnp.argsort(depth_key)       # front-most first
        rank = jnp.zeros((m,), jnp.int32).at[order].set(
            jnp.arange(m, dtype=jnp.int32))
        rank_bits = max(1, (m - 1).bit_length())

    x, y = proj.mean2d[:, 0], proj.mean2d[:, 1]
    r = proj.radius
    tx0 = jnp.clip(jnp.floor((x - r) / settings.tile_w), 0,
                   settings.n_tiles_x - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((x + r) / settings.tile_w), 0,
                   settings.n_tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((y - r) / settings.tile_h), 0,
                   settings.n_tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((y + r) / settings.tile_h), 0,
                   settings.n_tiles_y - 1).astype(jnp.int32)

    wx = tx1 - tx0 + 1
    wy = ty1 - ty0 + 1
    n_cover = wx * wy
    # diagnosed, not silent: copies beyond tiles_per_gaussian are dropped
    coverage_clipped = jnp.sum(
        jnp.where(proj.valid, jnp.maximum(n_cover - t_max, 0), 0))

    fused_ok = (settings.n_tiles + 1) << rank_bits <= 2 ** 31
    factor = settings.copy_budget_factor
    budget_dropped = jnp.int32(0)

    if factor and factor < t_max and fused_ok:
        # Compacted copy stream: copy p of the stream maps to gaussian
        # gi = searchsorted(cumsum(coverage), p, 'right') and local slot
        # j = p - exclusive_cumsum[gi].  Same (gaussian, slot) order as
        # the padded stream, so with a stable sort the resulting tile
        # lists are IDENTICAL whenever nothing exceeds the budget
        # (tests/test_render.py parity).  Gather-only construction: one
        # row gather of the 6 per-gaussian planes at gi — no scatter.
        n_cover_c = jnp.where(proj.valid, jnp.minimum(n_cover, t_max), 0)
        cum = jnp.cumsum(n_cover_c.astype(jnp.int32))
        base = cum - n_cover_c
        total = cum[-1]
        budget = m * factor
        p = jnp.arange(budget, dtype=jnp.int32)
        gi = jnp.clip(jnp.searchsorted(cum, p, side="right"),
                      0, m - 1).astype(jnp.int32)
        attrs = jnp.stack([tx0, ty0, wx, n_cover_c, base, rank],
                          axis=1)                           # [m, 6] rows
        rows = jnp.take(attrs, gi, axis=0)                  # [budget, 6]
        atx0, aty0, awx, acov, abase, arank = (
            rows[:, c] for c in range(6))
        j_loc = p - abase
        live = (j_loc >= 0) & (j_loc < acov)
        dy = j_loc // jnp.maximum(awx, 1)
        dx = j_loc - dy * jnp.maximum(awx, 1)
        tile_id_c = (aty0 + dy) * settings.n_tiles_x + (atx0 + dx)
        tile_key = jnp.where(live, tile_id_c, jnp.int32(settings.n_tiles))
        fused = (tile_key << rank_bits) | jnp.where(live, arank, 0)
        fused_sorted, gauss_sorted = jax.lax.sort(
            (fused, gi), num_keys=1)
        bounds = jnp.searchsorted(
            fused_sorted, jnp.arange(settings.n_tiles + 1,
                                     dtype=jnp.int32) << rank_bits)
        budget_dropped = jnp.maximum(total - budget, 0)
        src_len = budget
    else:
        slot = jnp.arange(t_max, dtype=jnp.int32)[None, :]    # [1, T]
        sdy = slot // wx[:, None]
        sdx = slot - sdy * wx[:, None]
        copy_valid = (slot < n_cover[:, None]) & (sdy < wy[:, None]) \
            & proj.valid[:, None]
        tile_id = (ty0[:, None] + sdy) * settings.n_tiles_x \
            + (tx0[:, None] + sdx)
        tile_key = jnp.where(copy_valid, tile_id,
                             jnp.int32(settings.n_tiles)).reshape(-1)
        gauss_id = jnp.broadcast_to(
            jnp.arange(m, dtype=jnp.int32)[:, None], (m, t_max)).reshape(-1)

        if fused_ok:
            # fused (tile << rank_bits | depth-rank) int32 key: ONE
            # single-key sort instead of a two-key lexicographic sort
            # (~2x faster; the binning sort is the dominant
            # non-compositing cost per render)
            rank_b = jnp.broadcast_to(rank[:, None], (m, t_max)).reshape(-1)
            fused = (tile_key << rank_bits) | rank_b
            fused_sorted, gauss_sorted = jax.lax.sort(
                (fused, gauss_id), num_keys=1)
            bounds = jnp.searchsorted(
                fused_sorted, jnp.arange(settings.n_tiles + 1,
                                         dtype=jnp.int32) << rank_bits)
        else:
            rank_key = jnp.broadcast_to(rank[:, None], (m, t_max)).reshape(-1)
            tile_sorted, _, gauss_sorted = jax.lax.sort(
                (tile_key, rank_key, gauss_id), num_keys=2)
            bounds = jnp.searchsorted(
                tile_sorted, jnp.arange(settings.n_tiles + 1,
                                        dtype=jnp.int32))
        src_len = m * t_max
    return gauss_sorted, bounds, coverage_clipped, budget_dropped, src_len


def _bin_gaussians(proj: Projected, settings: RasterSettings):
    """Per-tile depth-ordered gaussian index lists ([n_tiles, cap] padded
    layout — the v2/v3 kernels' input; see bin_gaussians_stream for the
    stream-resident layout whose cost scales with actual copies).

    Returns (tile_lists [n_tiles, cap] int32 gaussian ids, tile_counts
    [n_tiles], dropped, overflow, total_copies).
    """
    (gauss_sorted, bounds, coverage_clipped, budget_dropped,
     src_len) = _sorted_copy_stream(proj, settings)
    tile_start = bounds[:-1]
    tile_count = bounds[1:] - bounds[:-1]

    cap = settings.gaussian_cap
    j = jnp.arange(cap, dtype=jnp.int32)[None, :]
    gather_idx = tile_start[:, None] + j                    # [n_tiles, cap]
    in_range = j < tile_count[:, None]
    gather_idx = jnp.clip(gather_idx, 0, src_len - 1)
    tile_lists = jnp.where(in_range, gauss_sorted[gather_idx], -1)

    dropped = jnp.maximum(tile_count - cap, 0)
    overflow = dropped.sum() + coverage_clipped + budget_dropped
    total_copies = jnp.minimum(tile_count, cap).sum()
    return (tile_lists, jnp.minimum(tile_count, cap), dropped, overflow,
            total_copies)


class StreamBins(NamedTuple):
    """Aligned copy-stream binning (integer-only; one frame, fwd view).

    The sorted copy stream is re-laid so every tile's span starts at a
    chunk boundary: per-tile padding rounds counts up to the chunk
    quantum, so the compositing kernel's grid can walk 128-wide stream
    blocks with plain BlockSpec index maps (no [n_tiles, cap] padding —
    memory and machinery scale with ACTUAL binned copies, not
    tiles x cap).  Dead slots/blocks carry id/tile -1.
    """

    ids: jnp.ndarray        # [S_MAX] int32 gaussian id per slot, -1 dead
    blk_tile: jnp.ndarray   # [B_MAX] int32 owning tile per block, -1 dead
    blk_cc: jnp.ndarray     # [B_MAX] int32 chunk index within the tile
    nblk: jnp.ndarray       # [n_tiles] int32 blocks per tile (>= 1)
    counts: jnp.ndarray     # [n_tiles] int32 composited copies (<= cap)
    dropped: jnp.ndarray    # [n_tiles] copies dropped at gaussian_cap
    overflow: jnp.ndarray   # scalar diagnostic (cap + coverage + budget)
    n_rendered: jnp.ndarray  # scalar composited-copy count


def stream_blocks_max(settings: RasterSettings, m: int) -> int:
    """Static per-frame block bound for the aligned stream: the sorted
    stream can hold at most min(m * copies-per-gaussian, tiles * cap)
    composited entries, plus <1 alignment block per tile (and every tile
    owns at least one block so empty tiles still render background)."""
    per_g = settings.tiles_per_gaussian
    if settings.copy_budget_factor:
        per_g = min(per_g, settings.copy_budget_factor)
    s_bound = min(m * per_g, settings.n_tiles * settings.gaussian_cap)
    return s_bound // settings.chunk + settings.n_tiles


def bin_gaussians_stream(proj: Projected,
                         settings: RasterSettings) -> StreamBins:
    """Chunk-aligned stream binning for the stream-resident kernels."""
    (gauss_sorted, bounds, coverage_clipped, budget_dropped,
     src_len) = _sorted_copy_stream(proj, settings)
    t_n = settings.n_tiles
    chunk = settings.chunk
    cap = settings.gaussian_cap
    m = proj.mean2d.shape[0]

    tile_start = bounds[:-1]
    tile_count = bounds[1:] - bounds[:-1]
    counts = jnp.minimum(tile_count, cap)
    dropped = jnp.maximum(tile_count - cap, 0)
    overflow = dropped.sum() + coverage_clipped + budget_dropped

    nblk = jnp.maximum(-(-counts // chunk), 1)
    blk_end = jnp.cumsum(nblk)
    blk_start = blk_end - nblk

    b_max = stream_blocks_max(settings, m)
    b = jnp.arange(b_max, dtype=jnp.int32)
    d = jnp.searchsorted(blk_end, b, side="right").astype(jnp.int32)
    live_b = b < blk_end[-1]
    d_c = jnp.minimum(d, t_n - 1)
    blk_tile = jnp.where(live_b, d_c, -1)
    blk_cc = jnp.where(live_b, b - blk_start[d_c], 0)

    q = jnp.arange(b_max * chunk, dtype=jnp.int32)
    dt = jnp.repeat(blk_tile, chunk)
    dt_c = jnp.maximum(dt, 0)
    j = q - jnp.repeat(blk_start[d_c], chunk) * chunk
    valid = (dt >= 0) & (j < counts[dt_c])
    src = jnp.clip(tile_start[dt_c] + j, 0, src_len - 1)
    ids = jnp.where(valid, gauss_sorted[src], -1)

    return StreamBins(ids=ids, blk_tile=blk_tile, blk_cc=blk_cc,
                      nblk=nblk, counts=counts, dropped=dropped,
                      overflow=overflow, n_rendered=counts.sum())


# Post-composite transmittance above which a dropped (deepest) copy could
# still have contributed a visible (>= 1/255) pixel change.
HARMFUL_T_EPS = 1.0 / 255.0


def tile_harmful_overflow(settings: "RasterSettings", transmittance,
                          dropped):
    """Dropped copies at tiles whose compositing had NOT saturated.

    ``overflow`` alone overstates the damage: at mega-pileup tiles the
    per-pixel transmittance hits ~e^-16 long before the capacity cap and
    the dropped tail is invisible.  But a tile that overflowed while its
    final T is still >= 1/255 somewhere genuinely lost content
    (empirically up to +0.6 dB per tile at cap 4096 on the flagship —
    scripts/validate_overflow.py cap sweep).  Capacity growth should
    react to THIS number; raw overflow is telemetry.

    transmittance: [H, W] final per-pixel T.  dropped: [n_tiles].
    Returns a scalar count of harmful dropped copies."""
    th, tw = settings.tile_h, settings.tile_w
    h_pad = settings.n_tiles_y * th - settings.image_height
    w_pad = settings.n_tiles_x * tw - settings.image_width
    t = transmittance
    if h_pad or w_pad:
        # padding pixels don't exist: T=0 there (saturated = harmless)
        t = jnp.pad(t, ((0, h_pad), (0, w_pad)))
    t_tile = t.reshape(settings.n_tiles_y, th,
                       settings.n_tiles_x, tw).max(axis=(1, 3))
    unsat = (t_tile.reshape(-1) >= HARMFUL_T_EPS)
    return jnp.sum(jnp.where(unsat, dropped, 0))


# ---------------------------------------------------------------------------
# Compositing
# ---------------------------------------------------------------------------

def _composite_tile(planes, count, tile_y, tile_x,
                    settings: RasterSettings):
    """Alpha-composite one tile from pre-gathered attribute planes.

    planes: 9-tuple of [cap] rows (mu_x, mu_y, con_a, con_b, con_c,
    opacity, col_r, col_g, col_b), depth-ordered, zero-padded.  The
    per-tile gather happens ONCE in the caller as a single fused [T, cap]
    gather — per-chunk scattered gathers inside the scan measured ~5x
    slower on TPU.
    """
    th, tw = settings.tile_h, settings.tile_w
    py0 = tile_y * th
    px0 = tile_x * tw
    ys = py0 + jnp.arange(th, dtype=jnp.float32)[:, None]   # [th, 1]
    xs = px0 + jnp.arange(tw, dtype=jnp.float32)[None, :]   # [1, tw]
    # keep pixel coords as separate [P] vectors: trailing size-2/3 dims
    # tile to (*, 128) lanes on TPU — a 64x memory/bandwidth blowup
    pix_x = jnp.broadcast_to(xs, (th, tw)).reshape(-1)      # [P]
    pix_y = jnp.broadcast_to(ys, (th, tw)).reshape(-1)      # [P]

    cap, chunk = settings.gaussian_cap, settings.chunk
    n_chunks = cap // chunk
    p = th * tw

    chunked = tuple(plane.reshape(n_chunks, chunk) for plane in planes)
    pos_chunks = jnp.arange(cap, dtype=jnp.int32).reshape(n_chunks, chunk)

    def step(carry, inp):
        t_carry, acc_r, acc_g, acc_b = carry
        (mu_x, mu_y, con_a, con_b, con_c, op, col_r, col_g, col_b), pos = inp
        g_valid = pos < count

        d0 = pix_x[None, :] - mu_x[:, None]              # [C, P]
        d1 = pix_y[None, :] - mu_y[:, None]              # [C, P]
        q = (con_a[:, None] * d0 * d0
             + 2.0 * con_b[:, None] * d0 * d1
             + con_c[:, None] * d1 * d1)                 # [C, P]
        alpha = op[:, None] * jnp.exp(-0.5 * q)
        alpha = jnp.minimum(alpha, ALPHA_MAX)
        alpha = jnp.where(g_valid[:, None] & (alpha >= ALPHA_MIN), alpha, 0.0)

        # direct cumulative product of (1 - alpha) — log/exp round trips
        # cost 2 extra transcendentals per element on the VPU
        one_m = 1.0 - alpha                              # [C, P] >= 0.01
        incl = jax.lax.associative_scan(jnp.multiply, one_m, axis=0)
        excl = jnp.concatenate(
            [jnp.ones((1,) + incl.shape[1:], incl.dtype), incl[:-1]], axis=0)
        t_before = t_carry[None, :] * excl               # [C, P]
        live = t_before >= T_EPS
        w = jnp.where(live, alpha * t_before, 0.0)

        acc_r = acc_r + jnp.sum(w * col_r[:, None], axis=0)
        acc_g = acc_g + jnp.sum(w * col_g[:, None], axis=0)
        acc_b = acc_b + jnp.sum(w * col_b[:, None], axis=0)
        t_carry = t_carry * jnp.prod(jnp.where(live, one_m, 1.0), axis=0)
        return (t_carry, acc_r, acc_g, acc_b), None

    t0 = jnp.ones((p,), jnp.float32)
    z = jnp.zeros((p,), jnp.float32)
    # checkpoint per scan step: backward keeps only the [P]-sized carries
    # per chunk and recomputes the [chunk, P] alpha math — without this the
    # scan transpose materializes per-chunk-per-tile intermediates
    # (n_tiles * n_chunks * P floats each, tens of GB at 1080p)
    (t_final, acc_r, acc_g, acc_b), _ = jax.lax.scan(
        jax.checkpoint(step), (t0, z, z, z), (chunked, pos_chunks))

    chans = jnp.stack([acc_r, acc_g, acc_b], axis=0) \
        + t_final[None, :] * settings.bg                 # [3, P]
    return chans.reshape(3, th, tw), t_final.reshape(th, tw)


def attr_rows_from_proj(proj: Projected, opacity, color):
    """Pack the nine per-gaussian splat attributes as an [M, 9] row
    matrix: (mu_x, mu_y, con_a, con_b, con_c, opacity, r, g, b).

    The tile-plane gather then fetches 9-float ROWS with one index array
    — measured ~8x faster than nine scalar-plane gathers on v5e (and its
    transpose is one batched scatter-add instead of nine)."""
    return jnp.stack([
        proj.mean2d[:, 0], proj.mean2d[:, 1],
        proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
        opacity[:, 0], color[:, 0], color[:, 1], color[:, 2],
    ], axis=1)


def gather_tile_planes_rows(attr_rows, tile_lists):
    """[M, 9] attribute rows + [T, cap] id lists -> 9x[T, cap] planes.

    Padding ids (-1) clamp to row 0 but get opacity forced to 0, which
    suffices: zero opacity means zero alpha means no contribution and no
    gradients (kernel validity is implicit in opacity)."""
    safe = jnp.maximum(tile_lists, 0)
    rows = jnp.take(attr_rows, safe.reshape(-1), axis=0)
    rows = rows.reshape(tile_lists.shape + (9,))
    planes = tuple(rows[..., i] for i in range(9))
    op = jnp.where(tile_lists >= 0, planes[5], 0.0)
    return planes[:5] + (op,) + planes[6:]


def gather_tile_planes(proj: Projected, opacity, color, tile_lists):
    """Row-gather convenience wrapper (see attr_rows_from_proj)."""
    return gather_tile_planes_rows(
        attr_rows_from_proj(proj, opacity, color), tile_lists)


def composite_tiles_jnp(settings: RasterSettings, planes, tile_counts):
    """Differentiable XLA compositing over a tile grid.

    planes: 9-tuple of [T', cap] (T' may be V*n_tiles for V concatenated
    views); returns [T', 4, P] (premultiplied rgb + transmittance), the
    same packing as the Pallas kernels."""
    n_grid = planes[0].shape[0]
    tiles_y = jnp.arange(settings.n_tiles_y, dtype=jnp.int32)
    tiles_x = jnp.arange(settings.n_tiles_x, dtype=jnp.int32)
    ty_grid = jnp.repeat(tiles_y, settings.n_tiles_x)
    tx_grid = jnp.tile(tiles_x, settings.n_tiles_y)
    v = n_grid // settings.n_tiles
    ty_grid = jnp.tile(ty_grid, v)
    tx_grid = jnp.tile(tx_grid, v)

    tile_imgs, tile_ts = jax.vmap(
        lambda pln, cnt, ty, tx: _composite_tile(pln, cnt, ty, tx, settings)
    )(planes, tile_counts, ty_grid, tx_grid)

    p = settings.tile_h * settings.tile_w
    return jnp.concatenate(
        [tile_imgs.reshape(n_grid, 3, p), tile_ts.reshape(n_grid, 1, p)],
        axis=1)


def assemble_views(settings: RasterSettings, out4):
    """[V*T, 4, P] -> ([V, 3, H, W] images, [V, H, W] transmittances)."""
    th, tw = settings.tile_h, settings.tile_w
    nty, ntx = settings.n_tiles_y, settings.n_tiles_x
    v = out4.shape[0] // settings.n_tiles
    full = out4.reshape(v, nty, ntx, 4, th, tw)
    full = full.transpose(0, 3, 1, 4, 2, 5).reshape(
        v, 4, nty * th, ntx * tw)
    full = full[:, :, :settings.image_height, :settings.image_width]
    return full[:, :3], full[:, 3]


class RasterOutput(NamedTuple):
    image: jnp.ndarray        # [3, H, W] channel-FIRST (lane dim = W; an
                              # [H, W, 3] layout pads lanes 42x on TPU)
    transmittance: jnp.ndarray  # [H, W] final per-pixel transmittance —
                              # enables z-slab cross-device compositing
    radii: jnp.ndarray        # [M] pixel radii (0 = culled)
    num_rendered: jnp.ndarray # scalar: total tile-gaussian pairs composited
    overflow: jnp.ndarray     # scalar: pairs dropped by per-tile capacity
    harmful_overflow: jnp.ndarray  # scalar: dropped pairs at UNSATURATED
                              # tiles (final T >= 1/255) — visible loss


@functools.partial(jax.jit, static_argnames=("settings", "flip"))
def rasterize(xyz, color, opacity, scaling, rot, valid,
              frame_z, x_min, y_min, scale,
              settings: RasterSettings, flip: bool = False,
              means2d: Optional[jnp.ndarray] = None) -> RasterOutput:
    """Render fixed-capacity gaussians to an image.

    Args mirror GaussianRasterizer.__call__ (renderer.py:90-98): means3D,
    colors_precomp, opacities, scales, rotations; ``valid`` replaces the
    dynamic-length gather of the reference (invalid rows simply cannot
    contribute).  bg/threshold/tiling live in ``settings``.
    """
    proj = project_gaussians(xyz, scaling, rot, valid, frame_z, x_min, y_min,
                             scale, settings, flip=flip, means2d=means2d)
    opacity = jnp.where(proj.valid[:, None], opacity, 0.0)

    tile_lists, tile_counts, dropped, overflow, n_rendered = _bin_gaussians(
        proj, settings)
    planes = gather_tile_planes(proj, opacity, color, tile_lists)
    out4 = composite_tiles_jnp(settings, planes, tile_counts)
    imgs, ts = assemble_views(settings, out4)
    return RasterOutput(image=imgs[0], transmittance=ts[0],
                        radii=proj.radius,
                        num_rendered=n_rendered, overflow=overflow,
                        harmful_overflow=tile_harmful_overflow(
                            settings, ts[0], dropped))


# ---------------------------------------------------------------------------
# Dense reference (oracle for tests): quadratic cost, tiny images only.
# ---------------------------------------------------------------------------

def rasterize_dense_reference(xyz, color, opacity, scaling, rot, valid,
                              frame_z, x_min, y_min, scale,
                              settings: RasterSettings, flip: bool = False):
    """O(M * H * W) reference compositor used by the test suite."""
    proj = project_gaussians(xyz, scaling, rot, valid, frame_z, x_min, y_min,
                             scale, settings, flip=flip)
    m = xyz.shape[0]
    order = np.argsort(np.where(np.asarray(proj.valid), proj.depth, np.inf),
                       kind="stable")
    h, w = settings.image_height, settings.image_width
    img = np.zeros((h, w, 3), np.float32)  # HWC internally; [3,H,W] out
    t = np.ones((h, w), np.float32)
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    mean2d = np.asarray(proj.mean2d)
    conic = np.asarray(proj.conic)
    op = np.asarray(opacity)[:, 0]
    col = np.asarray(color)
    valid_np = np.asarray(proj.valid)
    tile_x = (xs // settings.tile_w).astype(np.int32)
    tile_y = (ys // settings.tile_h).astype(np.int32)
    radius = np.asarray(proj.radius)
    for g in order:
        if not valid_np[g]:
            continue
        dx = xs - mean2d[g, 0]
        dy = ys - mean2d[g, 1]
        q = conic[g, 0] * dx ** 2 + 2 * conic[g, 1] * dx * dy \
            + conic[g, 2] * dy ** 2
        alpha = np.minimum(op[g] * np.exp(-0.5 * q), ALPHA_MAX)
        alpha[alpha < ALPHA_MIN] = 0.0
        # same tile-granular 3-sigma culling as the tiled path: a gaussian
        # only touches pixels of tiles overlapped by its radius bbox
        r = radius[g]
        tx0 = np.clip(np.floor((mean2d[g, 0] - r) / settings.tile_w), 0,
                      settings.n_tiles_x - 1)
        tx1 = np.clip(np.floor((mean2d[g, 0] + r) / settings.tile_w), 0,
                      settings.n_tiles_x - 1)
        ty0 = np.clip(np.floor((mean2d[g, 1] - r) / settings.tile_h), 0,
                      settings.n_tiles_y - 1)
        ty1 = np.clip(np.floor((mean2d[g, 1] + r) / settings.tile_h), 0,
                      settings.n_tiles_y - 1)
        in_tiles = ((tile_x >= tx0) & (tile_x <= tx1)
                    & (tile_y >= ty0) & (tile_y <= ty1))
        alpha = np.where(in_tiles, alpha, 0.0)
        contrib = (t >= T_EPS) * alpha
        img += (contrib * t)[..., None] * col[g]
        t = t * np.where(t >= T_EPS, 1.0 - alpha, 1.0)
    img += t[..., None] * settings.bg
    return img.transpose(2, 0, 1)  # [3, H, W] like the tiled path
