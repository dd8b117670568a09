"""Batched frame-pair rendering — the training-step fast path.

One train step renders 4 views: two frames x two view directions
(reference: pipeline/train.py:325-581 issues 4 separate CUDA render
calls).  This module restructures that for the TPU:

  * **one neural-gaussian generation per frame** (2, not 4): the forward
    and x-flipped views of a frame see the same gaussians — only the
    projection differs.  In ENTROPY phases this also halves the hash-grid
    + entropy-net work (and shares the quantization noise between the two
    views of a frame; same expectation, decode-consistent).
  * **one projection + binning per frame**: the flip view's tile lists
    are the exact mirror of the forward view's.  With
    ``image_width == n_tiles_x * tile_w`` the screen mirror
    ``px' = (W-1) - px`` maps tiles to tiles, so the flip planes are a
    [T, cap] permutation (mirror tiles, reverse depth order within the
    per-tile count) plus ``mux' = (W-1) - mux`` and ``conic_b' = -b`` —
    no second device-wide sort.  (When a tile overflows ``gaussian_cap``
    the mirrored list keeps the forward view's front-most subset; the
    overflow counter flags that regime.)
  * **one compositing launch for all 4 views**: planes are concatenated
    to [4T, cap] and run through a single Pallas (or jnp) grid.

Everything is differentiable: the mirror transform is gathers/negation,
so gradients flow back through the single projection; per-view means2d
tensors are injected at plane level for densification statistics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsvc_tpu.models.gaussians import (
    GaussianConfig, GeneratedGaussians, GenerateMode, ModelState,
    generate_neural_gaussians, window_for_frame,
)
from gsvc_tpu.render.pipeline import RenderResults
from gsvc_tpu.render.splat import (
    RasterSettings, _bin_gaussians, assemble_views, composite_tiles_jnp,
    project_gaussians,
)


def _mirror_tile_perm(settings: RasterSettings) -> np.ndarray:
    """Static [n_tiles] permutation mapping tile t to its x-mirror."""
    ty = np.arange(settings.n_tiles) // settings.n_tiles_x
    tx = np.arange(settings.n_tiles) % settings.n_tiles_x
    return (ty * settings.n_tiles_x
            + (settings.n_tiles_x - 1 - tx)).astype(np.int32)


def can_mirror(settings: RasterSettings) -> bool:
    """The plane-level mirror is exact only when the tiled span equals the
    image width (px' = (W-1) - px maps tile columns onto tile columns)."""
    return settings.image_width == settings.n_tiles_x * settings.tile_w


def flip_tile_lists(tile_lists, tile_counts, settings: RasterSettings):
    """Integer-only derivation of the flip view's [T, cap] id lists:
    mirror the tile axis and reverse each tile's depth order within its
    count (the flip view composites the same gaussians back-to-front).
    No gradients flow here — all value-level flip work happens on the
    per-gaussian attribute rows instead (flip_attr_rows)."""
    perm = jnp.asarray(_mirror_tile_perm(settings))
    counts_f = tile_counts[perm]
    lists_m = tile_lists[perm]
    cap = settings.gaussian_cap
    j = jnp.arange(cap, dtype=jnp.int32)[None, :]
    rev = jnp.where(j < counts_f[:, None], counts_f[:, None] - 1 - j, j)
    return jnp.take_along_axis(lists_m, rev, axis=1), counts_f


def flip_attr_rows(attr_fwd, settings: RasterSettings,
                   means2d_flip: Optional[jnp.ndarray] = None):
    """Per-GAUSSIAN attribute rows of the x-flipped view from the forward
    ones: mirror the x mean, negate the conic cross term; everything else
    is mirror-invariant.  ``means2d_flip`` ([M, 2], normally zeros) is
    added in the flip view's own screen coordinates so its cotangent
    carries that view's densification screen-gradients."""
    w_span = settings.n_tiles_x * settings.tile_w
    mux = (w_span - 1) - attr_fwd[:, 0]
    muy = attr_fwd[:, 1]
    if means2d_flip is not None:
        mux = mux + means2d_flip[:, 0]
        muy = muy + means2d_flip[:, 1]
    return jnp.concatenate([
        mux[:, None], muy[:, None], attr_fwd[:, 2:3], -attr_fwd[:, 3:4],
        attr_fwd[:, 4:5], attr_fwd[:, 5:9]], axis=1)


def _frame_views(gss: GeneratedGaussians, frame_z, x_min, y_min, scale,
                 settings: RasterSettings, m2d_fwd, m2d_flip):
    """(planes, counts) for the forward and flip views of one frame, plus
    the forward projection (radii are mirror-invariant)."""
    from gsvc_tpu.render.splat import (
        attr_rows_from_proj, gather_tile_planes_rows,
    )

    # project WITHOUT means2d: the per-view zero tensors are added at the
    # attribute-row level below so each view's screen-gradient cotangent
    # stays its own (adding m2d_fwd before the mirror would leak the flip
    # view's x-gradients, negated, into the forward stats)
    proj = project_gaussians(gss.xyz, gss.scaling, gss.rot, gss.valid,
                             frame_z, x_min, y_min, scale, settings,
                             flip=False)
    opacity = jnp.where(proj.valid[:, None], gss.opacity, 0.0)
    tile_lists, counts, dropped, overflow, n_rendered = _bin_gaussians(
        proj, settings)
    attr_base = attr_rows_from_proj(proj, opacity, gss.color)
    attr_fwd = attr_base
    if m2d_fwd is not None:
        attr_fwd = jnp.concatenate(
            [attr_base[:, 0:1] + m2d_fwd[:, 0:1],
             attr_base[:, 1:2] + m2d_fwd[:, 1:2], attr_base[:, 2:]], axis=1)
    planes_f = gather_tile_planes_rows(attr_fwd, tile_lists)

    if can_mirror(settings):
        lists_b, counts_b = flip_tile_lists(tile_lists, counts, settings)
        attr_b = flip_attr_rows(attr_base, settings, m2d_flip)
        planes_b = gather_tile_planes_rows(attr_b, lists_b)
        # the flip view drops the SAME copies, in mirrored tile order
        dropped_b = dropped[jnp.asarray(_mirror_tile_perm(settings))]
    else:
        # image width not tile-aligned: mirror is inexact -> bin the flip
        # view independently (second sort, still one composite launch)
        proj_b = project_gaussians(gss.xyz, gss.scaling, gss.rot, gss.valid,
                                   frame_z, x_min, y_min, scale, settings,
                                   flip=True, means2d=m2d_flip)
        opacity_b = jnp.where(proj_b.valid[:, None], gss.opacity, 0.0)
        lists_b, counts_b, dropped_b, ovf_b, _ = _bin_gaussians(
            proj_b, settings)
        planes_b = gather_tile_planes_rows(
            attr_rows_from_proj(proj_b, opacity_b, gss.color), lists_b)
        overflow = overflow + ovf_b
    return (planes_f, counts, planes_b, counts_b, proj, overflow,
            n_rendered, dropped, dropped_b)


def _composite_concat(settings, planes_all, counts_all, rasterizer: str,
                      inference: bool):
    """Dispatch concatenated-view planes to a compositor; assemble."""
    if rasterizer in ("pallas", "pallas_train", "pallas_stream"):
        # pallas_stream reaches here only on the non-mirrorable fallback
        # (image width not tile-aligned): concatenated-view planes
        from gsvc_tpu.render.pallas_splat import (
            composite_tiles_inference, pallas_tile_composite,
        )

        if inference:
            out4 = composite_tiles_inference(settings, planes_all,
                                             counts_all)
        else:
            out4 = pallas_tile_composite(settings, planes_all, counts_all)
    else:
        out4 = composite_tiles_jnp(settings, planes_all, counts_all)
    return assemble_views(settings, out4)


def render_frame_views(state: ModelState, cfg: GaussianConfig, frame_z,
                       x_min, y_min, scale, settings: RasterSettings,
                       window_cap: int,
                       mode: GenerateMode = GenerateMode.FULL_PRECISION,
                       key: Optional[jax.Array] = None,
                       rasterizer: str = "jnp", decoded: bool = False,
                       inference: bool = False):
    """Full-frame reconstruction: forward + flipped view of ONE frame with
    shared generation and a single 2-view composite launch — the
    decode/eval fast path (reference: report_utils.py:412-447).

    Returns (averaged image [3,H,W], images [2,3,H,W], ts [2,H,W], aux)
    where aux carries (gss, window_start, in_window, radii, overflow)."""
    start, in_window = window_for_frame(state, cfg, frame_z, window_cap)
    gss = generate_neural_gaussians(
        state, cfg, frame_z=frame_z, cam_z=frame_z, window_start=start,
        in_window=in_window, cap=window_cap, mode=mode, key=key,
        decoded=decoded)
    if (rasterizer in ("pallas", "pallas_train", "pallas_stream")
            and can_mirror(settings)):
        from gsvc_tpu.render.splat import attr_rows_from_proj

        proj = project_gaussians(gss.xyz, gss.scaling, gss.rot, gss.valid,
                                 frame_z, x_min, y_min, scale, settings,
                                 flip=False)
        opacity = jnp.where(proj.valid[:, None], gss.opacity, 0.0)
        if rasterizer == "pallas_stream":
            from gsvc_tpu.render.pallas_stream import (
                concat_stream_bins, stream_composite_attrs,
                stream_composite_inference,
            )
            from gsvc_tpu.render.splat import bin_gaussians_stream

            sb = bin_gaussians_stream(proj, settings)
            ovf, nrend = sb.overflow, sb.n_rendered
            attrs = attr_rows_from_proj(proj, opacity, gss.color)
            sids, blk_tile, blk_cc, nblk = concat_stream_bins(
                [sb], settings)
            compose = (stream_composite_inference if inference
                       else functools.partial(stream_composite_attrs,
                                              m2d=None))
            out4 = compose(settings, attrs[None], sids, blk_tile, blk_cc,
                           nblk)
        else:
            from gsvc_tpu.render.pallas_splat import mirror_composite_attrs

            tile_lists, counts, _, ovf, nrend = _bin_gaussians(proj,
                                                               settings)
            attrs = attr_rows_from_proj(proj, opacity, gss.color)
            out4 = mirror_composite_attrs(
                settings, attrs[None], tile_lists[None], counts[None],
                None)
        images, ts = assemble_views(settings, out4)
    else:
        pf, cf, pb, cb_, proj, ovf, nrend, _, _ = _frame_views(
            gss, frame_z, x_min, y_min, scale, settings, None, None)
        planes_all = tuple(jnp.concatenate([pf[i], pb[i]], axis=0)
                           for i in range(9))
        counts_all = jnp.concatenate([cf, cb_], axis=0)
        images, ts = _composite_concat(settings, planes_all, counts_all,
                                       rasterizer, inference)
    avg = (images[0] + images[1][:, :, ::-1]) / 2.0
    aux = (gss, start, in_window, proj.radius, ovf, nrend)
    return avg, images, ts, aux


def render_frame_bidir(state: ModelState, cfg: GaussianConfig, frame_z,
                       x_min, y_min, scale, settings: RasterSettings,
                       window_cap: int,
                       mode: GenerateMode = GenerateMode.FULL_PRECISION,
                       key: Optional[jax.Array] = None,
                       rasterizer: str = "jnp", decoded: bool = False):
    """Decode fast path: the fwd/flip-AVERAGED frame in ONE composite pass.

    The decoded frame is defined as the average of the forward and
    x-flipped (reverse-z-order) views (reference: report_utils.py:412-447);
    render_frame_views composites both views (two alpha evaluations per
    copy x pixel).  The bidirectional kernel (pallas_splat.py v4) computes
    the average directly from the FORWARD tile lists with one alpha
    evaluation, a front-prefix and a Horner back-suffix — and skips the
    flip view's tile-list mirror + plane handling entirely.

    Returns (avg image [3,H,W], total transmittance [H,W], aux).  Output
    matches render_frame_views' avg to within the documented T_EPS bound
    (exact when no early-exit truncation triggers).  Falls back to
    render_frame_views on the jnp path / non-tile-aligned widths."""
    if rasterizer not in ("pallas", "pallas_train", "pallas_stream") \
            or not can_mirror(settings):
        avg, _, ts, aux = render_frame_views(
            state, cfg, frame_z, x_min, y_min, scale, settings, window_cap,
            mode=mode, key=key, rasterizer=rasterizer, decoded=decoded,
            inference=True)
        return avg, ts[0], aux

    from gsvc_tpu.render.pallas_splat import bidir_composite_attrs
    from gsvc_tpu.render.splat import attr_rows_from_proj

    start, in_window = window_for_frame(state, cfg, frame_z, window_cap)
    gss = generate_neural_gaussians(
        state, cfg, frame_z=frame_z, cam_z=frame_z, window_start=start,
        in_window=in_window, cap=window_cap, mode=mode, key=key,
        decoded=decoded)
    proj = project_gaussians(gss.xyz, gss.scaling, gss.rot, gss.valid,
                             frame_z, x_min, y_min, scale, settings,
                             flip=False)
    opacity = jnp.where(proj.valid[:, None], gss.opacity, 0.0)
    tile_lists, counts, _, ovf, nrend = _bin_gaussians(proj, settings)
    attrs = attr_rows_from_proj(proj, opacity, gss.color)
    imgs, ts = bidir_composite_attrs(settings, attrs[None],
                                     tile_lists[None], counts[None])
    aux = (gss, start, in_window, proj.radius, ovf, nrend)
    return imgs[0], ts[0], aux


def _pair_entropy_contexts(state, cfg, s1, s2, cap: int, decoded: bool):
    """Entropy contexts for two overlapping TSW windows from ONE query.

    calc_entropy_context is pointwise per anchor (hash interp + MLPs, no
    cross-anchor ops), so slicing a union-window query is exactly the
    per-window computation.  A static SLACK bounds the union size; when
    the frames' window starts differ by more than SLACK (degenerate
    anchor pile-ups), a lax.cond falls back to two separate queries."""
    from gsvc_tpu.models.gaussians import calc_entropy_context, get_anchor

    capacity = state.anchors.anchor.shape[0]
    slack = min(max(cap // 8, 64), capacity - cap)
    anchor_q = get_anchor(state, decoded)
    if slack <= 0:
        # window spans the whole buffer: both starts are clipped to 0
        a = jax.lax.dynamic_slice_in_dim(anchor_q, s1, cap, 0)
        ec = calc_entropy_context(state, cfg, a, decoded)
        return [ec, ec]
    s_min = jnp.clip(jnp.minimum(s1, s2), 0, capacity - cap - slack)
    shift_ok = jnp.maximum(s1, s2) - s_min <= slack

    def union(_):
        a = jax.lax.dynamic_slice_in_dim(anchor_q, s_min, cap + slack, 0)
        ecu = calc_entropy_context(state, cfg, a, decoded)

        def cut(off):
            return jax.tree.map(
                lambda v: jax.lax.dynamic_slice_in_dim(v, off, cap, 0),
                ecu)

        return cut(s1 - s_min), cut(s2 - s_min)

    def separate(_):
        def one(st):
            a = jax.lax.dynamic_slice_in_dim(anchor_q, st, cap, 0)
            return calc_entropy_context(state, cfg, a, decoded)

        return one(s1), one(s2)

    ec1, ec2 = jax.lax.cond(shift_ok, union, separate, None)
    return [ec1, ec2]


class PairRender(NamedTuple):
    """All four views of a frame pair, composited in one launch."""

    images: jnp.ndarray          # [4, 3, H, W]: f1 fwd, f1 flip, f2 fwd, f2 flip
    transmittances: jnp.ndarray  # [4, H, W]
    renders: tuple               # 4x RenderResults (views of a frame share
                                 # generation, radii, window and rate)


def render_pair(state: ModelState, cfg: GaussianConfig, z1, z2,
                x_min, y_min, scale, settings: RasterSettings,
                window_cap: int, mode: GenerateMode,
                key: Optional[jax.Array], rasterizer: str = "jnp",
                means2d: Optional[jnp.ndarray] = None,
                decoded: bool = False) -> PairRender:
    """Render both frames of a training pair in both view directions.

    ``means2d``: optional [4, M, 2] zeros whose cotangents carry the
    per-view screen gradients (densification statistics)."""
    if key is not None:
        k1, k2 = jax.random.split(key)
    else:
        k1 = k2 = None
    m2 = (lambda i: means2d[i]) if means2d is not None else (lambda i: None)

    from gsvc_tpu.render.splat import (
        attr_rows_from_proj, gather_tile_planes_rows,
    )

    use_mirror_kernel = (rasterizer in ("pallas", "pallas_train")
                         and can_mirror(settings))
    use_stream_kernel = (rasterizer == "pallas_stream"
                         and can_mirror(settings))

    wins = [window_for_frame(state, cfg, z, window_cap) for z in (z1, z2)]
    ecs = [None, None]
    if mode in (GenerateMode.ENTROPY, GenerateMode.STE_ENTROPY):
        # the two frames' TSW windows overlap almost entirely and the
        # entropy context is pointwise per anchor: compute ONE context
        # over the union window and slice both frames' views out of it
        ecs = _pair_entropy_contexts(state, cfg, wins[0][0], wins[1][0],
                                     window_cap, decoded)

    gens = []
    for fi, (z, k) in enumerate(((z1, k1), (z2, k2))):
        start, in_window = wins[fi]
        gss = generate_neural_gaussians(
            state, cfg, frame_z=z, cam_z=z, window_start=start,
            in_window=in_window, cap=window_cap, mode=mode, key=k,
            decoded=decoded, entropy_ctx=ecs[fi])
        proj = project_gaussians(gss.xyz, gss.scaling, gss.rot, gss.valid,
                                 z, x_min, y_min, scale, settings,
                                 flip=False)
        gens.append((gss, start, in_window, proj))

    if use_stream_kernel:
        # v4 fast path: both views of each frame composited straight from
        # the chunk-aligned sorted copy stream — no [T, cap] padded
        # gather/scatter anywhere; machinery cost scales with the actual
        # binned copies (pallas_stream.py, stream_composite_attrs)
        from gsvc_tpu.render.pallas_stream import (
            concat_stream_bins, stream_composite_attrs,
        )
        from gsvc_tpu.render.splat import (
            attr_rows_from_proj, bin_gaussians_stream,
        )

        per_frame = []
        attrs_l, sbs = [], []
        mperm = jnp.asarray(_mirror_tile_perm(settings))
        for fi, (gss, start, in_window, proj) in enumerate(gens):
            sb = bin_gaussians_stream(proj, settings)
            opacity = jnp.where(proj.valid[:, None], gss.opacity, 0.0)
            attrs_l.append(attr_rows_from_proj(proj, opacity, gss.color))
            sbs.append(sb)
            per_frame.append((gss, start, in_window, proj, sb.overflow,
                              sb.n_rendered, sb.dropped, sb.dropped[mperm]))
        sids, blk_tile, blk_cc, nblk = concat_stream_bins(sbs, settings)
        out4 = stream_composite_attrs(
            settings, jnp.stack(attrs_l), sids, blk_tile, blk_cc, nblk,
            means2d)
        images, ts = assemble_views(settings, out4)
        frames = [(gss, start, in_window, None, None, None, None, proj,
                   ovf_f, nrend_f, dr_f, dr_b)
                  for (gss, start, in_window, proj, ovf_f, nrend_f,
                       dr_f, dr_b)
                  in per_frame]
    elif use_mirror_kernel:
        # v3 fast path: the flip views are composited IN-KERNEL from the
        # forward planes (mirrored pixel coords + reversed chunk order) —
        # no flip plane gather, no second scatter-add transpose, and ONE
        # combined backward scatter per frame (pallas_splat.py,
        # mirror_composite_attrs)
        from gsvc_tpu.render.pallas_splat import mirror_composite_attrs

        per_frame = []
        attrs_l, lists_l, counts_l = [], [], []
        mperm = jnp.asarray(_mirror_tile_perm(settings))
        for fi, (gss, start, in_window, proj) in enumerate(gens):
            tile_lists, counts, dropped, ovf_f, nrend_f = _bin_gaussians(
                proj, settings)
            opacity = jnp.where(proj.valid[:, None], gss.opacity, 0.0)
            attrs_l.append(attr_rows_from_proj(proj, opacity, gss.color))
            lists_l.append(tile_lists)
            counts_l.append(counts)
            per_frame.append((gss, start, in_window, proj, ovf_f, nrend_f,
                              dropped, dropped[mperm]))
        out4 = mirror_composite_attrs(
            settings, jnp.stack(attrs_l), jnp.stack(lists_l),
            jnp.stack(counts_l), means2d)
        images, ts = assemble_views(settings, out4)
        frames = [(gss, start, in_window, None, None, None, None, proj,
                   ovf_f, nrend_f, dr_f, dr_b)
                  for (gss, start, in_window, proj, ovf_f, nrend_f,
                       dr_f, dr_b)
                  in per_frame]
    else:
        if can_mirror(settings):
            # per-frame binning: a vmapped 2-frame batched sort was
            # measured 25% SLOWER end to end on v5e (bench 2.665 -> 2.0
            # it/s) — XLA's batched sort lowering loses to two
            # sequential sorts here
            frames = []
            mperm = jnp.asarray(_mirror_tile_perm(settings))
            for fi, (gss, start, in_window, proj) in enumerate(gens):
                tile_lists, counts, dropped, ovf_f, nrend_f = \
                    _bin_gaussians(proj, settings)
                opacity = jnp.where(proj.valid[:, None], gss.opacity, 0.0)
                attr_base = attr_rows_from_proj(proj, opacity, gss.color)
                m2d_fwd, m2d_flip = m2(2 * fi), m2(2 * fi + 1)
                attr_fwd = attr_base
                if m2d_fwd is not None:
                    attr_fwd = jnp.concatenate(
                        [attr_base[:, 0:1] + m2d_fwd[:, 0:1],
                         attr_base[:, 1:2] + m2d_fwd[:, 1:2],
                         attr_base[:, 2:]], axis=1)
                pf = gather_tile_planes_rows(attr_fwd, tile_lists)
                lists_b, counts_b = flip_tile_lists(tile_lists, counts,
                                                    settings)
                attr_b = flip_attr_rows(attr_base, settings, m2d_flip)
                pb = gather_tile_planes_rows(attr_b, lists_b)
                frames.append((gss, start, in_window, pf, counts, pb,
                               counts_b, proj, ovf_f, nrend_f,
                               dropped, dropped[mperm]))
        else:
            frames = []
            for fi, (gss, start, in_window, _) in enumerate(gens):
                z = (z1, z2)[fi]
                (pf, cf, pb, cb_, proj, ovf, nrend, dr_f,
                 dr_b) = _frame_views(
                    gss, z, x_min, y_min, scale, settings, m2(2 * fi),
                    m2(2 * fi + 1))
                frames.append((gss, start, in_window, pf, cf, pb, cb_,
                               proj, ovf, nrend, dr_f, dr_b))

        planes_all = tuple(
            jnp.concatenate([frames[0][3][i], frames[0][5][i],
                             frames[1][3][i], frames[1][5][i]], axis=0)
            for i in range(9))
        counts_all = jnp.concatenate(
            [frames[0][4], frames[0][6], frames[1][4], frames[1][6]],
            axis=0)
        images, ts = _composite_concat(settings, planes_all, counts_all,
                                       rasterizer, inference=False)

    from gsvc_tpu.render.splat import tile_harmful_overflow

    renders = []
    for fi, vi in ((0, 0), (0, 1), (1, 2), (1, 3)):
        (gss, start, in_window, _, _, _, _, proj, ovf, nrend,
         dr_f, dr_b) = frames[fi]
        dropped_v = dr_f if vi % 2 == 0 else dr_b
        renders.append(RenderResults(
            image=images[vi],
            transmittance=ts[vi],
            window_start=start,
            in_window=in_window,
            radii=proj.radius,
            visibility_filter=proj.radius > 0,
            selection_mask=gss.valid,
            neural_opacity=gss.neural_opacity,
            scaling=gss.scaling,
            num_rendered=nrend,
            overflow=ovf,
            harmful_overflow=tile_harmful_overflow(settings, ts[vi],
                                                   dropped_v),
            rate=gss.rate,
            gaussians=gss,
        ))
    return PairRender(images=images, transmittances=ts,
                      renders=tuple(renders))
