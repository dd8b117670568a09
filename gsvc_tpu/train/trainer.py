"""The fused training step and the GOP fitting loop.

One ``train_step`` = 4 renders (two frames x two view directions) + loss +
backward + Adam, traced once per GenerateMode and compiled into a single
XLA program — the TPU answer to the reference's CPU-driven iteration with
4 separate CUDA render calls (pipeline/train.py:325-581).

Densification statistics are accumulated on device with dynamic-slice
adds over the TSW window (training_statis, scene/gaussian_model.py:
1281-1314); the actual grow/prune runs host-side between steps
(train/densify.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gsvc_tpu.config import OptimizationConfig
from gsvc_tpu.metrics.image import psnr, ssim
from gsvc_tpu.models.gaussians import (
    GaussianConfig, GenerateMode, ModelState, get_scaling,
)
from gsvc_tpu.ops import binary_vxl_size, ste_binary
from gsvc_tpu.render.pipeline import RenderResults
from gsvc_tpu.render.splat import RasterSettings
from gsvc_tpu.train.optim import AdamState, adam_update, build_lr_tree


class TrainStats(NamedTuple):
    """Densification accumulators, anchor-capacity sized."""

    opacity_accum: jnp.ndarray          # [capN, 1]
    anchor_demon: jnp.ndarray           # [capN, 1]
    offset_gradient_accum: jnp.ndarray  # [capN*K, 1]
    offset_denom: jnp.ndarray           # [capN*K, 1]


def init_stats(capacity: int, n_offsets: int) -> TrainStats:
    return TrainStats(
        opacity_accum=jnp.zeros((capacity, 1)),
        anchor_demon=jnp.zeros((capacity, 1)),
        offset_gradient_accum=jnp.zeros((capacity * n_offsets, 1)),
        offset_denom=jnp.zeros((capacity * n_offsets, 1)),
    )


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    psnr: jnp.ndarray
    scaling_reg: jnp.ndarray
    optical_loss: jnp.ndarray
    bit_per_param: jnp.ndarray
    bit_per_feat_param: jnp.ndarray
    bit_per_scaling_param: jnp.ndarray
    bit_per_offsets_param: jnp.ndarray
    num_rendered: jnp.ndarray
    overflow: jnp.ndarray
    active_gaussians: jnp.ndarray
    mask_ratio: jnp.ndarray
    # dropped pairs at unsaturated tiles (splat.tile_harmful_overflow);
    # drives capacity growth — raw overflow is telemetry only
    harmful_overflow: jnp.ndarray = 0


def _masked_mean(x, mask):
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def gt_f32(x):
    """Ground-truth frames/flows may arrive uint8 / bfloat16 / int8+scale
    (the HBM-resident GOP store — fit.py keeps 600x1080p frames on device
    only in compact dtypes); cast to f32 inside the jitted step.

    A ``(int8_array, f32_scale)`` tuple is a per-frame-scaled flow plane
    (fit.py stores the 599-frame flow stack as int8 — 2.5 GB HBM saved
    vs bfloat16 at ~0.1 px quantization error, below flow-estimator
    noise)."""
    if isinstance(x, tuple):
        arr, s = x
        return arr.astype(jnp.float32) * s
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x.astype(jnp.float32)


def _align_to_window1(arr2, shift_rows, rows: int):
    """Re-index window-2 rows into window-1 coordinates.

    Both windows slice the same z-sorted buffers, so window-2 row j holds
    the anchor that window-1 indexes at j + (start2-start1).  Pad with
    zeros on both sides and dynamic-slice at rows+shift."""
    pad = jnp.zeros((rows,) + arr2.shape[1:], arr2.dtype)
    padded = jnp.concatenate([pad, arr2, pad], axis=0)
    return jax.lax.dynamic_slice_in_dim(padded, rows + shift_rows, rows, 0)


def optical_flow_terms(r1: RenderResults, r2: RenderResults, flow,
                       x_min, y_min, scale, width: int, height: int,
                       n_offsets: int):
    """(error sum, match count) for the optical term of one view pair.

    Exposed separately so the SPMD step can psum numerator and
    denominator across z-slabs for an exact global masked mean."""
    rows = r1.selection_mask.shape[0]
    shift = (r2.window_start - r1.window_start) * n_offsets

    xy1 = (r1.gaussians.anchor_xyz + r1.gaussians.offsets_world)[:, :2]
    xy2_w2 = (r2.gaussians.anchor_xyz + r2.gaussians.offsets_world)[:, :2]
    xy2 = _align_to_window1(xy2_w2, shift, rows)
    valid2 = _align_to_window1(
        r2.selection_mask.astype(jnp.float32), shift, rows) > 0.5
    common = r1.selection_mask & valid2

    pix = jnp.round((xy1 - jnp.asarray([[x_min, y_min]])) * scale)
    px = pix[:, 0].astype(jnp.int32)
    py = pix[:, 1].astype(jnp.int32)
    in_bounds = (px >= 0) & (px < width) & (py >= 0) & (py < height)
    mask = (common & in_bounds).astype(jnp.float32)

    pxc = jnp.clip(px, 0, width - 1)
    pyc = jnp.clip(py, 0, height - 1)
    uv = flow[:, pyc, pxc].T / scale                    # [rows, 2]

    err = jnp.abs((xy2 - xy1) - uv)          # [rows, 2]
    # reference takes .abs().mean() over the [N, 2] matched array
    return jnp.sum(jnp.mean(err, axis=-1) * mask), jnp.sum(mask)


def optical_flow_loss(r1: RenderResults, r2: RenderResults, flow,
                      x_min, y_min, scale, width: int, height: int,
                      n_offsets: int):
    """Match gaussians alive in both frames and compare their screen
    motion against the optical flow (utils/loss_utils.py:76-138).

    flow: [2, H, W] backward flow in pixels; compared in NDC units.
    """
    num, den = optical_flow_terms(r1, r2, flow, x_min, y_min, scale,
                                  width, height, n_offsets)
    return num / jnp.maximum(den, 1.0)


def make_pair_loss(cfg: GaussianConfig, settings: RasterSettings,
                   window_cap: int, opt: OptimizationConfig,
                   width: int, height: int, scale: float,
                   x_min: float, y_min: float, rasterizer: str = "jnp"):
    """Builds the frame-pair loss (4 renders + all loss terms).

    Shared between the single-chip train step and the shard_map
    data-parallel step (gsvc_tpu/parallel)."""

    k = cfg.n_offsets
    use_optical = opt.optical_lambda != 0.0

    def _loss(st: ModelState, z1, z2, gt1, gt2, flow, key, mode, m2d):
        from gsvc_tpu.render.batched import render_pair

        pr = render_pair(st, cfg, z1, z2, x_min, y_min, scale, settings,
                         window_cap, mode, key, rasterizer=rasterizer,
                         means2d=m2d)
        r1f, r1b, r2f, r2b = pr.renders
        renders = pr.renders

        image1 = (pr.images[0] + pr.images[1][:, :, ::-1]) / 2.0
        image2 = (pr.images[2] + pr.images[3][:, :, ::-1]) / 2.0

        l1 = (jnp.mean(jnp.abs(image1 - gt1))
              + jnp.mean(jnp.abs(image2 - gt2)))
        dssim = (1.0 - ssim(image1, gt1)) + (1.0 - ssim(image2, gt2))

        scaling_reg = sum(
            _masked_mean(jnp.prod(r.scaling, axis=1), r.selection_mask)
            for r in renders)

        opacity_reg = sum(
            _masked_mean(1.0 - r.neural_opacity[:, 0],
                         jnp.repeat(r.in_window, k))
            for r in renders)

        if use_optical:
            optical = (
                optical_flow_loss(r1f, r2f, flow, x_min, y_min, scale,
                                  width, height, k)
                + optical_flow_loss(r1b, r2b, flow, x_min, y_min, scale,
                                    width, height, k))
        else:
            optical = jnp.zeros(())

        loss = ((1.0 - opt.lambda_dssim) * l1
                + opt.lambda_dssim * dssim
                + opt.scaling_reg * scaling_reg
                + opt.opacity_reg * opacity_reg
                + opt.optical_lambda * optical)

        bpp = sum(r.rate.bit_per_param for r in renders)
        if mode in (GenerateMode.ENTROPY, GenerateMode.STE_ENTROPY):
            hash_bin = (ste_binary(st.nets.hash_table) + 1) / 2
            _, bit_hash, _, _ = binary_vxl_size(hash_bin)
            denom = st.anchors.anchor.shape[0] * (cfg.feat_dim + 6 + 3 * k)
            loss = loss + opt.lmbda * (bpp + bit_hash / denom)
            loss = loss + opt.mask_reg * jnp.mean(
                jax.nn.sigmoid(st.anchors.mask))

        ps = (psnr(image1, gt1) + psnr(image2, gt2)) / 2.0

        aux = {
            "renders": renders,
            "metrics": _metrics(loss, l1, ps, scaling_reg, optical, bpp,
                                renders),
        }
        return loss, aux

    def _metrics(loss, l1, ps, scaling_reg, optical, bpp, renders):
        return StepMetrics(
            loss=loss, l1=l1, psnr=ps, scaling_reg=scaling_reg,
            optical_loss=optical,
            bit_per_param=bpp / 4.0,
            bit_per_feat_param=sum(
                r.rate.bit_per_feat_param for r in renders) / 4.0,
            bit_per_scaling_param=sum(
                r.rate.bit_per_scaling_param for r in renders) / 4.0,
            bit_per_offsets_param=sum(
                r.rate.bit_per_offsets_param for r in renders) / 4.0,
            num_rendered=sum(r.num_rendered for r in renders),
            overflow=sum(r.overflow for r in renders),
            active_gaussians=sum(
                jnp.sum(r.visibility_filter) for r in renders),
            mask_ratio=sum(jnp.mean(
                r.selection_mask.astype(jnp.float32)) for r in renders)
            / 4.0,
            harmful_overflow=sum(r.harmful_overflow for r in renders),
        )

    return _loss


def accumulate_stats(stats: TrainStats, renders, m2d_grads, scale, k: int
                     ) -> TrainStats:
    """training_statis for 4 renders (gaussian_model.py:1281-1314),
    as dynamic-slice adds over the window.  Window indices are relative
    to whatever anchor block the renders saw — the full buffer on a
    single chip, the local z-slab under SPMD."""
    oa, ad, oga, od = (stats.opacity_accum, stats.anchor_demon,
                       stats.offset_gradient_accum, stats.offset_denom)
    for r, g2d in zip(renders, m2d_grads):
        v = r.in_window.shape[0]
        s = r.window_start
        op = jnp.maximum(r.neural_opacity[:, 0], 0.0).reshape(v, k)
        op_sum = jnp.sum(op, axis=1, keepdims=True) \
            * r.in_window[:, None]
        oa = jax.lax.dynamic_update_slice_in_dim(
            oa, jax.lax.dynamic_slice_in_dim(oa, s, v, 0) + op_sum,
            s, 0)
        ad = jax.lax.dynamic_update_slice_in_dim(
            ad, jax.lax.dynamic_slice_in_dim(ad, s, v, 0)
            + r.in_window[:, None].astype(jnp.float32), s, 0)

        upd = (r.selection_mask & r.visibility_filter)[:, None]
        # pixel-space grads scaled back to NDC units for threshold
        # comparability with the reference's screenspace grads
        gnorm = jnp.linalg.norm(g2d, axis=-1, keepdims=True) * scale
        gnorm = jnp.where(upd, gnorm, 0.0)
        srow = s * k
        rows = v * k
        oga = jax.lax.dynamic_update_slice_in_dim(
            oga, jax.lax.dynamic_slice_in_dim(oga, srow, rows, 0)
            + gnorm, srow, 0)
        od = jax.lax.dynamic_update_slice_in_dim(
            od, jax.lax.dynamic_slice_in_dim(od, srow, rows, 0)
            + upd.astype(jnp.float32), srow, 0)
    return TrainStats(opacity_accum=oa, anchor_demon=ad,
                      offset_gradient_accum=oga, offset_denom=od)


def make_step_body(cfg: GaussianConfig, settings: RasterSettings,
                   window_cap: int, opt: OptimizationConfig,
                   width: int, height: int, scale: float,
                   x_min: float, y_min: float, rasterizer: str = "jnp"):
    """The un-jitted single-chip step: loss + backward + stats + Adam.

    Shared by ``make_train_step`` (one jit call per iteration) and
    ``make_train_multi_step`` (a ``lax.scan`` over K iterations per
    dispatch — same ops, so the two paths match numerically)."""

    k = cfg.n_offsets
    _loss = make_pair_loss(cfg, settings, window_cap, opt, width, height,
                           scale, x_min, y_min, rasterizer=rasterizer)

    def step_body(state: ModelState, adam_state: AdamState,
                  stats: TrainStats, lr_values: dict,
                  z1, z2, gt1, gt2, flow, key,
                  mode: GenerateMode, do_stats: bool):
        gt1, gt2, flow = gt_f32(gt1), gt_f32(gt2), gt_f32(flow)
        params = (state.anchors, state.nets)
        rows = window_cap * k
        m2d = jnp.zeros((4, rows, 2)) if do_stats else None

        def loss_fn(p, m2d_):
            st = state._replace(anchors=p[0], nets=p[1])
            return _loss(st, z1, z2, gt1, gt2, flow, key, mode, m2d_)

        if do_stats:
            (loss, aux), (g_params, g_m2d) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, m2d)
            stats = accumulate_stats(stats, aux["renders"],
                                     [g_m2d[i] for i in range(4)], scale, k)
        else:
            (loss, aux), g_params = jax.value_and_grad(
                loss_fn, argnums=0, has_aux=True)(params, None)

        lr_tree = build_lr_tree(params, lr_values)
        new_params, adam_state = adam_update(params, g_params, adam_state,
                                             lr_tree)
        new_state = state._replace(anchors=new_params[0],
                                   nets=new_params[1])
        return new_state, adam_state, stats, aux["metrics"]

    return step_body


def make_train_step(cfg: GaussianConfig, settings: RasterSettings,
                    window_cap: int, opt: OptimizationConfig,
                    width: int, height: int, scale: float,
                    x_min: float, y_min: float, rasterizer: str = "jnp"):
    """Builds the jitted single-chip train step closed over static config."""

    step_body = make_step_body(cfg, settings, window_cap, opt, width,
                               height, scale, x_min, y_min,
                               rasterizer=rasterizer)
    return functools.partial(jax.jit, static_argnames=("mode", "do_stats"),
                             donate_argnums=(0, 1, 2))(step_body)


def make_train_multi_step(cfg: GaussianConfig, settings: RasterSettings,
                          window_cap: int, opt: OptimizationConfig,
                          width: int, height: int, scale: float,
                          x_min: float, y_min: float,
                          rasterizer: str = "jnp"):
    """K train iterations per device dispatch (``lax.scan`` over the step
    body), with the per-iteration feed work moved ON DEVICE:

    - ground-truth frames / flow are indexed from the HBM-resident GOP
      stacks by scalar frame ids inside the scan body, and
    - the PRNG key evolves in-carry with the same ``jax.random.split``
      chain the host loop performs,

    so one dispatch replaces the ~5 per-iteration RPC round trips that
    dominate wall-clock through the remote-TPU tunnel (~100-300 ms each,
    CLAUDE.md) while computing bit-identical ops to the single-step path.
    Returns ``(state, adam, stats, key, metrics)`` where metrics are the
    LAST iteration's (the host loop only ever reads metrics at
    log/densify boundaries, which chunk construction places at the end
    of a dispatch)."""

    step_body = make_step_body(cfg, settings, window_cap, opt, width,
                               height, scale, x_min, y_min,
                               rasterizer=rasterizer)

    @functools.partial(jax.jit, static_argnames=("mode", "do_stats"),
                       donate_argnums=(0, 1, 2, 3))
    def multi_step(state: ModelState, adam_state: AdamState,
                   stats: TrainStats, key, lr_stack: dict,
                   z1s, z2s, f1s, f2s, fls, images, flows,
                   mode: GenerateMode, do_stats: bool):
        def body(carry, xs):
            st, ad, sts, k_ = carry
            lrs, z1, z2, f1, f2, fl = xs
            k_, sk = jax.random.split(k_)
            gt1 = images[f1]
            gt2 = images[f2]
            flow = ((flows[0][fl], flows[1][fl])
                    if isinstance(flows, tuple) else flows[fl])
            st, ad, sts, metrics = step_body(
                st, ad, sts, lrs, z1, z2, gt1, gt2, flow, sk,
                mode=mode, do_stats=do_stats)
            return (st, ad, sts, k_), metrics

        (state, adam_state, stats, key), ms = jax.lax.scan(
            body, (state, adam_state, stats, key),
            (lr_stack, z1s, z2s, f1s, f2s, fls))
        return (state, adam_state, stats, key,
                jax.tree.map(lambda x: x[-1], ms))

    return multi_step
