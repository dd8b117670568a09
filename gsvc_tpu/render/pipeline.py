"""Frame rendering pipeline: model -> neural gaussians -> splat.

Parity with ortho_gaussian_renderer/renderer.py:14-119 (``render``) plus
preprocess.py:30-118 (``prefilter_voxel``), folded together: the TSW
z-window is the ``window_for_frame`` dynamic slice, on-screen culling
happens inside the rasterizer, and the visibility mask is carried as a
static-shape boolean instead of a gathered index set.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gsvc_tpu.models.gaussians import (
    GaussianConfig, GenerateMode, GeneratedGaussians, ModelState, RatePack,
    generate_neural_gaussians, window_for_frame,
)
from gsvc_tpu.render.splat import RasterSettings, rasterize


class RenderResults(NamedTuple):
    """Per-render record (reference: common/base.py:9-27)."""

    image: jnp.ndarray              # [3, H, W] channel-first
    transmittance: jnp.ndarray     # [H, W]
    window_start: jnp.ndarray      # int32 — anchor index of window row 0
    in_window: jnp.ndarray         # [V] anchor-level visibility
    radii: jnp.ndarray             # [V*K]
    visibility_filter: jnp.ndarray  # [V*K] radii > 0
    selection_mask: jnp.ndarray    # [V*K] neural_opacity>0 & in window
    neural_opacity: jnp.ndarray    # [V*K, 1]
    scaling: jnp.ndarray           # [V*K, 3] generated gaussian scales
    num_rendered: jnp.ndarray
    overflow: jnp.ndarray
    rate: RatePack
    gaussians: GeneratedGaussians
    # dropped pairs at tiles whose final T >= 1/255 — visible loss; the
    # capacity-growth policy reacts to this, raw overflow is telemetry
    # (plain-int default: an eager jnp constant here would touch the
    # backend at import time)
    harmful_overflow: jnp.ndarray = 0


def make_raster_settings(cfg: GaussianConfig, image_height: int,
                         image_width: int, *, tile_h=16, tile_w=128,
                         gaussian_cap=1024, chunk=128, tiles_per_gaussian=32,
                         copy_budget_factor=0, bg=0.0,
                         matmul_dtype="float32") -> RasterSettings:
    # chunk must be a multiple of 128 for the Pallas kernels (lane-aligned
    # dynamic slices); the jnp compositor accepts any divisor of cap
    vmem_est = tile_h * tile_w * chunk * 4 * 10  # ~10 live [C,P] f32 bufs
    if vmem_est > 14 * 2 ** 20:
        import warnings

        warnings.warn(
            f"tile {tile_h}x{tile_w} with chunk {chunk} needs ~"
            f"{vmem_est / 2**20:.0f} MB of VMEM scratch in the Pallas "
            f"compositing kernels (budget ~16 MB); use smaller tiles "
            f"(e.g. 8x128) or a smaller chunk", stacklevel=2)
    return RasterSettings(
        image_height=image_height, image_width=image_width,
        threshold=cfg.threshold, kernel_size=cfg.kernel_size,
        tile_h=tile_h, tile_w=tile_w, gaussian_cap=gaussian_cap,
        chunk=chunk, tiles_per_gaussian=tiles_per_gaussian,
        copy_budget_factor=copy_budget_factor, bg=bg,
        matmul_dtype=matmul_dtype)


def render_frame(
    state: ModelState, cfg: GaussianConfig,
    frame_z, x_min: float, y_min: float, scale: float,
    settings: RasterSettings, window_cap: int,
    mode: GenerateMode = GenerateMode.FULL_PRECISION,
    key: Optional[jax.Array] = None,
    flip: bool = False,
    decoded: bool = False,
    means2d: Optional[jnp.ndarray] = None,
    use_pallas: bool = False,
    rasterizer: str = None,
) -> RenderResults:
    """Render one frame plane in one view direction.

    ``flip=False`` is the forward view; ``flip=True`` the reversed "_s"
    view whose image the caller x-flips before averaging
    (reference: pipeline/train.py:358-375).

    ``rasterizer``: "jnp" (differentiable XLA compositor),
    "pallas" (forward-only kernel, per-tile early exit — decode/eval),
    "pallas_train" (custom-VJP kernel pair — training fast path).
    ``use_pallas`` is a legacy alias for rasterizer="pallas".
    """
    if rasterizer is None:
        rasterizer = "pallas" if use_pallas else "jnp"
    start, in_window = window_for_frame(state, cfg, frame_z, window_cap)
    gss = generate_neural_gaussians(
        state, cfg, frame_z=frame_z, cam_z=frame_z,
        window_start=start, in_window=in_window, cap=window_cap,
        mode=mode, key=key, decoded=decoded)

    if rasterizer == "pallas":
        from gsvc_tpu.render.pallas_splat import rasterize_pallas

        out = rasterize_pallas(
            gss.xyz, gss.color, gss.opacity, gss.scaling, gss.rot,
            gss.valid, frame_z, x_min, y_min, scale, settings, flip=flip)
    elif rasterizer == "pallas_train":
        from gsvc_tpu.render.pallas_splat import rasterize_pallas_train

        out = rasterize_pallas_train(
            gss.xyz, gss.color, gss.opacity, gss.scaling, gss.rot,
            gss.valid, frame_z, x_min, y_min, scale, settings, flip=flip,
            means2d=means2d)
    else:
        out = rasterize(
            gss.xyz, gss.color, gss.opacity, gss.scaling, gss.rot,
            gss.valid, frame_z, x_min, y_min, scale, settings, flip=flip,
            means2d=means2d)

    return RenderResults(
        image=out.image,
        transmittance=out.transmittance,
        window_start=start,
        in_window=in_window,
        radii=out.radii,
        visibility_filter=out.radii > 0,
        selection_mask=gss.valid,
        neural_opacity=gss.neural_opacity,
        scaling=gss.scaling,
        num_rendered=out.num_rendered,
        overflow=out.overflow,
        harmful_overflow=out.harmful_overflow,
        rate=gss.rate,
        gaussians=gss,
    )


def render_frame_averaged(state, cfg, frame_z, x_min, y_min, scale, settings,
                          window_cap, mode=GenerateMode.FULL_PRECISION,
                          key=None, decoded=False):
    """Forward + x-flipped reversed view, averaged — the full-frame
    reconstruction used for eval and decode
    (reference: pipeline/train.py:368-375, report_utils.py:412-447)."""
    if key is not None:
        key_f, key_b = jax.random.split(key)
    else:
        key_f = key_b = None
    rf = render_frame(state, cfg, frame_z, x_min, y_min, scale, settings,
                      window_cap, mode, key_f, flip=False, decoded=decoded)
    rb = render_frame(state, cfg, frame_z, x_min, y_min, scale, settings,
                      window_cap, mode, key_b, flip=True, decoded=decoded)
    image = (rf.image + rb.image[:, :, ::-1]) / 2.0
    return image, rf, rb
