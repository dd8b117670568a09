"""Multi-chip SPMD training: frame-pair data parallelism x z-slab model
parallelism over a jax.sharding.Mesh.

The reference is single-process single-GPU (SURVEY.md §2.4 — no
torch.distributed anywhere); these axes are first-class TPU designs, not
ports:

  * ``dp`` — each device group fits a *different frame pair* per step;
    gradients are ``psum``-averaged over ICI.  (Between GOPs, data
    parallelism is trivially the multi-pod axis.)
  * ``sp`` — anchors are sharded into contiguous **z-slabs** (the arrays
    are kept z-sorted, so an equal row split IS a z-slab split).  Each
    device rasterizes only its own gaussians into a partial
    (premultiplied color, transmittance) image; because ``over`` is
    associative and slabs are depth-disjoint, the full frame is the
    slab-ordered composite of the partials — one ``all_gather`` of
    [D, H, W, 4] over ICI, then an exclusive transmittance product.
    This is the sharded analog of the TSW locality: a frame's window
    touches at most a couple of neighboring slabs, so most devices
    contribute pure background and the gather stays tiny after XLA's
    latency hiding.

Densification statistics are disabled under SPMD in round 1 (grow/prune
runs between re-sharding epochs on the host).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gsvc_tpu.config import OptimizationConfig
from gsvc_tpu.metrics.image import psnr, ssim
from gsvc_tpu.models.gaussians import (
    AnchorState, GaussianConfig, GenerateMode, ModelState,
)
from gsvc_tpu.ops import binary_vxl_size, ste_binary
from gsvc_tpu.render.pipeline import render_frame
from gsvc_tpu.render.splat import RasterSettings
from gsvc_tpu.train.optim import AdamState, adam_update, build_lr_tree


def make_mesh(n_dp: int = 1, n_sp: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_dp * n_sp, \
        f"need {n_dp * n_sp} devices, have {len(devices)}"
    dev = np.asarray(devices[: n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(dev, axis_names=("dp", "sp"))


def shard_model_state(state: ModelState, mesh: Mesh) -> ModelState:
    """Place anchors z-slab-sharded over ``sp`` and replicate the nets.

    The anchor buffers are z-sorted with z=1e9 padding, so an equal row
    split is a contiguous z-slab per device."""
    anchor_sharding = NamedSharding(mesh, P("sp"))
    repl = NamedSharding(mesh, P())
    anchors = AnchorState(**{
        f: jax.device_put(getattr(state.anchors, f), anchor_sharding)
        for f in AnchorState._fields})
    nets = jax.tree.map(lambda x: jax.device_put(x, repl), state.nets)
    return state._replace(
        anchors=anchors, nets=nets,
        n_active=jax.device_put(state.n_active, repl),
        x_bound_min=jax.device_put(state.x_bound_min, repl),
        x_bound_max=jax.device_put(state.x_bound_max, repl))


def combine_slab_renders(partial_img, partial_t, flip: bool, bg: float,
                         axis_name: str = "sp"):
    """Composite per-slab partial renders across the ``sp`` axis.

    partial_img: local [3, H, W] premultiplied color (rendered with bg=0);
    partial_t:   local [H, W] transmittance.
    Slabs are z-ascending by shard index; the forward view looks toward
    -z so the *last* slab is nearest (front).  ``over`` composition:
    out = sum_d C_d * prod_{d' in front of d} T_{d'}.
    """
    imgs = jax.lax.all_gather(partial_img, axis_name)     # [D, 3, H, W]
    ts = jax.lax.all_gather(partial_t, axis_name)          # [D, H, W]
    if not flip:
        imgs = imgs[::-1]
        ts = ts[::-1]
    log_t = jnp.log(jnp.maximum(ts, 1e-30))
    excl = jnp.cumsum(log_t, axis=0) - log_t               # prod of nearer
    weights = jnp.exp(excl)
    out = jnp.sum(imgs * weights[:, None], axis=0)         # [3, H, W]
    t_all = jnp.exp(jnp.sum(log_t, axis=0))
    return out + t_all[None] * bg, t_all


def make_spmd_train_step(cfg: GaussianConfig, settings: RasterSettings,
                         window_cap: int, opt: OptimizationConfig,
                         width: int, height: int, scale: float,
                         x_min: float, y_min: float, mesh: Mesh,
                         rasterizer: str = "jnp"):
    """SPMD train step: batch of ``n_dp`` frame pairs, anchors z-slab
    sharded over ``sp``.  Returns a jitted function

        step(state, adam, lr_values, z1[B], z2[B], gt1[B,H,W,3],
             gt2[B,H,W,3], keys[B,2], mode) -> (state, adam, metrics)
    """
    k = cfg.n_offsets
    # partial renders must use bg=0; background is added post-combine
    local_settings = RasterSettings(**{**settings.__dict__, "bg": 0.0})
    bg = settings.bg

    def _render_combined(st, z, key, mode, flip):
        r = render_frame(st, cfg, z, x_min, y_min, scale, local_settings,
                         window_cap, mode, key, flip=flip,
                         rasterizer=rasterizer)
        img, _ = combine_slab_renders(r.image, r.transmittance, flip, bg)
        return img, r

    def _pair_loss(params, aux_state, z1, z2, gt1, gt2, keys, mode):
        st = aux_state._replace(anchors=params[0], nets=params[1])
        ks = jax.random.split(keys, 4) if keys is not None else [None] * 4
        im1f, r1f = _render_combined(st, z1, ks[0], mode, False)
        im1b, r1b = _render_combined(st, z1, ks[1], mode, True)
        im2f, r2f = _render_combined(st, z2, ks[2], mode, False)
        im2b, r2b = _render_combined(st, z2, ks[3], mode, True)
        renders = (r1f, r1b, r2f, r2b)

        image1 = (im1f + im1b[:, :, ::-1]) / 2.0
        image2 = (im2f + im2b[:, :, ::-1]) / 2.0
        l1 = jnp.mean(jnp.abs(image1 - gt1)) + jnp.mean(jnp.abs(image2 - gt2))
        dssim = (1.0 - ssim(image1, gt1)) + (1.0 - ssim(image2, gt2))

        # local masked sums, combined over sp for exact global means
        def psum_mean(x, m):
            num = jax.lax.psum(jnp.sum(x * m), "sp")
            den = jax.lax.psum(jnp.sum(m), "sp")
            return num / jnp.maximum(den, 1.0)

        scaling_reg = sum(
            psum_mean(jnp.prod(r.scaling, axis=1),
                      r.selection_mask.astype(jnp.float32))
            for r in renders)
        opacity_reg = sum(
            psum_mean(1.0 - r.neural_opacity[:, 0],
                      jnp.repeat(r.in_window, k).astype(jnp.float32))
            for r in renders)

        loss = ((1.0 - opt.lambda_dssim) * l1 + opt.lambda_dssim * dssim
                + opt.scaling_reg * scaling_reg
                + opt.opacity_reg * opacity_reg)

        bpp = sum(jax.lax.pmean(r.rate.bit_per_param, "sp")
                  for r in renders)
        if mode in (GenerateMode.ENTROPY, GenerateMode.STE_ENTROPY):
            hash_bin = (ste_binary(st.nets.hash_table) + 1) / 2
            _, bit_hash, _, _ = binary_vxl_size(hash_bin)
            denom = jax.lax.psum(
                jnp.asarray(params[0].anchor.shape[0], jnp.float32), "sp") \
                * (cfg.feat_dim + 6 + 3 * k)
            loss = loss + opt.lmbda * (bpp + bit_hash / denom)
            loss = loss + opt.mask_reg * jax.lax.pmean(
                jnp.mean(jax.nn.sigmoid(params[0].mask)), "sp")

        ps = (psnr(image1, gt1) + psnr(image2, gt2)) / 2.0
        return loss, {"psnr": ps, "l1": l1, "bpp": bpp / 4.0}

    def _local_step(anchors, nets, n_active, bmin, bmax,
                    z1, z2, gt1, gt2, keys, mode):
        """Body run per device: one local frame pair, one local z-slab."""
        # dp-batched args arrive with local leading dim 1
        z1, z2 = z1[0], z2[0]
        gt1, gt2, keys = gt1[0], gt2[0], keys[0]
        aux_state = ModelState(anchors=anchors, nets=nets, n_active=n_active,
                               x_bound_min=bmin, x_bound_max=bmax)
        params = (anchors, nets)

        def loss_fn(p):
            return _pair_loss(p, aux_state, z1, z2, gt1, gt2, keys, mode)

        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)

        # gradient reductions: anchor grads live on their slab -> mean over
        # dp only; net grads are partial contributions -> sum over sp,
        # mean over dp
        g_anchors = jax.tree.map(lambda g: jax.lax.pmean(g, "dp"), grads[0])
        g_nets = jax.tree.map(
            lambda g: jax.lax.pmean(jax.lax.psum(g, "sp"), "dp"), grads[1])

        loss = jax.lax.pmean(loss, "dp")
        aux = jax.tree.map(lambda x: jax.lax.pmean(x, "dp"), aux)
        return (g_anchors, g_nets), loss, aux

    @functools.partial(jax.jit, static_argnames=("mode",))
    def spmd_step(state: ModelState, adam: AdamState, lr_values,
                  z1, z2, gt1, gt2, keys, mode: GenerateMode):
        f = shard_map(
            functools.partial(_local_step, mode=mode),
            mesh=mesh,
            in_specs=(P("sp"), P(), P(), P(), P(),
                      P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
            out_specs=((P("sp"), P()), P(), P()),
            check_vma=False,
        )
        grads, loss, aux = f(
            state.anchors, state.nets, state.n_active,
            state.x_bound_min, state.x_bound_max,
            z1, z2, gt1, gt2, keys)
        params = (state.anchors, state.nets)
        lr_tree = build_lr_tree(params, lr_values)
        new_params, adam = adam_update(params, grads, adam, lr_tree)
        new_state = state._replace(anchors=new_params[0], nets=new_params[1])
        metrics = {"loss": loss, **aux}
        return new_state, adam, metrics

    return spmd_step
