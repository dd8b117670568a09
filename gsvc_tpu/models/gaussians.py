"""Anchor-based gaussian video model — state pytrees + pure functions.

TPU re-design of the reference's ``GaussianModel`` (scene/gaussian_model.py,
2,803 LoC torch module).  Differences that matter:

  * state is an explicit pytree (``ModelState``) padded to a fixed anchor
    capacity; ``n_active`` marks the live prefix.  Densification rewrites
    the buffers host-side; every jitted function sees static shapes.
  * anchors are kept **z-sorted** over the active prefix.  Because anchor
    positions never move during optimization (position_lr == 0, reference
    arguments/__init__.py:148-149), sorting survives between densification
    events, and the Toast-like-Sliding-Window visibility test becomes a
    ``dynamic_slice`` of a contiguous z-band instead of a boolean gather
    (the reference round-trips through CUDA ``visible_filter`` instead,
    ortho_gaussian_renderer/preprocess.py:99-108).
  * the per-anchor gather of "visible" rows is replaced by masking within
    the fixed-size window; culled rows simply get zero opacity.
  * rate estimation runs over the whole visible window instead of a 5%
    random subsample (reference guassian.py:99) — same expectation, lower
    gradient variance, and no data-dependent shapes.

Reference symbol map (for parity checking):
  activations                scene/gaussian_model.py:641-704
  Mix3d2dEncoding            scene/gaussian_model.py:81-147
  calc_interp_feat           scene/gaussian_model.py:726-732
  calc_entropy_context       scene/gaussian_model.py:1569-1597
  generate_neural_gaussians  ortho_gaussian_renderer/guassian.py:134-310
  calc_sampled_rate          ortho_gaussian_renderer/guassian.py:73-132
  estimate_final_bits        scene/gaussian_model.py:1599-1725
"""

from __future__ import annotations

import dataclasses
import enum
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsvc_tpu.config import ModelConfig
from gsvc_tpu.models.mlps import (
    deform_mlp_apply, deform_mlp_init, entropy_params_net_apply,
    entropy_params_net_init, generator_net_apply, generator_net_init,
)
from gsvc_tpu.ops import (
    positional_embedder, quantize_anchor, ste_binary, ste_round,
    uniform_noise_quantize, gaussian_bits,
)
from gsvc_tpu.ops.hashgrid import (
    MixGridSpec, init_mix_grid_params, make_mix_grid_spec, mix_grid_encode,
)

# base quantization steps (reference: guassian.py:165-167)
Q_FEAT = 1.0
Q_SCALING = 0.001
Q_OFFSETS = 0.2


class GenerateMode(enum.IntEnum):
    """Phase-dependent treatment of anchor attributes
    (reference: guassian.py:21-27; honest spelling of the typo'd names)."""

    FULL_PRECISION = 0
    QUANTIZED_NOISE = 1
    ENTROPY = 2
    STE_ENTROPY = 3
    DECODED = 4


@dataclasses.dataclass(frozen=True)
class GaussianConfig:
    """Static model shape info derived from ModelConfig."""

    feat_dim: int
    n_offsets: int
    grid: MixGridSpec
    time_multi_res: int
    offset_multi_res: int
    threshold: float
    kernel_size: float
    ste_binary: bool = True
    hash_backend: str = "auto"

    @staticmethod
    def from_model_config(mc: ModelConfig) -> "GaussianConfig":
        grid = make_mix_grid_spec(
            n_features=mc.grid_feature_dim,
            resolutions_list=mc.resolutions_list,
            log2_hashmap_size=mc.log2,
            resolutions_list_2d=mc.resolutions_list_2D,
            log2_hashmap_size_2d=mc.log2_2D,
        )
        return GaussianConfig(
            feat_dim=mc.anchor_feature_dim,
            n_offsets=mc.n_offsets,
            grid=grid,
            time_multi_res=mc.time_multi_res,
            offset_multi_res=mc.offset_multi_res,
            threshold=mc.threshold,
            kernel_size=mc.kernel_size,
            ste_binary=mc.ste_binary,
            hash_backend=mc.hash_backend,
        )

    @property
    def pe_dim(self) -> int:
        return (1 + 2 * self.time_multi_res) + (1 + 2 * self.offset_multi_res)


class AnchorState(NamedTuple):
    """Per-anchor learnable tensors, padded to capacity N_max.

    Layout parity: _anchor [N,3], _anchor_feat [N,F], _offset [N,K,3],
    _mask [N,K,1], _scaling [N,6] (log; [:3]=offset scale, [3:]=gaussian
    scale), _rotation [N,4] frozen, _opacity [N,1] frozen
    (reference: scene/gaussian_model.py:754-800)."""

    anchor: jnp.ndarray
    feat: jnp.ndarray
    offset: jnp.ndarray
    mask: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray


class NetParams(NamedTuple):
    """All network parameters (trained with per-group LRs)."""

    hash_table: jnp.ndarray          # [rows, F] flat mix-grid table
    mlp_opacity: dict
    mlp_cov: dict
    mlp_color: dict
    mlp_deform: dict
    mlp_feature_enet: dict
    mlp_scaling_enet: dict
    mlp_offset_enet: dict


class ModelState(NamedTuple):
    anchors: AnchorState
    nets: NetParams
    n_active: jnp.ndarray            # int32 scalar — live anchor prefix
    x_bound_min: jnp.ndarray         # [1, 3]
    x_bound_max: jnp.ndarray         # [1, 3]


class EntropyContext(NamedTuple):
    """Outputs of the three entropy-parameter nets
    (reference: scene/gaussian_model.py:68-78)."""

    mean_feat: jnp.ndarray
    scale_feat: jnp.ndarray
    mean_scaling: jnp.ndarray
    scale_scaling: jnp.ndarray
    mean_offsets: jnp.ndarray
    scale_offsets: jnp.ndarray
    q_feat_adj: jnp.ndarray
    q_scaling_adj: jnp.ndarray
    q_offsets_adj: jnp.ndarray


class RatePack(NamedTuple):
    bit_per_param: jnp.ndarray
    bit_per_feat_param: jnp.ndarray
    bit_per_scaling_param: jnp.ndarray
    bit_per_offsets_param: jnp.ndarray
    # raw sums + denominators so sharded training can psum them and form
    # COUNT-WEIGHTED global rates (a pmean of per-slab ratios would weight
    # unbalanced z-slabs equally — a biased rate gradient)
    bits_total: jnp.ndarray = jnp.zeros(())
    params_total: jnp.ndarray = jnp.zeros(())


class GeneratedGaussians(NamedTuple):
    """Flattened per-gaussian arrays of one window, [V*K, ...]."""

    xyz: jnp.ndarray
    color: jnp.ndarray
    opacity: jnp.ndarray          # [V*K, 1] — <= 0 rows are culled
    scaling: jnp.ndarray
    rot: jnp.ndarray
    valid: jnp.ndarray            # [V*K] bool
    neural_opacity: jnp.ndarray   # [V*K, 1] pre-cull (for opacity_reg/stats)
    anchor_xyz: jnp.ndarray       # [V*K, 3] parent anchor position
    offsets_world: jnp.ndarray    # [V*K, 3] offset*scale (for optical loss)
    rate: RatePack


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def mean_nn3_distance(points: np.ndarray, sample: int = 4096) -> np.ndarray:
    """Mean squared distance to 3 nearest neighbors, per point.

    Replaces simple-knn ``distCUDA2`` (vendored simple-knn.zip; used at
    scene/gaussian_model.py:762,784 for scale init).  Exact 3-NN via a
    k-d tree: O(N log N) host-side, so the reference's 100k-anchor init
    takes well under a second (the previous tiled all-pairs scan was
    O(N^2) — minutes at 100k on a 1-core host)."""
    from scipy.spatial import cKDTree

    pts = np.asarray(points, np.float64)
    if pts.shape[0] <= 4:
        n = pts.shape[0]
        if n < 2:
            return np.full((n,), 1e-6, np.float32)
        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        d2.sort(axis=1)
        return d2[:, 1:min(4, n)].mean(axis=1).astype(np.float32)
    dist, _ = cKDTree(pts).query(pts, k=4, workers=-1)
    return (dist[:, 1:4] ** 2).mean(axis=1).astype(np.float32)


def init_model(key, cfg: GaussianConfig, points: np.ndarray, capacity: int,
               voxel_size: float = 0.001) -> ModelState:
    """Create a ModelState from an initial point cloud.

    Mirrors create_from_pcd (scene/gaussian_model.py:754-800): voxelize,
    zero offsets/feats, all-ones masks, scales from 3-NN distance,
    identity rotations, opacity logit of 0.1.  Anchors are z-sorted and
    the buffers padded to ``capacity``.
    """
    pts = np.unique(np.round(points / voxel_size), axis=0) * voxel_size
    pts = pts.astype(np.float32)
    n = pts.shape[0]
    if n > capacity:
        raise ValueError(f"capacity {capacity} < initial anchors {n}")

    order = np.argsort(pts[:, 2], kind="stable")
    pts = pts[order]

    dist2 = np.maximum(mean_nn3_distance(pts), 1e-7)
    scales = np.log(np.sqrt(dist2))[:, None].repeat(6, axis=1)

    k = cfg.n_offsets
    f = cfg.feat_dim

    def pad(x, fill=0.0):
        shape = (capacity,) + x.shape[1:]
        out = np.full(shape, fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    anchor = np.zeros((capacity, 3), np.float32)
    anchor[:n] = pts
    anchor[n:, 2] = 1e9  # padding sorts past every real z
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    opacity_logit = float(np.log(0.1 / 0.9))

    anchors = AnchorState(
        anchor=jnp.asarray(anchor),
        feat=pad(np.zeros((n, f), np.float32)),
        offset=pad(np.zeros((n, k, 3), np.float32)),
        mask=pad(np.ones((n, k, 1), np.float32)),
        scaling=pad(scales),
        rotation=pad(rots),
        opacity=pad(np.full((n, 1), opacity_logit, np.float32)),
    )

    keys = jax.random.split(key, 8)
    fd = cfg.feat_dim
    inner = fd * 2
    cond = cfg.pe_dim
    grid_out = cfg.grid.output_dim
    nets = NetParams(
        hash_table=init_mix_grid_params(keys[0], cfg.grid),
        mlp_opacity=generator_net_init(keys[1], fd, k, inner, cond),
        mlp_cov=generator_net_init(keys[2], fd, 7 * k, inner, cond),
        mlp_color=generator_net_init(keys[3], fd, 3 * k, inner, cond),
        mlp_deform=deform_mlp_init(keys[4], fd + cond, fd * 2, 3 * k),
        mlp_feature_enet=entropy_params_net_init(
            keys[5], grid_out, fd * 3, fd, fd),
        mlp_scaling_enet=entropy_params_net_init(
            keys[6], grid_out, fd * 2, fd, 6, layer=3),
        mlp_offset_enet=entropy_params_net_init(
            keys[7], grid_out, fd * 3, fd, 3 * k),
    )

    return ModelState(
        anchors=anchors, nets=nets,
        n_active=jnp.asarray(n, jnp.int32),
        x_bound_min=jnp.zeros((1, 3), jnp.float32),
        x_bound_max=jnp.ones((1, 3), jnp.float32),
    )


def update_anchor_bound(state: ModelState, x_lim, y_lim, z_lim,
                        bleed: float = 0.1) -> ModelState:
    """Set the learned-bounds box from dataset NDC extents + bleed
    (reference: scene/gaussian_model.py:706-724; limits are negative)."""
    lim = np.array([[x_lim, y_lim, z_lim]], np.float32) * (1 + bleed)
    return state._replace(x_bound_min=jnp.asarray(lim),
                          x_bound_max=jnp.asarray(-lim))


# ---------------------------------------------------------------------------
# Activations (decoded_version flips them off — gaussian_model.py:641-704)
# ---------------------------------------------------------------------------

def get_scaling(anchors: AnchorState, decoded: bool = False):
    return anchors.scaling if decoded else jnp.exp(anchors.scaling)


def get_mask(anchors: AnchorState, decoded: bool = False):
    """Differentiable binary gaussian mask: STE(sigmoid > 0.01).
    Forward is EXACTLY {0,1} (see ops/quant._ste on forward exactness)."""
    if decoded:
        return anchors.mask
    s = jax.nn.sigmoid(anchors.mask)
    hard = (s > 0.01).astype(s.dtype)
    return s - jax.lax.stop_gradient(s) + jax.lax.stop_gradient(hard)


def get_mask_anchor(anchors: AnchorState, decoded: bool = False):
    """[N] bool — anchor has at least one unmasked gaussian."""
    m = get_mask(anchors, decoded)
    return jax.lax.stop_gradient(jnp.sum(m[:, :, 0], axis=1) > 0)


def get_anchor(state: ModelState, decoded: bool = False):
    if decoded:
        return state.anchors.anchor
    return quantize_anchor(state.anchors.anchor, state.x_bound_min,
                           state.x_bound_max)


# ---------------------------------------------------------------------------
# Hash features + entropy context
# ---------------------------------------------------------------------------

def calc_interp_feat(state: ModelState, cfg: GaussianConfig, x,
                     decoded: bool = False):
    """Normalize to [0,1] by the learned bounds and run the mix grid."""
    xn = (x - state.x_bound_min) / (state.x_bound_max - state.x_bound_min)
    binarize = None
    if cfg.ste_binary and not decoded:
        binarize = ste_binary
    backend = cfg.hash_backend
    if backend == "auto":
        backend = ("xla" if jax.devices()[0].platform == "cpu"
                   else "lanegather")
    if backend == "lanegather":
        from gsvc_tpu.ops.pallas_hashgrid import mix_grid_encode_lanegather
        return mix_grid_encode_lanegather(state.nets.hash_table, xn,
                                          cfg.grid, binarize=binarize)
    return mix_grid_encode(state.nets.hash_table, xn, cfg.grid,
                           binarize=binarize)


def calc_entropy_context(state: ModelState, cfg: GaussianConfig, anchor,
                         decoded: bool = False) -> EntropyContext:
    feat_ctx = calc_interp_feat(state, cfg, anchor, decoded)
    m_f, s_f, qf = entropy_params_net_apply(state.nets.mlp_feature_enet,
                                            feat_ctx)
    m_s, s_s, qs = entropy_params_net_apply(state.nets.mlp_scaling_enet,
                                            feat_ctx)
    m_o, s_o, qo = entropy_params_net_apply(state.nets.mlp_offset_enet,
                                            feat_ctx)
    clip_exp = lambda v: jnp.exp(jnp.clip(v, -10.0, 10.0))
    floor = lambda v: jnp.maximum(v, 1e-9)
    return EntropyContext(
        mean_feat=m_f, scale_feat=floor(s_f),
        mean_scaling=m_s, scale_scaling=floor(s_s),
        mean_offsets=m_o, scale_offsets=floor(s_o),
        q_feat_adj=clip_exp(qf), q_scaling_adj=clip_exp(qs),
        q_offsets_adj=clip_exp(qo),
    )


# ---------------------------------------------------------------------------
# TSW visibility window
# ---------------------------------------------------------------------------

def slice_window(arr, start, cap: int):
    """dynamic_slice of rows [start, start+cap)."""
    return jax.lax.dynamic_slice_in_dim(arr, start, cap, axis=0)


def window_for_frame(state: ModelState, cfg: GaussianConfig, frame_z,
                     cap: int):
    """Compute (start, in_window mask [cap]) for a frame plane.

    Inactive/padding rows carry the z = 1e9 sentinel, so the z test alone
    excludes them — no dependence on ``n_active`` here, which keeps this
    correct when the anchor buffers are z-slab-sharded across devices."""
    z = state.anchors.anchor[:, 2]
    start = jnp.searchsorted(z, frame_z - cfg.threshold).astype(jnp.int32)
    start = jnp.clip(start, 0, max(z.shape[0] - cap, 0))
    zw = slice_window(z, start, cap)
    in_window = jnp.abs(zw - frame_z) <= cfg.threshold
    return start, in_window


# ---------------------------------------------------------------------------
# Neural gaussian generation
# ---------------------------------------------------------------------------

def _rate_from_context(cfg, feat, scaling, offsets, masks, ec: EntropyContext,
                       q_feat, q_scaling, q_offsets, in_window, mask_anchor,
                       feat_mean, scaling_mean, offset_mean) -> RatePack:
    """Window-wide rate estimate (replaces the reference's 5% random
    subsample, calc_sampled_rate guassian.py:73-132 — same expectation,
    lower variance, static shapes).

    The reference computes (avg bits over mask-surviving anchors) *
    mask_anchor_rate; algebraically that equals sum(bits over surviving
    anchors) / count(visible anchors), which is what we compute with the
    masks as weights.
    """
    k = cfg.n_offsets
    w = (in_window & mask_anchor).astype(jnp.float32)[:, None]   # [V, 1]
    n_vis = jnp.maximum(jnp.sum(in_window.astype(jnp.float32)), 1.0)

    bits_feat = gaussian_bits(feat, ec.mean_feat, ec.scale_feat, q_feat,
                              x_mean=feat_mean) * w
    bits_scaling = gaussian_bits(scaling, ec.mean_scaling, ec.scale_scaling,
                                 q_scaling, x_mean=scaling_mean) * w
    offsets_flat = offsets.reshape(-1, 3 * k)
    mask3 = jnp.repeat(masks, 3, axis=-1).reshape(-1, 3 * k)
    bits_offsets = gaussian_bits(offsets_flat, ec.mean_offsets,
                                 ec.scale_offsets, q_offsets,
                                 x_mean=offset_mean) * mask3 * w

    n_feat = n_vis * cfg.feat_dim
    n_scaling = n_vis * 6
    n_offsets_ = n_vis * 3 * k
    sum_feat = jnp.sum(bits_feat)
    sum_scaling = jnp.sum(bits_scaling)
    sum_offsets = jnp.sum(bits_offsets)
    bits_total = sum_feat + sum_scaling + sum_offsets
    params_total = n_feat + n_scaling + n_offsets_
    return RatePack(bit_per_param=bits_total / params_total,
                    bit_per_feat_param=sum_feat / n_feat,
                    bit_per_scaling_param=sum_scaling / n_scaling,
                    bit_per_offsets_param=sum_offsets / n_offsets_,
                    bits_total=bits_total, params_total=params_total)


def generate_neural_gaussians(
    state: ModelState, cfg: GaussianConfig, frame_z, cam_z,
    window_start, in_window, cap: int,
    mode: GenerateMode, key: Optional[jax.Array] = None,
    decoded: bool = False,
    entropy_ctx: Optional[EntropyContext] = None,
) -> GeneratedGaussians:
    """Produce per-gaussian splat inputs for one frame window.

    Parity with generate_neural_gaussians (guassian.py:134-310) with the
    gather-free static-shape formulation: culled gaussians keep their rows
    with opacity<=0 / valid=False.

    ``entropy_ctx``: optional precomputed EntropyContext for THIS window
    (the context is pointwise per anchor, so callers rendering several
    overlapping windows can slice one shared union query —
    render/batched.py pair path).
    """
    k = cfg.n_offsets
    anchors = state.anchors

    anchor_q = get_anchor(state, decoded)
    anchor_w = slice_window(anchor_q, window_start, cap)         # [V, 3]
    feat = slice_window(anchors.feat, window_start, cap)          # [V, F]
    grid_offsets = slice_window(anchors.offset, window_start, cap)
    grid_scaling = slice_window(get_scaling(anchors, decoded),
                                window_start, cap)                # [V, 6]
    binary_mask = slice_window(get_mask(anchors, decoded),
                               window_start, cap)                 # [V, K, 1]
    mask_anchor = slice_window(get_mask_anchor(anchors, decoded),
                               window_start, cap)                 # [V]

    # means used as the clamp centers of quantizers (detached, whole-model)
    feat_mean = jax.lax.stop_gradient(jnp.mean(anchors.feat))
    scaling_mean = jax.lax.stop_gradient(
        jnp.mean(get_scaling(anchors, decoded)))
    offset_mean = jax.lax.stop_gradient(jnp.mean(anchors.offset))

    rate = RatePack(*(jnp.zeros(()) for _ in range(4)))
    q_feat: jnp.ndarray | float = Q_FEAT
    q_scaling: jnp.ndarray | float = Q_SCALING
    q_offsets: jnp.ndarray | float = Q_OFFSETS

    if mode in (GenerateMode.FULL_PRECISION, GenerateMode.DECODED):
        pass
    elif mode == GenerateMode.QUANTIZED_NOISE:
        k1, k2, k3 = jax.random.split(key, 3)
        feat = uniform_noise_quantize(feat, q_feat, k1, x_mean=feat_mean)
        grid_scaling = uniform_noise_quantize(grid_scaling, q_scaling, k2,
                                              x_mean=scaling_mean)
        grid_offsets = uniform_noise_quantize(grid_offsets, q_offsets, k3,
                                              x_mean=offset_mean)
    elif mode in (GenerateMode.ENTROPY, GenerateMode.STE_ENTROPY):
        ec = entropy_ctx if entropy_ctx is not None else \
            calc_entropy_context(state, cfg, anchor_w, decoded)
        if mode == GenerateMode.ENTROPY:
            q_feat = Q_FEAT * ec.q_feat_adj
            q_scaling = Q_SCALING * ec.q_scaling_adj
            q_offsets = Q_OFFSETS * ec.q_offsets_adj
            k1, k2, k3 = jax.random.split(key, 3)
            feat = uniform_noise_quantize(feat, q_feat, k1, x_mean=feat_mean)
            grid_scaling = uniform_noise_quantize(
                grid_scaling, q_scaling, k2, x_mean=scaling_mean)
            grid_offsets = uniform_noise_quantize(
                grid_offsets, q_offsets[:, :, None], k3, x_mean=offset_mean)
        else:
            sg = jax.lax.stop_gradient
            q_feat = Q_FEAT * sg(ec.q_feat_adj)
            q_scaling = Q_SCALING * sg(ec.q_scaling_adj)
            q_offsets = Q_OFFSETS * sg(ec.q_offsets_adj)
            feat = sg(ste_round(feat, q_feat, feat_mean))
            grid_scaling = sg(ste_round(grid_scaling, q_scaling,
                                        scaling_mean))
            grid_offsets = sg(ste_round(grid_offsets, q_offsets[:, :, None],
                                        offset_mean))
        rate = _rate_from_context(
            cfg, feat, grid_scaling, grid_offsets, binary_mask[:, :, 0], ec,
            q_feat, q_scaling, q_offsets,  # [V,1] broadcasts against [V,3K]
            in_window=in_window, mask_anchor=mask_anchor,
            feat_mean=feat_mean, scaling_mean=scaling_mean,
            offset_mean=offset_mean)
    else:
        raise ValueError(f"unknown mode {mode}")

    # conditions: embed(cam_z) and embed(anchor_z - cam_z)
    embed_time, _ = positional_embedder(cfg.time_multi_res, 1)
    embed_z, _ = positional_embedder(cfg.offset_multi_res, 1)
    abs_z = jnp.full_like(anchor_w[:, 2:], cam_z)
    ob_z = anchor_w[:, 2:] - cam_z
    pe = jnp.concatenate([embed_time(abs_z), embed_z(ob_z)], axis=-1)

    v = cap
    neural_opacity = generator_net_apply(
        state.nets.mlp_opacity, feat, pe, out_act=jnp.tanh)     # [V, K]
    neural_opacity = neural_opacity.reshape(v * k, 1)
    neural_opacity = neural_opacity * binary_mask.reshape(v * k, 1)
    g_valid = (neural_opacity[:, 0] > 0.0) \
        & jnp.repeat(in_window, k, axis=0)

    color = generator_net_apply(
        state.nets.mlp_color, feat, pe, out_act=jax.nn.sigmoid)
    color = color.reshape(v * k, 3)

    scale_rot = generator_net_apply(state.nets.mlp_cov, feat, pe)
    scale_rot = scale_rot.reshape(v * k, 7)

    deform_in = jnp.concatenate([feat, pe], axis=-1)
    neural_offset = deform_mlp_apply(state.nets.mlp_deform, deform_in)
    neural_offset = neural_offset.reshape(v * k, 3)

    offsets = grid_offsets.reshape(v * k, 3) + neural_offset
    offset_scale = jnp.repeat(grid_scaling[:, :3], k, axis=0)    # [V*K, 3]
    gauss_scale_base = jnp.repeat(grid_scaling[:, 3:], k, axis=0)
    anchor_rep = jnp.repeat(anchor_w, k, axis=0)

    scaling_g = gauss_scale_base * jax.nn.sigmoid(scale_rot[:, :3])
    rot_g = scale_rot[:, 3:7] / jnp.linalg.norm(
        scale_rot[:, 3:7], axis=-1, keepdims=True).clip(1e-12)

    offsets_world = offsets * offset_scale
    xyz = anchor_rep + offsets_world
    xyz = jnp.clip(xyz, state.x_bound_min, state.x_bound_max)

    return GeneratedGaussians(
        xyz=xyz, color=color,
        opacity=jnp.where(g_valid[:, None], neural_opacity, 0.0),
        scaling=scaling_g, rot=rot_g, valid=g_valid,
        neural_opacity=neural_opacity,
        anchor_xyz=anchor_rep, offsets_world=offsets_world,
        rate=rate,
    )
