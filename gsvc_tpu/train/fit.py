"""GOP fitting orchestration: the host loop around the fused train step.

Replaces pipeline/train.py:267-605 (training loop) with a TPU execution
model: the device runs one compiled step per iteration; the host only
samples frame pairs, feeds learning rates, and every ``update_interval``
iterations pulls the state back for densification + z-resort + repad.

Capacity management: anchor buffers are padded; when densification
approaches the pad, capacity grows by 1.5x and the step recompiles once
(padded capacity + re-jit epochs, SURVEY.md §7).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsvc_tpu.config import Config
from gsvc_tpu.framecube import FrameCubeDataset, init_point_cloud
from gsvc_tpu.models.gaussians import (
    AnchorState, GaussianConfig, GenerateMode, ModelState, init_model,
    update_anchor_bound,
)
from gsvc_tpu.render.pipeline import make_raster_settings, render_frame_averaged
from gsvc_tpu.train.controller import TrainingController
from gsvc_tpu.train.densify import adjust_anchors, resort_by_z
from gsvc_tpu.train.optim import AdamState, adam_init
from gsvc_tpu.train.schedules import build_schedules
from gsvc_tpu.train.trainer import (
    TrainStats, init_stats, make_train_multi_step, make_train_step,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def compute_window_cap(z_sorted: np.ndarray, n_active: int,
                       frame_zs: np.ndarray, threshold: float,
                       headroom: float = 1.5, quantum: int = 512) -> int:
    """Smallest padded capacity covering the largest TSW band."""
    z = z_sorted[:n_active]
    max_band = 1
    for fz in frame_zs:
        lo = np.searchsorted(z, fz - threshold)
        hi = np.searchsorted(z, fz + threshold, side="right")
        max_band = max(max_band, hi - lo)
    cap = _round_up(int(max_band * headroom) + 8, quantum)
    # never exceed the physical buffer length
    return max(1, min(cap, _round_up(max(n_active, 1), quantum),
                      len(z_sorted)))


@dataclass
class FitReport:
    iterations: int = 0
    psnr: float = 0.0
    loss: float = 0.0
    bit_per_param: float = 0.0
    n_active: int = 0
    history: list = field(default_factory=list)


class GOPFitter:
    """Fits one frame cube (= encodes one GOP).

    ``mesh``: optional jax.sharding.Mesh with (dp, sp) axes — the fit then
    runs the SPMD train step (parallel/spmd.py): anchors z-slab-sharded
    over sp, a different frame pair per dp group per iteration, and
    densification as host re-shard epochs.  Everything else (schedule
    phases, eval, checkpoints, the codec feed) is identical."""

    def __init__(self, cfg: Config, dataset: FrameCubeDataset,
                 seed: int = 0, log_fn: Optional[Callable] = None,
                 mesh=None):
        self.cfg = cfg
        self.dataset = dataset
        self.gcfg = GaussianConfig.from_model_config(cfg.model)
        self.log = log_fn or (lambda *a, **k: None)
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.mesh = mesh
        self.n_dp = mesh.shape["dp"] if mesh is not None else 1
        self.n_sp = mesh.shape["sp"] if mesh is not None else 1

        opt = cfg.optimization
        pts = init_point_cloud(dataset.x_min, dataset.y_min, dataset.z_min,
                               n=opt.init_anchor_num, rng=self.rng)
        self.capacity = _round_up(
            _round_up(int(opt.init_anchor_num * 1.5), 1024), self.n_sp)
        self.key, k0 = jax.random.split(self.key)
        self.state = init_model(k0, self.gcfg, pts, self.capacity,
                                voxel_size=cfg.model.voxel_size)
        self.voxel_size = self._resolve_voxel_size(pts, cfg.model.voxel_size)
        self.state = update_anchor_bound(
            self.state, dataset.x_min, dataset.y_min, dataset.z_min)

        self.frame_zs = np.array([
            (i - dataset.num_frames / 2) / dataset.scale
            for i in range(dataset.num_frames)], np.float32)

        self.window_cap = compute_window_cap(
            np.asarray(self.state.anchors.anchor[:, 2]),
            int(self.state.n_active), self.frame_zs, self.gcfg.threshold)
        if mesh is not None:
            # under sp-sharding each device windows its LOCAL z-slab
            self.window_cap = min(self.window_cap,
                                  self.capacity // self.n_sp)
            from gsvc_tpu.parallel.spmd import (
                shard_adam_state, shard_model_state, shard_train_stats,
            )
            self._shard_model_state = shard_model_state
            self._shard_adam_state = shard_adam_state
            self._shard_train_stats = shard_train_stats
            self.state = shard_model_state(self.state, mesh)

        bg = 1.0 if cfg.model.white_background else 0.0
        self.settings = make_raster_settings(
            self.gcfg, dataset.height, dataset.width,
            tile_h=cfg.pipeline.tile_h, tile_w=cfg.pipeline.tile_w,
            gaussian_cap=cfg.pipeline.visible_capacity or 1024,
            chunk=cfg.pipeline.gaussian_chunk,
            copy_budget_factor=cfg.pipeline.copy_budget_factor, bg=bg,
            matmul_dtype=cfg.pipeline.matmul_dtype)

        self._overflow_strikes = 0
        self.schedules = build_schedules(opt, spatial_lr_scale=1.0,
                                         ste_binary=cfg.model.ste_binary)
        params = (self.state.anchors, self.state.nets)
        self.adam = adam_init(params)
        self.stats = init_stats(self.capacity, self.gcfg.n_offsets)
        if mesh is not None:
            self.adam = self._shard_adam_state(self.adam, mesh)
            self.stats = self._shard_train_stats(self.stats, mesh)
        self.controller = TrainingController(opt)
        self._build_step()

        # preload frames/flows on device once (HBM resident across steps);
        # channel-FIRST [T, 3, H, W] — W on the lane dim (see splat.py).
        # Stored uint8 / int8+scale: a 600-frame 1080p GOP is 30 GB as
        # fp32 pairs — over the 16 GB v5e HBM — but ~6 GB as (u8 frames,
        # int8 flows).  PNG sources are exactly representable in uint8; the
        # jitted step casts to f32 on device (trainer._gt_f32).
        # per-frame conversion: one 15 GB whole-stack round/transpose is
        # cache-hostile (~10 min on this 1-core host); frame-at-a-time
        # stays in cache (~1 min for 600x1080p)
        t_n, h, w = (self.dataset.images.shape[0], dataset.height,
                     dataset.width)
        self.log(f"uploading {t_n} frames + flows to device "
                 f"({t_n * 3 * h * w / 2**30:.1f} GB u8 + flows int8)...")
        img8 = np.empty((t_n, 3, h, w), np.uint8)
        u8_src = getattr(dataset, "images_u8", None)
        for i in range(t_n):
            if u8_src is not None:          # disk-cache fast path (exact)
                img8[i] = np.transpose(u8_src[i], (2, 0, 1))
                continue
            f8 = np.clip(np.round(self.dataset.images[i] * 255.0), 0, 255
                         ).astype(np.uint8)
            img8[i] = np.transpose(f8, (2, 0, 1))
        self.images = jnp.asarray(img8)
        flows_raw = getattr(dataset, "flows_raw", None)
        if flows_raw is None and self.dataset.flows is not None:
            flows_raw = np.asarray(self.dataset.flows)
        if flows_raw is not None:
            # int8 + per-frame scale: 2.5 GB HBM saved vs bf16 at 1080p
            # x 599 frames (~0.1 px quantization error — below flow-
            # estimator noise; the two RESOURCE_EXHAUSTED crashes at the
            # iter-5000 program flip were HBM-headroom failures)
            fr = np.asarray(flows_raw, np.float32)
            s = np.maximum(np.abs(fr).reshape(fr.shape[0], -1).max(axis=1)
                           / 127.0, 1e-6).astype(np.float32)
            q = np.clip(np.round(fr / s[:, None, None, None]),
                        -127, 127).astype(np.int8)
            self.flows = (jnp.asarray(q),
                          jnp.asarray(s[:, None, None, None]))
        else:
            f_n = max(dataset.num_frames - 1, 1)
            self.flows = (jnp.zeros((f_n, 2, dataset.height,
                                     dataset.width), jnp.int8),
                          jnp.ones((f_n, 1, 1, 1), jnp.float32))
        self.log("frame/flow stacks uploaded")

    def _resolve_voxel_size(self, pts, voxel_size):
        if voxel_size > 0:
            return voxel_size
        from gsvc_tpu.models.gaussians import mean_nn3_distance
        return float(np.median(mean_nn3_distance(pts.astype(np.float32))))

    def _build_step(self):
        d = self.dataset
        # pallas kernels only on real TPU (interpret mode is for tests)
        rasterizer = self.cfg.pipeline.rasterizer or ("pallas_train" if (
            self.cfg.pipeline.use_pallas
            and jax.default_backend() == "tpu") else "jnp")
        if self.mesh is not None:
            from gsvc_tpu.parallel.spmd import make_spmd_train_step

            # slab-overlap bound for the log-T exchange: the GLOBAL max
            # window band (unclamped) tells how many consecutive slabs a
            # frame's window can intersect
            global_band = compute_window_cap(
                np.asarray(self.state.anchors.anchor[:, 2]),
                int(self.state.n_active), self.frame_zs,
                self.gcfg.threshold)
            slab_rows = self.capacity // self.n_sp
            neighbors = min(self.n_sp - 1, -(-global_band // slab_rows))
            self.train_step = make_spmd_train_step(
                self.gcfg, self.settings, self.window_cap,
                self.cfg.optimization, width=d.width, height=d.height,
                scale=d.scale, x_min=d.x_min, y_min=d.y_min,
                mesh=self.mesh, rasterizer=rasterizer,
                overlap_neighbors=neighbors)
        else:
            self.train_step = make_train_step(
                self.gcfg, self.settings, self.window_cap,
                self.cfg.optimization, width=d.width, height=d.height,
                scale=d.scale, x_min=d.x_min, y_min=d.y_min,
                rasterizer=rasterizer)
            self.train_multi_step = make_train_multi_step(
                self.gcfg, self.settings, self.window_cap,
                self.cfg.optimization, width=d.width, height=d.height,
                scale=d.scale, x_min=d.x_min, y_min=d.y_min,
                rasterizer=rasterizer)

    def _lr_values(self, it: int) -> Dict[str, float]:
        return {name: sched(it) for name, sched in self.schedules.items()}

    def _step_with_retry(self, *args, **kw):
        return self._dispatch_with_retry(self.train_step, *args, **kw)

    def _dispatch_with_retry(self, fn, *args, **kw):
        """The axon tunnel's remote-compile RPC occasionally drops large
        programs mid-transfer; compile failures happen BEFORE buffer
        donation, so retrying is safe (a post-donation failure raises a
        deleted-buffer error on retry and propagates)."""
        for attempt in range(4):
            try:
                return fn(*args, **kw)
            except Exception as e:  # jax.errors.JaxRuntimeError etc.
                msg = str(e)
                transient = ("remote_compile" in msg or "read body" in msg
                             or "UNAVAILABLE" in msg
                             or "Connection reset" in msg)
                if not transient or attempt == 3:
                    raise
                self.log(f"transient compile/RPC failure "
                         f"(attempt {attempt + 1}/4): {msg[:160]} — "
                         f"retrying in 20s")
                time.sleep(20)

    # -- densification bridge ---------------------------------------------
    def _maybe_resize_window(self, z_sorted: np.ndarray, n_active: int
                             ) -> bool:
        """Grow OR SHRINK the padded TSW window to match the current
        anchor density.  After heavy pruning a high-water window pays
        generation + gather cost for dead rows every step (round-2
        verdict item 8) — shrink when the needed band drops below half
        the current cap (hysteresis avoids re-jit thrash)."""
        new_window = compute_window_cap(z_sorted, n_active, self.frame_zs,
                                        self.gcfg.threshold)
        if self.mesh is not None:
            new_window = min(new_window, self.capacity // self.n_sp)
        if new_window > self.window_cap or \
                new_window <= self.window_cap // 2:
            old = self.window_cap
            self.window_cap = new_window
            self.log(f"window_cap {old} -> {new_window} (re-jit)")
            return True
        return False

    def _densify_spmd(self):
        from gsvc_tpu.parallel.spmd import spmd_densify_epoch

        opt = self.cfg.optimization
        if opt.auto_densify_threshold and not getattr(
                self, "_threshold_calibrated", False):
            from gsvc_tpu.train.calibrate import calibrate_densify_threshold

            n = int(self.state.n_active)
            k = self.gcfg.n_offsets
            stats_h = {
                "offset_gradient_accum": np.asarray(
                    self.stats.offset_gradient_accum)[:n * k],
                "offset_denom": np.asarray(self.stats.offset_denom)[:n * k],
            }
            opt.densify_grad_threshold = calibrate_densify_threshold(
                stats_h, opt, opt.densify_target_fraction)
            self._threshold_calibrated = True

        self.state, self.adam, self.stats, res, cap = spmd_densify_epoch(
            self.state, self.adam, self.stats, self.mesh, self.cfg.model,
            opt, self.voxel_size, self.rng, self.gcfg.n_offsets,
            capacity=self.capacity)
        recompiled = cap != self.capacity
        self.capacity = cap
        z = np.asarray(self.state.anchors.anchor[:, 2])
        if self._maybe_resize_window(z, res.n_active) or recompiled:
            self._build_step()
        return res

    def _densify(self):
        if self.mesh is not None:
            return self._densify_spmd()
        if self.cfg.pipeline.device_densify:
            return self._densify_device()
        n = int(self.state.n_active)
        k = self.gcfg.n_offsets
        anchors = {f: np.asarray(getattr(self.state.anchors, f))[:n].copy()
                   for f in AnchorState._fields}
        m_a, v_a = self.adam.m[0], self.adam.v[0]
        adam_m = {f: np.asarray(getattr(m_a, f))[:n].copy()
                  for f in AnchorState._fields}
        adam_v = {f: np.asarray(getattr(v_a, f))[:n].copy()
                  for f in AnchorState._fields}
        stats = {
            "opacity_accum": np.asarray(self.stats.opacity_accum)[:n].copy(),
            "anchor_demon": np.asarray(self.stats.anchor_demon)[:n].copy(),
            "offset_gradient_accum": np.asarray(
                self.stats.offset_gradient_accum)[:n * k].copy(),
            "offset_denom": np.asarray(self.stats.offset_denom)[:n * k].copy(),
        }

        opt = self.cfg.optimization
        if opt.auto_densify_threshold and not getattr(
                self, "_threshold_calibrated", False):
            from gsvc_tpu.train.calibrate import calibrate_densify_threshold

            new_thr = calibrate_densify_threshold(
                stats, opt, opt.densify_target_fraction)
            self.log(f"densify threshold calibrated: "
                     f"{opt.densify_grad_threshold:.6f} -> {new_thr:.6f} "
                     f"(target fraction {opt.densify_target_fraction})")
            opt.densify_grad_threshold = new_thr
            self._threshold_calibrated = True

        res = adjust_anchors(anchors, adam_m, adam_v, stats, self.cfg.model,
                             self.cfg.optimization, self.voxel_size, self.rng)
        resort_by_z(anchors, adam_m, adam_v, stats, k)

        n_new = res.n_active
        recompiled = False
        if n_new > self.capacity:
            self.capacity = _round_up(int(n_new * 1.5), 1024)
            recompiled = True

        def pad_to(x, cap, fill=0.0):
            out = np.full((cap,) + x.shape[1:], fill, np.float32)
            out[:x.shape[0]] = x
            return jnp.asarray(out)

        cap = self.capacity
        anchor_pad = np.full((cap, 3), 0.0, np.float32)
        anchor_pad[:n_new] = anchors["anchor"]
        anchor_pad[n_new:, 2] = 1e9
        new_anchors = AnchorState(
            anchor=jnp.asarray(anchor_pad),
            feat=pad_to(anchors["feat"], cap),
            offset=pad_to(anchors["offset"], cap),
            mask=pad_to(anchors["mask"], cap),
            scaling=pad_to(anchors["scaling"], cap),
            rotation=pad_to(anchors["rotation"], cap),
            opacity=pad_to(anchors["opacity"], cap),
        )
        new_m = self.adam.m[0]._replace(**{
            f: pad_to(adam_m[f], cap) for f in AnchorState._fields})
        new_v = self.adam.v[0]._replace(**{
            f: pad_to(adam_v[f], cap) for f in AnchorState._fields})

        self.state = self.state._replace(
            anchors=new_anchors, n_active=jnp.asarray(n_new, jnp.int32))
        self.adam = AdamState(m=(new_m, self.adam.m[1]),
                              v=(new_v, self.adam.v[1]), step=self.adam.step)
        self.stats = TrainStats(
            opacity_accum=pad_to(stats["opacity_accum"], cap),
            anchor_demon=pad_to(stats["anchor_demon"], cap),
            offset_gradient_accum=pad_to(stats["offset_gradient_accum"],
                                         cap * k),
            offset_denom=pad_to(stats["offset_denom"], cap * k),
        )

        if self._maybe_resize_window(anchor_pad[:, 2], n_new):
            recompiled = True
        if recompiled:
            self._build_step()
        return res

    def _densify_device(self):
        """Index-plan densify epoch: the host pulls only the small
        decision planes (~10 MB at 100k anchors vs ~90 MB for the host
        path), computes the grow/prune/z-sort plan, and a jitted device
        program applies it with gathers (train/densify_plan.py).
        Bit-exact vs the host path (tests/test_densify_plan.py)."""
        from gsvc_tpu.train.densify_plan import apply_plan, build_plan

        n = int(self.state.n_active)
        k = self.gcfg.n_offsets
        stats = {
            "opacity_accum": np.asarray(self.stats.opacity_accum[:n]),
            "anchor_demon": np.asarray(self.stats.anchor_demon[:n]),
            "offset_gradient_accum": np.asarray(
                self.stats.offset_gradient_accum[:n * k]),
            "offset_denom": np.asarray(self.stats.offset_denom[:n * k]),
        }

        opt = self.cfg.optimization
        if opt.auto_densify_threshold and not getattr(
                self, "_threshold_calibrated", False):
            from gsvc_tpu.train.calibrate import calibrate_densify_threshold

            new_thr = calibrate_densify_threshold(
                stats, opt, opt.densify_target_fraction)
            self.log(f"densify threshold calibrated: "
                     f"{opt.densify_grad_threshold:.6f} -> {new_thr:.6f} "
                     f"(target fraction {opt.densify_target_fraction})")
            opt.densify_grad_threshold = new_thr
            self._threshold_calibrated = True

        offsets_flat = self.state.anchors.offset.reshape(-1, 3)

        def fetch_offsets(idx):
            # PAD the gather index to a quantum: a raw variable-length
            # take would compile a fresh remote program every densify
            # epoch (candidate count changes each time) — measured as
            # the bulk of the ~20 s/epoch densify overhead.  Bounded
            # shapes hit the compile cache after the first epoch.
            idx = np.asarray(idx, np.int64)
            pad_n = max(65_536, _round_up(max(idx.size, 1), 65_536))
            idxp = np.zeros(pad_n, np.int32)
            idxp[:idx.size] = idx
            out = np.asarray(jnp.take(offsets_flat, jnp.asarray(idxp),
                                      axis=0))
            return out[:idx.size]

        plan = build_plan(
            anchor=np.asarray(self.state.anchors.anchor[:n]),
            scaling=np.asarray(self.state.anchors.scaling[:n]),
            stats=stats,
            fetch_offsets=fetch_offsets,
            mc=self.cfg.model, opt=opt, voxel_size=self.voxel_size,
            rng=self.rng, capacity=self.capacity)

        new_anchors, new_m, new_v, new_stats = apply_plan(
            plan, self.state.anchors, self.adam.m[0], self.adam.v[0],
            self.stats)
        recompiled = plan.capacity_out != self.capacity
        self.capacity = plan.capacity_out
        self.state = self.state._replace(
            anchors=new_anchors,
            n_active=jnp.asarray(plan.result.n_active, jnp.int32))
        self.adam = AdamState(m=(new_m, self.adam.m[1]),
                              v=(new_v, self.adam.v[1]),
                              step=self.adam.step)
        self.stats = new_stats

        if self._maybe_resize_window(plan.z_full, plan.result.n_active):
            recompiled = True
        if recompiled:
            self._build_step()
        return plan.result

    # -- overflow reaction -------------------------------------------------
    MAX_GAUSSIAN_CAP = 4096
    MAX_TILES_PER_GAUSSIAN = 128

    def _react_to_overflow(self, overflow: int, it: int,
                           strikes_to_act: int = 2,
                           num_rendered: int = -1,
                           harmful: int = -1):
        """Tile-capacity overflow drops gaussians from the render
        (splat.py:_bin_gaussians).  Growth reacts to HARMFUL overflow
        (drops at tiles whose final transmittance is still >= 1/255 —
        splat.tile_harmful_overflow): drops behind saturated pixels are
        invisible, and growing gaussian_cap for them multiplies the
        [tiles, cap] binning/gather HBM traffic for nothing (the
        round-3 flagship sat at cap 4096 with 1-3M harmless drops/step).
        ``harmful < 0`` = metric unavailable (old checkpoints); falls
        back to treating all overflow as potentially harmful.
        Symmetrically, once scaling_reg has shrunk the gaussians a
        previously grown cap wastes compositing work forever — shrink it
        back when tiles run persistently near-empty."""
        effective = overflow if harmful < 0 else harmful
        if effective <= 0:
            self._overflow_strikes = 0
            if overflow > 0 and it % 1000 == 0:
                self.log(f"iter {it}: overflow={overflow} all at "
                         f"saturated tiles (harmful=0) — no quality "
                         f"impact, capacities unchanged")
            s = self.settings
            base_cap = self.cfg.pipeline.visible_capacity or 1024
            base_tpg = 32
            if (num_rendered >= 0 and s.gaussian_cap > base_cap
                    and s.gaussian_cap > 2 * s.chunk):
                avg_fill = num_rendered / (4.0 * s.n_tiles)
                if avg_fill < s.gaussian_cap / 4:
                    self._underfill_strikes = getattr(
                        self, "_underfill_strikes", 0) + 1
                    if self._underfill_strikes >= 5:
                        new_cap = max(base_cap, s.gaussian_cap // 2,
                                      2 * s.chunk)
                        # shrink the copy budget with the fill: a grown
                        # tiles_per_gaussian keeps the binning sort
                        # (m * t_max keys) oversized forever otherwise
                        new_tpg = max(base_tpg, s.tiles_per_gaussian // 2)
                        base_cbf = self.cfg.pipeline.copy_budget_factor
                        new_cbf = (max(base_cbf, s.copy_budget_factor // 2)
                                   if s.copy_budget_factor else 0)
                        import dataclasses
                        self.settings = dataclasses.replace(
                            s, gaussian_cap=new_cap,
                            tiles_per_gaussian=new_tpg,
                            copy_budget_factor=new_cbf)
                        self._build_step()
                        self._underfill_strikes = 0
                        self.log(f"iter {it}: tile fill {avg_fill:.0f} << "
                                 f"cap {s.gaussian_cap}; shrinking "
                                 f"gaussian_cap -> {new_cap}, "
                                 f"tiles_per_gaussian -> {new_tpg} "
                                 f"(re-jit)")
                        return True
                else:
                    self._underfill_strikes = 0
            return False
        self._overflow_strikes += 1
        if self._overflow_strikes < strikes_to_act:
            return False
        if not self.cfg.pipeline.overflow_autogrow:
            if self._overflow_strikes == strikes_to_act:
                self.log(f"iter {it}: WARNING render overflow={overflow} "
                         f"(autogrow disabled; drops heal as footprints "
                         f"shrink)")
            return False
        s = self.settings
        new_cap = min(s.gaussian_cap * 2, self.MAX_GAUSSIAN_CAP)
        new_tpg = min(s.tiles_per_gaussian * 2, self.MAX_TILES_PER_GAUSSIAN)
        # a compacted copy budget (copy_budget_factor) can also be the
        # overflowing capacity: double it toward tiles_per_gaussian (at
        # factor >= t_max the compact path degenerates to the exact
        # padded stream, so budget drops become structurally impossible
        # and the at-max "harmless" analysis below stays valid)
        new_cbf = (min(s.copy_budget_factor * 2, new_tpg)
                   if s.copy_budget_factor else 0)
        if (new_cap == s.gaussian_cap and new_tpg == s.tiles_per_gaussian
                and new_cbf == s.copy_budget_factor):
            # capacities already at max and drops are still HARMFUL
            # (reaching here means effective > 0 — with the harmful
            # metric wired this is measured, not derived; the round-3
            # "T < e^-16 => harmless" claim was empirically false for
            # tiles barely above the cap: validate_overflow.py cap sweep
            # found +0.6 dB tile loss at cap 4096)
            self.log(f"iter {it}: WARNING render overflow={overflow} "
                     f"(harmful={harmful if harmful >= 0 else 'n/a'}) "
                     f"persists at max capacities "
                     f"(gaussian_cap={s.gaussian_cap}); output quality "
                     f"may be degraded at the affected tiles")
            self._overflow_strikes = 0
            return False
        import dataclasses
        self.settings = dataclasses.replace(
            s, gaussian_cap=new_cap, tiles_per_gaussian=new_tpg,
            copy_budget_factor=new_cbf)
        self._build_step()
        self._overflow_strikes = 0
        self.log(f"iter {it}: WARNING render overflow={overflow} "
                 f"(harmful={harmful if harmful >= 0 else 'n/a'}); growing "
                 f"gaussian_cap {s.gaussian_cap}->{new_cap}, "
                 f"tiles_per_gaussian {s.tiles_per_gaussian}->{new_tpg}"
                 + (f", copy_budget_factor {s.copy_budget_factor}->"
                    f"{new_cbf}" if s.copy_budget_factor else "")
                 + " (re-jit)")
        return True

    # -- model snapshots (reference: FrameCube.save, frame_cube.py:151-154)
    def save_snapshot(self, out_dir: str):
        """point_cloud.ply + networks pickle — the mid-training artifact
        family (save_ply / save_mlp_checkpoints)."""
        import pathlib
        import pickle

        from gsvc_tpu.models.gaussians import AnchorState
        from gsvc_tpu.utils.ply import save_gaussian_ply

        p = pathlib.Path(out_dir)
        p.mkdir(parents=True, exist_ok=True)
        n = int(self.state.n_active)
        anchors = {f: np.asarray(getattr(self.state.anchors, f))[:n]
                   for f in AnchorState._fields}
        save_gaussian_ply(str(p / "point_cloud.ply"), anchors)
        nets_host = jax.tree.map(np.asarray, self.state.nets._asdict())
        with open(p / "networks.pkl", "wb") as f:
            pickle.dump(nets_host, f)

    # -- main loop ---------------------------------------------------------
    def _iter_flags(self, it: int):
        """(mode, do_stats, adjust_anchor) at loop iteration ``it`` — the
        controller is a pure function of its counter, so chunk planning
        can look ahead without touching ``self.controller``."""
        c = TrainingController(self.cfg.optimization)
        c.current_iteration = it
        return c.render_mode, c.gaussian_statis, c.gaussian_adjust_anchor

    def _chunk_len(self, it0: int, total: int, log_every: int,
                   eval_every: int, checkpoint_iterations,
                   rate_log_every: int, max_chunk: int) -> int:
        """Longest run of iterations starting at ``it0`` that one device
        dispatch can cover: constant (mode, do_stats) and no host event
        (densify / log / eval / checkpoint / rate telemetry) before the
        last included iteration."""
        mode0, stats0, _ = self._iter_flags(it0)
        if mode0 is None:
            return 1
        k = 1
        while k < max_chunk and it0 + k <= total:
            prev = it0 + k - 1  # would become an interior iteration
            _, _, adj = self._iter_flags(prev)
            if adj:
                break
            if log_every and prev % log_every == 0:
                break
            if eval_every and prev % eval_every == 0:
                break
            if prev in checkpoint_iterations:
                break
            if rate_log_every and prev % rate_log_every == 0:
                break
            mode_n, stats_n, _ = self._iter_flags(it0 + k)
            if mode_n is not mode0 or stats_n != stats0:
                break
            k += 1
        return k

    def fit(self, iterations: Optional[int] = None,
            eval_every: int = 0, log_every: int = 100,
            rate_log_every: int = 0,
            checkpoint_iterations: tuple = (),
            checkpoint_dir: Optional[str] = None,
            metrics_writer=None) -> FitReport:
        opt = self.cfg.optimization
        total = iterations if iterations is not None else opt.iterations
        report = FitReport()
        t0 = time.time()
        n_frames = self.dataset.num_frames

        spd = self.cfg.pipeline.steps_per_dispatch
        if spd == 0:  # auto: amortize tunnel RPC on real TPU
            spd = (log_every or 100) if (
                self.mesh is None and jax.default_backend() == "tpu") else 1
        use_multi = spd > 1 and self.mesh is None

        # resume-aware: a restored checkpoint leaves the controller at the
        # checkpoint iteration; the loop counter MUST continue from there
        # (absolute iteration numbers drive the LR schedules, the phase
        # controller, chunk planning, and checkpoint/log labels — a loop
        # restarted at 1 would replay the LR warmup against a mid-fit
        # controller and over-run the schedule by another `total`).
        start = self.controller.current_iteration
        if start >= total:
            # A checkpoint at (or past) the final iteration means training
            # is done — the caller still needs the post-fit stages (encode
            # round trip, decoded eval), so return a completed report
            # instead of raising.  This is the relaunch-after-crash path:
            # a supervisor that resumes from chkpnt_final must fall
            # through to encode, not die before it.
            self.log(f"resume iteration {start} >= total {total}: "
                     "training already complete; skipping the loop")
            # the controller is stepped past the last iteration before a
            # final checkpoint, so the trained count is start - 1
            report.iterations = start - 1
            report.n_active = int(self.state.n_active)
            return report

        self.controller.step()
        self.log(f"loop start at iter {start + 1}/{total} "
                 f"(chunked dispatch={'on' if use_multi else 'off'}; a new "
                 f"program shape compiles remotely on first dispatch)")
        it = start + 1
        # wall-clock attribution per log block (VERDICT r3 item 5: real
        # fits ran at 1.42 s/iter vs 0.31 s/iter device — this breakdown
        # tells which host event owns the gap)
        tacc = {"sync": 0.0, "densify": 0.0, "ckpt": 0.0, "est": 0.0,
                "eval": 0.0}
        t_block = time.time()
        while it <= total:
            chunk = self._chunk_len(
                it, total, log_every, eval_every, checkpoint_iterations,
                rate_log_every, spd) if use_multi else 1
            if chunk > 1:
                it = self._run_chunk(it, chunk)
                metrics = self._chunk_metrics
            else:
                metrics = self._run_single(it, n_frames)

            # ---- host events at the (chunk-)end iteration ----
            if self.controller.gaussian_adjust_anchor:
                # drain pending async dispatches FIRST so their device
                # time lands in 'sync' (true step cost), not 'densify'
                t_ev = time.time()
                np.asarray(metrics.loss)
                tacc["sync"] += time.time() - t_ev
                t_ev = time.time()
                res = self._densify()
                tacc["densify"] += time.time() - t_ev
                self.log(f"iter {it}: densify +{res.n_grown} "
                         f"-{res.n_pruned} -> {res.n_active}")

            if log_every and it % log_every == 0:
                m = jax.device_get(metrics)
                rec = {"iter": it, "loss": float(m.loss),
                       "psnr": float(m.psnr),
                       "bpp": float(m.bit_per_param),
                       "n_active": int(self.state.n_active)}
                report.history.append(rec)
                if metrics_writer is not None:
                    # streamed live so telemetry survives a killed run
                    metrics_writer.write(it, **{k: v for k, v in rec.items()
                                                if k != "iter"})
                ovf = int(m.overflow)
                now = time.time()
                blk = now - t_block
                steps_t = blk - sum(tacc.values())
                self.log(f"iter {it}: loss={float(m.loss):.5f} "
                         f"psnr={float(m.psnr):.2f} "
                         f"bpp={float(m.bit_per_param):.4f} "
                         f"anchors={int(self.state.n_active)} "
                         f"overflow={ovf} "
                         f"harmful={int(getattr(m, 'harmful_overflow', -1))} "
                         f"({(now-t0):.1f}s) "
                         f"[block {blk:.1f}s: steps={steps_t:.1f} "
                         f"sync={tacc['sync']:.1f} "
                         f"densify={tacc['densify']:.1f} "
                         f"ckpt={tacc['ckpt']:.1f} est={tacc['est']:.1f} "
                         f"eval={tacc['eval']:.1f}]")
                tacc = {k: 0.0 for k in tacc}
                t_block = now
                self._react_to_overflow(
                    ovf, it, num_rendered=int(m.num_rendered),
                    harmful=int(getattr(m, "harmful_overflow", -1)))

            if eval_every and it % eval_every == 0:
                t_ev = time.time()
                mode = self.controller.render_mode
                if mode is None:
                    mode = GenerateMode.STE_ENTROPY
                ev = self.evaluate(mode=mode)
                tacc["eval"] += time.time() - t_ev
                self.log(f"iter {it}: eval psnr={ev['psnr']:.2f}")

            if checkpoint_dir and it in checkpoint_iterations:
                from gsvc_tpu.utils.checkpoint import save_checkpoint

                t_ev = time.time()
                path = f"{checkpoint_dir}/chkpnt{it}.pkl"
                save_checkpoint(path, self, it)
                tacc["ckpt"] += time.time() - t_ev
                self.log(f"iter {it}: checkpoint saved {path}")

            # estimated whole-model rate telemetry (the reference logs this
            # every 100 iters during entropy phases, pipeline/train.py:547)
            if (rate_log_every and self.controller.entropy_constrained
                    and it % rate_log_every == 0):
                from gsvc_tpu.codec.estimate import estimate_final_bits

                t_ev = time.time()
                est = estimate_final_bits(self.state, self.gcfg)
                tacc["est"] += time.time() - t_ev
                self.log(
                    f"iter {it}: est bits MB "
                    f"anchor={est.bit_anchor/8/2**20:.3f} "
                    f"feat={est.bit_feat/8/2**20:.3f} "
                    f"scaling={est.bit_scaling/8/2**20:.3f} "
                    f"offsets={est.bit_offsets/8/2**20:.3f} "
                    f"hash={est.bit_hash/8/2**20:.3f} "
                    f"masks={est.bit_masks/8/2**20:.3f} "
                    f"mlp={est.bit_mlp/8/2**20:.3f} "
                    f"total={est.total/8/2**20:.3f}")

            self.controller.step()
            it += 1

        m = jax.device_get(metrics)
        report.iterations = total
        report.loss = float(m.loss)
        report.psnr = float(m.psnr)
        report.bit_per_param = float(m.bit_per_param)
        report.n_active = int(self.state.n_active)
        return report

    def _run_chunk(self, it0: int, chunk: int) -> int:
        """Dispatch iterations [it0, it0+chunk) as one multi-step program;
        returns the end iteration.  Host-side RNG consumption (one
        ``rng.integers`` per iteration) and the device key-split chain
        match the single-step path exactly."""
        n_frames = self.dataset.num_frames
        mode = self.controller.render_mode
        if mode is None:  # (enum value 0 is falsy — no `or` here)
            mode = GenerateMode.STE_ENTROPY
        do_stats = self.controller.gaussian_statis

        f1 = np.asarray([
            int(self.rng.integers(0, max(n_frames - 1, 1)))
            for _ in range(chunk)], np.int32)
        f2 = np.minimum(f1 + 1, n_frames - 1).astype(np.int32)
        fl = np.minimum(f1, self.flows[0].shape[0] - 1).astype(np.int32)
        lr_stack = {name: np.asarray([sched(i) for i in
                                      range(it0, it0 + chunk)], np.float32)
                    for name, sched in self.schedules.items()}
        (self.state, self.adam, self.stats, self.key,
         self._chunk_metrics) = self._dispatch_with_retry(
            self.train_multi_step, self.state, self.adam, self.stats,
            self.key, lr_stack,
            jnp.asarray(self.frame_zs[f1]), jnp.asarray(self.frame_zs[f2]),
            jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(fl),
            self.images, self.flows, mode=mode, do_stats=do_stats)

        # interior iterations have no host events (chunk construction);
        # leave the controller AT the end iteration for the event block
        for _ in range(chunk - 1):
            self.controller.step()
        return it0 + chunk - 1

    def _run_single(self, it: int, n_frames: int):
        """One per-iteration dispatch (the legacy path; also the SPMD
        path, where the step is a shard_map program)."""
        lrs = self._lr_values(it)
        mode = self.controller.render_mode
        if mode is None:  # (enum value 0 is falsy — no `or` here)
            mode = GenerateMode.STE_ENTROPY
        do_stats = self.controller.gaussian_statis
        self.key, sk = jax.random.split(self.key)

        if self.mesh is not None:
            # one DIFFERENT frame pair per dp group per step
            fidxs = [int(self.rng.integers(0, max(n_frames - 1, 1)))
                     for _ in range(self.n_dp)]
            z1 = jnp.asarray([self.frame_zs[i] for i in fidxs])
            z2 = jnp.asarray([
                self.frame_zs[min(i + 1, n_frames - 1)] for i in fidxs])
            gt1 = self.images[jnp.asarray(fidxs)]
            gt2 = self.images[jnp.asarray(
                [min(i + 1, n_frames - 1) for i in fidxs])]
            # eager dequant for the shard_map path (spec simplicity);
            # [dp, 2, H, W] f32 is a small transient
            fidx_f = jnp.asarray(
                [min(i, self.flows[0].shape[0] - 1) for i in fidxs])
            flow = (self.flows[0][fidx_f].astype(jnp.float32)
                    * self.flows[1][fidx_f])
            keys = jax.random.split(sk, self.n_dp)
            self.state, self.adam, self.stats, metrics = \
                self._step_with_retry(
                    self.state, self.adam, self.stats, lrs,
                    z1, z2, gt1, gt2, flow, keys,
                    mode=mode, do_stats=do_stats)
        else:
            fidx = int(self.rng.integers(0, max(n_frames - 1, 1)))
            z1 = self.frame_zs[fidx]
            z2 = self.frame_zs[min(fidx + 1, n_frames - 1)]
            gt1 = self.images[fidx]
            gt2 = self.images[min(fidx + 1, n_frames - 1)]
            fi = min(fidx, self.flows[0].shape[0] - 1)
            flow = (self.flows[0][fi], self.flows[1][fi])
            self.state, self.adam, self.stats, metrics = \
                self._step_with_retry(
                    self.state, self.adam, self.stats, lrs,
                    z1, z2, gt1, gt2, flow, sk, mode=mode,
                    do_stats=do_stats)
        return metrics

    # -- evaluation --------------------------------------------------------
    def evaluate(self, mode: GenerateMode = GenerateMode.FULL_PRECISION,
                 frames: Optional[list] = None, decoded: bool = False):
        from gsvc_tpu.metrics.image import psnr as psnr_fn

        # noise-quantized modes are meaningless for deterministic eval:
        # evaluate ENTROPY checkpoints with STE rounding instead
        if mode == GenerateMode.QUANTIZED_NOISE:
            mode = GenerateMode.FULL_PRECISION
        elif mode == GenerateMode.ENTROPY:
            mode = GenerateMode.STE_ENTROPY

        d = self.dataset
        idxs = frames if frames is not None else range(d.num_frames)
        vals = []
        for i in idxs:
            img, _, _ = render_frame_averaged(
                self.state, self.gcfg, self.frame_zs[i], d.x_min, d.y_min,
                d.scale, self.settings, self.window_cap, mode=mode,
                decoded=decoded)
            from gsvc_tpu.train.trainer import gt_f32

            vals.append(float(psnr_fn(img, gt_f32(self.images[i]))))
        return {"psnr": float(np.mean(vals)), "per_frame": vals}
