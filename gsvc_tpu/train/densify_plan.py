"""Index-plan densification: host decides, device applies.

The host path (train/densify.py) pulls every anchor field plus both
Adam moment planes to host (~180 MB round trip at 100k anchors), does
the grow/prune/z-sort surgery in NumPy, and pushes everything back.
Over the remote-TPU tunnel (~4 MB/s measured) that is ~45 s per densify
epoch — roughly a third of flagship fit wall-clock (NOTES_ROUND3.md).

This module computes the SAME surgery as an index plan from ~10 MB of
small planes (anchor xyz, log-scalings, the four densify accumulators,
plus per-candidate offset rows fetched on demand), and a jitted device
program applies it with gathers:

    out_field = take(concat([old_field, new_block]), src_idx, axis=0)

New-anchor features are an on-device segment-max over candidate feature
rows (``pairs_src -> pairs_dst``), so the [N, F] feature plane and the
Adam moment planes never cross the tunnel.  The plan is bit-exact
against the host path — same RNG stream, same ordering decisions —
asserted field-for-field by tests/test_densify_plan.py.

Reference semantics being reproduced: scene/gaussian_model.py:1258-1505
(adjust_anchor / anchor_growing / prune_anchor + optimizer surgery).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from gsvc_tpu.config import ModelConfig, OptimizationConfig
from gsvc_tpu.train.densify import DensifyResult

_NEW_QUANTUM = 4096     # new-row block size quantum (bounds retraces)
_PAIR_QUANTUM = 8192    # candidate-pair buffer quantum


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _rows_in(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized 'row of a is a row of b' for int grids (exact — no
    hashing).  Replaces the per-depth ``set(map(tuple, ...))`` +
    Python-loop membership test, which cost O(n) tuple boxing over up
    to ~100k anchors per depth."""
    if b.shape[0] == 0:
        return np.zeros(a.shape[0], bool)
    dt = [("", a.dtype)] * a.shape[1]
    av = np.ascontiguousarray(a).view(dt).ravel()
    bv = np.ascontiguousarray(b).view(dt).ravel()
    return np.isin(av, bv)


@dataclass
class DensifyPlan:
    """Everything the device apply program needs, plus host-side results.

    ``src_idx`` indexes a virtual concat [old_field(capacity_in rows),
    new_block(new_cap rows)]: entries < capacity_in select surviving
    old rows (original, pre-surgery indices — growth only appends, so
    kept rows keep their indices); entries >= capacity_in select
    new-anchor block slots.  Output slots beyond ``n_active`` point at
    the new block's final row, which is an all-zeros pad row with
    anchor z = 1e9 (the same padding the host path writes).  When the
    surgery outgrows the old device buffers, ``capacity_out`` (=
    len(src_idx)) is the grown output padding — same 1.5x-then-1024
    rounding as the host path — and the caller must re-jit its step.
    """

    result: DensifyResult
    n0: int                     # active rows before surgery
    capacity_out: int           # output row padding (>= capacity_in iff grown)
    src_idx: np.ndarray         # [capacity_out] int32
    new_anchor: np.ndarray      # [new_cap, 3] f32; pad rows z = 1e9
    new_scaling: np.ndarray     # [new_cap, 6] f32 (log cur_size fills)
    is_new_real: np.ndarray     # [new_cap] bool
    pairs_src: np.ndarray       # [p_cap] int32 anchor rows (pad: 0)
    pairs_dst: np.ndarray       # [p_cap] int32 new-row ids (pad: new_cap)
    offset_reset: np.ndarray    # [capacity_in * K] bool
    opdem_reset: np.ndarray     # [capacity_in] bool
    z_full: np.ndarray          # [capacity_out] f32 post-surgery z (pad 1e9)


def build_plan(
    anchor: np.ndarray,          # [n, 3] active-prefix anchor positions
    scaling: np.ndarray,         # [n, 6] active-prefix log scalings
    stats: dict,                 # opacity_accum [n,1], anchor_demon [n,1],
                                 # offset_gradient_accum [n*K,1], offset_denom
    fetch_offsets: Callable[[np.ndarray], np.ndarray],  # flat idx -> [m,3]
    mc: ModelConfig, opt: OptimizationConfig,
    voxel_size: float, rng: np.random.Generator,
    capacity: int,
) -> DensifyPlan:
    """Replicates densify.adjust_anchors + resort_by_z decision-for-
    decision (including the RNG draws), but materializes only the index
    plan.  ``capacity`` is the CURRENT device padding; if the surgery
    outgrows it the plan's output arrays use a grown ``capacity_out``
    (the apply program's gathers produce the larger output directly)."""
    k = mc.n_offsets
    interval = opt.update_interval
    n0 = anchor.shape[0]

    denom = stats["offset_denom"]
    grads = np.divide(stats["offset_gradient_accum"], denom,
                      out=np.zeros_like(denom), where=denom > 0)
    grads = np.nan_to_num(grads, nan=0.0, posinf=0.0, neginf=0.0)
    grads_norm = np.abs(grads[:, 0])
    offset_mask = (stats["offset_denom"][:, 0]
                   > interval * opt.success_threshold * 0.5)

    # ---- growing (anchor_growing, gaussian_model.py:1362-1449) ----------
    new_anchor_chunks = []       # per-depth [m,3] positions
    new_scaling_fill = []        # per-depth scalar log(cur_size)
    new_counts = []
    pairs_src_chunks, pairs_dst_chunks = [], []
    n_now = n0
    m_total = 0
    for depth in range(mc.update_depth):
        cur_threshold = opt.densify_grad_threshold * (
            (mc.update_hierarchy_factor // 2) ** depth)
        cand = np.zeros(n_now * k, bool)
        cand[:n0 * k] = (grads_norm >= cur_threshold) & offset_mask
        cand &= rng.random(n_now * k) > 0.5 ** (depth + 1)
        if not cand.any():
            continue

        size_factor = mc.update_init_factor // (
            mc.update_hierarchy_factor ** depth)
        cur_size = voxel_size * size_factor

        all_anchor = (np.concatenate([anchor] + new_anchor_chunks)
                      if new_anchor_chunks else anchor)
        grid_existing = np.round(all_anchor / cur_size).astype(np.int64)

        flat_idx = np.nonzero(cand)[0]          # all < n0 * k
        rows = (flat_idx // k).astype(np.int64)
        sel_off = fetch_offsets(flat_idx)
        scale3 = np.exp(scaling[rows, :3])
        sel_xyz = anchor[rows] + sel_off * scale3
        sel_grid = np.round(sel_xyz / cur_size).astype(np.int64)
        uniq_grid, inverse = np.unique(sel_grid, axis=0, return_inverse=True)

        keep = ~_rows_in(uniq_grid, grid_existing)
        if not keep.any():
            continue

        new_pos = (uniq_grid[keep] * cur_size).astype(np.float32)
        m = new_pos.shape[0]
        dst_of_uniq = np.full(uniq_grid.shape[0], -1, np.int64)
        dst_of_uniq[keep] = m_total + np.arange(m)
        pd = dst_of_uniq[inverse]
        sel = pd >= 0
        pairs_src_chunks.append(rows[sel])
        pairs_dst_chunks.append(pd[sel])
        new_anchor_chunks.append(new_pos)
        new_scaling_fill.append(float(np.log(cur_size)))
        new_counts.append(m)
        m_total += m
        n_now += m

    # offset-accumulator reset (gaussian_model.py:1460-1471): offsets
    # that passed the denom gate restart their statistics
    offset_reset = np.zeros(capacity * k, bool)
    offset_reset[:n0 * k] = offset_mask

    # ---- pruning (adjust_anchor, gaussian_model.py:1473-1505) -----------
    demon = stats["anchor_demon"][:, 0]
    prune = (stats["opacity_accum"][:, 0] < opt.min_opacity * demon) \
        & (demon > interval * opt.success_threshold)
    keep_old = ~prune
    seen = demon > interval * opt.success_threshold
    opdem_reset = np.zeros(capacity, bool)
    opdem_reset[:n0] = seen

    kept_old_idx = np.nonzero(keep_old)[0].astype(np.int64)
    n_active = kept_old_idx.shape[0] + m_total
    capacity_out = capacity
    if n_active > capacity:
        # same growth policy as the host path (train/fit.py _densify)
        capacity_out = _round_up(int(n_active * 1.5), 1024)

    new_cap = max(_NEW_QUANTUM, _round_up(m_total + 1, _NEW_QUANTUM))
    new_anchor = np.zeros((new_cap, 3), np.float32)
    new_anchor[m_total:, 2] = 1e9            # pad rows, incl. the slot
    new_scaling = np.zeros((new_cap, 6), np.float32)
    if m_total:
        new_anchor[:m_total] = np.concatenate(new_anchor_chunks)
        new_scaling[:m_total] = np.repeat(
            np.asarray(new_scaling_fill, np.float32), new_counts)[:, None]
    is_new_real = np.arange(new_cap) < m_total

    p = sum(c.shape[0] for c in pairs_src_chunks)
    p_cap = max(_PAIR_QUANTUM, _round_up(max(p, 1), _PAIR_QUANTUM))
    pairs_src = np.zeros(p_cap, np.int32)
    pairs_dst = np.full(p_cap, new_cap, np.int32)   # dump segment
    if p:
        pairs_src[:p] = np.concatenate(pairs_src_chunks)
        pairs_dst[:p] = np.concatenate(pairs_dst_chunks)

    # ---- z re-sort over [kept old rows (original order), new rows] ------
    z_old = anchor[kept_old_idx, 2]
    z_new = new_anchor[:m_total, 2]
    z_all = np.concatenate([z_old, z_new])
    src_all = np.concatenate([
        kept_old_idx, capacity + np.arange(m_total, dtype=np.int64)])
    order = np.argsort(z_all, kind="stable")

    src_idx = np.full(capacity_out, capacity + new_cap - 1, np.int32)
    src_idx[:n_active] = src_all[order].astype(np.int32)
    z_full = np.full(capacity_out, 1e9, np.float32)
    z_full[:n_active] = z_all[order]

    return DensifyPlan(
        result=DensifyResult(n_grown=m_total, n_pruned=int(prune.sum()),
                             n_active=n_active),
        n0=n0, capacity_out=capacity_out, src_idx=src_idx,
        new_anchor=new_anchor,
        new_scaling=new_scaling, is_new_real=is_new_real,
        pairs_src=pairs_src, pairs_dst=pairs_dst,
        offset_reset=offset_reset, opdem_reset=opdem_reset, z_full=z_full)


@jax.jit
def _apply(anchors, adam_m, adam_v, stats, src_idx, new_anchor, new_scaling,
           is_new_real, pairs_src, pairs_dst, offset_reset, opdem_reset):
    """Device-side plan application.  ``anchors``/``adam_m``/``adam_v``
    are AnchorState pytrees, ``stats`` a TrainStats pytree; all padded
    to capacity.  Returns same-shaped pytrees."""
    cap_in, k = anchors.offset.shape[0], anchors.offset.shape[1]
    cap_out = src_idx.shape[0]
    new_cap = new_anchor.shape[0]

    def gather(old, new_block):
        return jnp.take(jnp.concatenate([old, new_block], axis=0),
                        src_idx, axis=0)

    # new-anchor features: per-voxel max over candidate feature rows
    # (replaces the host _scatter_max; empty segments come back -inf)
    cand_feat = jnp.take(anchors.feat, pairs_src, axis=0)
    feat_block = jax.ops.segment_max(cand_feat, pairs_dst,
                                     num_segments=new_cap + 1)[:new_cap]
    feat_block = jnp.where(jnp.isneginf(feat_block), 0.0, feat_block)
    feat_block = jnp.where(is_new_real[:, None], feat_block, 0.0)

    real1 = is_new_real[:, None].astype(anchors.mask.dtype)
    blocks = {
        "anchor": new_anchor,
        "feat": feat_block,
        "offset": jnp.zeros((new_cap, k, 3), anchors.offset.dtype),
        "mask": jnp.broadcast_to(real1[:, :, None], (new_cap, k, 1)),
        "scaling": new_scaling,
        "rotation": real1 * jnp.asarray([1.0, 0.0, 0.0, 0.0],
                                        anchors.rotation.dtype),
        "opacity": real1 * jnp.asarray(float(np.log(0.1 / 0.9)),
                                       anchors.opacity.dtype),
    }
    out_fields = {name: gather(getattr(anchors, name), blocks[name])
                  for name in blocks}
    # gaussian-scale clamp applied on prune (gaussian_model.py:1330-1342)
    sc = out_fields["scaling"]
    out_fields["scaling"] = jnp.concatenate(
        [sc[:, :3], jnp.minimum(sc[:, 3:], 0.05)], axis=1)
    new_anchors = anchors._replace(**out_fields)

    def gather_zero(old):
        zeros = jnp.zeros((new_cap,) + old.shape[1:], old.dtype)
        return gather(old, zeros)

    new_m = adam_m._replace(**{name: gather_zero(getattr(adam_m, name))
                               for name in blocks})
    new_v = adam_v._replace(**{name: gather_zero(getattr(adam_v, name))
                               for name in blocks})

    opdem = opdem_reset[:, None]
    oa = gather_zero(jnp.where(opdem, 0.0, stats.opacity_accum))
    ad = gather_zero(jnp.where(opdem, 0.0, stats.anchor_demon))

    def gather_rows(flat):
        rows = jnp.where(offset_reset[:, None], 0.0,
                         flat).reshape(cap_in, k, 1)
        out = gather(rows, jnp.zeros((new_cap, k, 1), flat.dtype))
        return out.reshape(cap_out * k, 1)

    new_stats = stats._replace(
        opacity_accum=oa, anchor_demon=ad,
        offset_gradient_accum=gather_rows(stats.offset_gradient_accum),
        offset_denom=gather_rows(stats.offset_denom))
    return new_anchors, new_m, new_v, new_stats


def apply_plan(plan: DensifyPlan, anchors, adam_m, adam_v, stats):
    """Push the (small) plan arrays and run the jitted apply program."""
    return _apply(
        anchors, adam_m, adam_v, stats,
        jnp.asarray(plan.src_idx), jnp.asarray(plan.new_anchor),
        jnp.asarray(plan.new_scaling), jnp.asarray(plan.is_new_real),
        jnp.asarray(plan.pairs_src), jnp.asarray(plan.pairs_dst),
        jnp.asarray(plan.offset_reset), jnp.asarray(plan.opdem_reset))
