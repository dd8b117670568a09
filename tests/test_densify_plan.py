"""Bit-exact parity: index-plan densify (host decides, device applies)
vs the host-surgery path (train/densify.py + the fit.py padding).

The plan path must reproduce the host path field-for-field — including
the RNG draws, voxel dedup ordering, stat resets, Adam surgery, z-sort
and the capacity-pad contents — because the flagship RD sweep switches
paths mid-sweep and the trajectories must be identical.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.config import ModelConfig, OptimizationConfig
from gsvc_tpu.models.gaussians import AnchorState
from gsvc_tpu.train.densify import adjust_anchors, resort_by_z
from gsvc_tpu.train.densify_plan import apply_plan, build_plan
from gsvc_tpu.train.trainer import TrainStats

_FIELDS = AnchorState._fields
F = 8
K = 4


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _make_inputs(seed, n, grow_frac=0.3, prune_frac=0.2):
    rng = np.random.default_rng(seed)
    mc = ModelConfig(n_offsets=K, update_depth=3, update_init_factor=16,
                     update_hierarchy_factor=4)
    opt = OptimizationConfig(update_interval=100, success_threshold=0.8,
                             min_opacity=0.005, densify_grad_threshold=0.01)
    anchors = {
        "anchor": np.sort(rng.uniform(-1, 1, (n, 3)).astype(np.float32), 0),
        "feat": rng.normal(size=(n, F)).astype(np.float32),
        "offset": rng.normal(size=(n, K, 3)).astype(np.float32) * 0.5,
        "mask": rng.uniform(size=(n, K, 1)).astype(np.float32),
        "scaling": rng.normal(size=(n, 6)).astype(np.float32) * 0.3,
        "rotation": np.tile(np.asarray([1, 0, 0, 0], np.float32), (n, 1)),
        "opacity": rng.normal(size=(n, 1)).astype(np.float32),
    }
    # order only within-field; z-sort invariant applies to the z column
    anchors["anchor"] = anchors["anchor"][
        np.argsort(anchors["anchor"][:, 2], kind="stable")]
    adam_m = {f: rng.normal(size=anchors[f].shape).astype(np.float32)
              for f in _FIELDS}
    adam_v = {f: np.abs(rng.normal(size=anchors[f].shape)).astype(np.float32)
              for f in _FIELDS}

    denom_gate = opt.update_interval * opt.success_threshold
    grads = np.zeros((n * K, 1), np.float32)
    denom = np.full((n * K, 1), denom_gate * 0.4, np.float32)
    grow_rows = rng.random(n * K) < grow_frac
    grads[grow_rows] = (opt.densify_grad_threshold
                        * rng.uniform(1.0, 30.0, (grow_rows.sum(), 1)))
    denom[grow_rows] = denom_gate * rng.uniform(0.6, 2.0,
                                                (grow_rows.sum(), 1))
    grads *= denom  # accumulators store sums; adjust divides by denom

    demon = np.full((n, 1), denom_gate * 0.5, np.float32)
    opacity_accum = np.abs(rng.normal(size=(n, 1))).astype(np.float32)
    prune_rows = rng.random(n) < prune_frac
    demon[prune_rows] = denom_gate * 1.5
    opacity_accum[prune_rows] = 0.0      # < min_opacity * demon
    seen_keep = rng.random(n) < 0.1      # seen-but-not-pruned: reset only
    demon[seen_keep] = denom_gate * 1.5
    opacity_accum[seen_keep] = 10.0

    stats = {
        "opacity_accum": opacity_accum,
        "anchor_demon": demon,
        "offset_gradient_accum": grads,
        "offset_denom": denom,
    }
    return mc, opt, anchors, adam_m, adam_v, stats


def _host_surgery(mc, opt, anchors, adam_m, adam_v, stats, voxel, seed,
                  capacity):
    """The exact host path from fit.py:_densify (surgery + padding)."""
    anchors = {f: v.copy() for f, v in anchors.items()}
    adam_m = {f: v.copy() for f, v in adam_m.items()}
    adam_v = {f: v.copy() for f, v in adam_v.items()}
    stats = {f: v.copy() for f, v in stats.items()}
    rng = np.random.default_rng(seed)
    res = adjust_anchors(anchors, adam_m, adam_v, stats, mc, opt, voxel, rng)
    resort_by_z(anchors, adam_m, adam_v, stats, mc.n_offsets)
    n_new = res.n_active
    cap = capacity
    if n_new > cap:
        cap = _round_up(int(n_new * 1.5), 1024)

    def pad_to(x, c, fill=0.0):
        out = np.full((c,) + x.shape[1:], fill, np.float32)
        out[:x.shape[0]] = x
        return out

    anchor_pad = np.zeros((cap, 3), np.float32)
    anchor_pad[:n_new] = anchors["anchor"]
    anchor_pad[n_new:, 2] = 1e9
    out = {"anchor": anchor_pad}
    out.update({f: pad_to(anchors[f], cap) for f in _FIELDS if f != "anchor"})
    out_m = {f: pad_to(adam_m[f], cap) for f in _FIELDS}
    out_v = {f: pad_to(adam_v[f], cap) for f in _FIELDS}
    out_stats = {
        "opacity_accum": pad_to(stats["opacity_accum"], cap),
        "anchor_demon": pad_to(stats["anchor_demon"], cap),
        "offset_gradient_accum": pad_to(stats["offset_gradient_accum"],
                                        cap * mc.n_offsets),
        "offset_denom": pad_to(stats["offset_denom"], cap * mc.n_offsets),
    }
    return res, cap, out, out_m, out_v, out_stats


def _plan_surgery(mc, opt, anchors, adam_m, adam_v, stats, voxel, seed,
                  capacity):
    """The plan path, fed from capacity-padded device arrays."""
    n = anchors["anchor"].shape[0]

    def pad_to(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, np.float32)
        out[:x.shape[0]] = x
        return out

    anchor_pad = pad_to(anchors["anchor"])
    anchor_pad[n:, 2] = 1e9
    dev_anchors = AnchorState(anchor=jnp.asarray(anchor_pad), **{
        f: jnp.asarray(pad_to(anchors[f])) for f in _FIELDS if f != "anchor"})
    dev_m = AnchorState(**{f: jnp.asarray(pad_to(adam_m[f]))
                           for f in _FIELDS})
    dev_v = AnchorState(**{f: jnp.asarray(pad_to(adam_v[f]))
                           for f in _FIELDS})
    dev_stats = TrainStats(
        opacity_accum=jnp.asarray(pad_to(stats["opacity_accum"])),
        anchor_demon=jnp.asarray(pad_to(stats["anchor_demon"])),
        offset_gradient_accum=jnp.asarray(np.concatenate([
            stats["offset_gradient_accum"],
            np.zeros(((capacity - n) * K, 1), np.float32)])),
        offset_denom=jnp.asarray(np.concatenate([
            stats["offset_denom"],
            np.zeros(((capacity - n) * K, 1), np.float32)])))

    rng = np.random.default_rng(seed)
    flat_offsets = np.asarray(dev_anchors.offset).reshape(-1, 3)
    plan = build_plan(
        anchor=anchors["anchor"], scaling=anchors["scaling"],
        stats={f: v.copy() for f, v in stats.items()},
        fetch_offsets=lambda idx: flat_offsets[idx],
        mc=mc, opt=opt, voxel_size=voxel, rng=rng, capacity=capacity)
    na, nm, nv, ns = apply_plan(plan, dev_anchors, dev_m, dev_v, dev_stats)
    return plan, na, nm, nv, ns


def _assert_match(mc, opt, anchors, adam_m, adam_v, stats, voxel, seed,
                  capacity):
    res, cap, h_a, h_m, h_v, h_s = _host_surgery(
        mc, opt, anchors, adam_m, adam_v, stats, voxel, seed, capacity)
    plan, na, nm, nv, ns = _plan_surgery(
        mc, opt, anchors, adam_m, adam_v, stats, voxel, seed, capacity)

    assert plan.result.n_active == res.n_active
    assert plan.result.n_grown == res.n_grown
    assert plan.result.n_pruned == res.n_pruned
    assert plan.capacity_out == cap
    for f in _FIELDS:
        np.testing.assert_array_equal(np.asarray(getattr(na, f)), h_a[f],
                                      err_msg=f"anchors.{f}")
        np.testing.assert_array_equal(np.asarray(getattr(nm, f)), h_m[f],
                                      err_msg=f"adam_m.{f}")
        np.testing.assert_array_equal(np.asarray(getattr(nv, f)), h_v[f],
                                      err_msg=f"adam_v.{f}")
    for f, dev in (("opacity_accum", ns.opacity_accum),
                   ("anchor_demon", ns.anchor_demon),
                   ("offset_gradient_accum", ns.offset_gradient_accum),
                   ("offset_denom", ns.offset_denom)):
        np.testing.assert_array_equal(np.asarray(dev), h_s[f],
                                      err_msg=f"stats.{f}")
    np.testing.assert_array_equal(plan.z_full, h_a["anchor"][:, 2])
    return res


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_plan_matches_host_grow_and_prune(seed):
    mc, opt, anchors, adam_m, adam_v, stats = _make_inputs(seed, n=300)
    res = _assert_match(mc, opt, anchors, adam_m, adam_v, stats,
                        voxel=0.05, seed=seed + 10, capacity=2048)
    assert res.n_grown > 0 and res.n_pruned > 0


def test_plan_matches_host_no_candidates():
    mc, opt, anchors, adam_m, adam_v, stats = _make_inputs(
        3, n=200, grow_frac=0.0, prune_frac=0.3)
    res = _assert_match(mc, opt, anchors, adam_m, adam_v, stats,
                        voxel=0.05, seed=7, capacity=1024)
    assert res.n_grown == 0 and res.n_pruned > 0


def test_plan_matches_host_capacity_growth():
    # tiny capacity: surgery outgrows the device padding and both paths
    # must agree on the grown capacity and its pad contents
    mc, opt, anchors, adam_m, adam_v, stats = _make_inputs(
        4, n=300, grow_frac=0.6, prune_frac=0.0)
    res, cap, *_ = _host_surgery(mc, opt, anchors, adam_m, adam_v, stats,
                                 0.02, 11, 320)
    assert cap > 320, "fixture must actually outgrow capacity"
    _assert_match(mc, opt, anchors, adam_m, adam_v, stats,
                  voxel=0.02, seed=11, capacity=320)


@pytest.mark.slow
def test_fitter_trajectory_invariant_to_densify_path():
    """End-to-end: a short fit must produce the IDENTICAL model whether
    densify epochs run as host surgery or as the device index plan (the
    flagship sweep switches paths between lambda fits)."""
    from test_train import small_config, synthetic_video

    from gsvc_tpu.framecube import FrameCubeDataset
    from gsvc_tpu.train.fit import GOPFitter

    frames = synthetic_video(t=4)
    finals = []
    for device_densify in (False, True):
        cfg = small_config(iterations=60)
        cfg.pipeline.device_densify = device_densify
        fitter = GOPFitter(cfg, FrameCubeDataset(images=frames), seed=0)
        fitter.fit(log_every=0)
        finals.append((int(fitter.state.n_active), fitter.state.anchors,
                       fitter.stats))
    assert finals[0][0] == finals[1][0]
    for f in AnchorState._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(finals[0][1], f)),
            np.asarray(getattr(finals[1][1], f)), err_msg=f)
    for f in TrainStats._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(finals[0][2], f)),
            np.asarray(getattr(finals[1][2], f)), err_msg=f)
