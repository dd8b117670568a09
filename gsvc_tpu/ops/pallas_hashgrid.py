"""TPU-native multi-resolution hash-grid encode: lane-shuffle gather kernel.

The reference's gridencoder is a CUDA kernel of per-thread global-memory
gathers (submodules/gridencoder -> gridencoder.cu, driven from
utils/encodings.py:485-709).  A literal translation is hostile to TPU:
XLA lowers the (level, corner) row gathers through HBM at a measured
~43 ms fwd+bwd per entropy context (NOTES_ROUND2.md) even though the
whole table is ~7 MB.  This module is an original two-level design
around the one vectorized gather the Mosaic compiler supports,
``tpu.dynamic_gather`` along the 128-lane dimension:

  * each level's table is repacked ``[SEG * F, 128]``: row ``s * F + f``,
    lane ``l`` holds ``table[s * 128 + l, f]`` — a lookup index splits as
    ``(seg, lo) = (idx >> 7, idx & 127)``;
  * a block of 128 queries lane-gathers the WHOLE level table by ``lo``
    (one dynamic_gather), then reduces rows masked by ``seg == s``:
    O(SEG) VMEM-resident VPU work per 128 queries replaces a serialized
    HBM gather;
  * the backward scatter-add of table gradients is an MXU one-hot
    matmul per corner, ``g_T[(s,f), l] += sum_q M[s,q] gV[f,q] OH[l,q]``,
    accumulated into a VMEM-resident output block across query steps —
    the "VMEM-accumulator" scatter kernel queued in NOTES_ROUND2.md;
  * position gradients are computed in the same backward pass from the
    recomputed corner values (the kernel re-gathers: gathers are cheap
    here, HBM round trips are not).

Semantics are identical to ``ops/hashgrid.py`` (same corner indexing,
border-zeroing with weight renormalization, instant-NGP hash); the
index/weight computation stays in XLA (elementwise, negligible) and is
shared logic.  Forward results are exact; the backward matmuls default
to f32 on the MXU.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsvc_tpu.ops.hashgrid import HashGridSpec, MixGridSpec, _PRIMES

LANES = 128
FP = 8          # feature rows per instance in the kernel output (padded)
RB = 8          # index rows (corner slots) per grid block


# ---------------------------------------------------------------------------
# Spec: a flat list of level-instances sharing one packed table
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LaneGatherSpec:
    """Static layout for one lane-gather encode call.

    All instances share the corner count ``C = 2**d_local`` and the
    padded segment count ``SEG`` (max over instances); smaller tables
    are zero-padded to ``SEG * 128`` rows."""

    n_features: int                     # F
    seg: int                            # segments per instance table
    n_corners: int                      # C (4 for 2D, 8 for 3D)
    d_local: int                        # dims per instance (2 or 3)
    resolutions: Tuple[int, ...]        # per instance (incl. pad dummies)
    sizes: Tuple[int, ...]              # true table rows per instance
    dims: Tuple[Tuple[int, ...], ...]   # which x-dims feed each instance
    n_real: int                         # real instances (<= n_inst);
                                        # trailing pad dummies alias the
                                        # last real table and their output
                                        # columns are sliced away

    @property
    def n_inst(self) -> int:
        return len(self.resolutions)

    @property
    def lpb(self) -> int:
        return RB // self.n_corners     # instances per grid block

    @property
    def rows_packed(self) -> int:
        return self.n_inst * self.n_features * self.seg

    @property
    def n_blocks(self) -> int:
        assert self.n_inst % self.lpb == 0
        return self.n_inst // self.lpb


def _pad_seg(seg: int, F: int, C: int) -> int:
    """Pad the segment count so every table block spans a multiple of 8
    sublane rows (Mosaic block divisibility); padded rows are zeros and
    never selected (all real seg indices stay below them)."""
    lpb = RB // C
    while (F * seg * lpb) % 8:
        seg += 1
    return seg


def _pad_instances(resolutions, sizes, dims, C):
    """Pad the instance list to a multiple of lpb = RB // C by repeating
    the last instance.  The dummies alias the last real table (their
    offsets are duplicated by the caller); their output columns are
    sliced away and their incoming gradients are zero, so the aliased
    rows receive no spurious gradient."""
    lpb = RB // C
    n_real = len(resolutions)
    resolutions, sizes, dims = list(resolutions), list(sizes), list(dims)
    while len(resolutions) % lpb:
        resolutions.append(resolutions[-1])
        sizes.append(sizes[-1])
        dims.append(dims[-1])
    return (tuple(resolutions), tuple(sizes),
            tuple(tuple(d) for d in dims), n_real)


def spec_from_hashgrid(hs: HashGridSpec,
                       dims: Sequence[Tuple[int, ...]] | None = None
                       ) -> LaneGatherSpec:
    if dims is None:
        dims = [tuple(range(hs.num_dim))] * hs.n_levels
    C = 1 << hs.num_dim
    seg = max(-(-s // LANES) for s in hs.level_sizes)
    seg = _pad_seg(seg, hs.n_features, C)
    res, sizes, dims, n_real = _pad_instances(
        hs.resolutions, hs.level_sizes, dims, C)
    return LaneGatherSpec(
        n_features=hs.n_features, seg=seg,
        n_corners=C, d_local=hs.num_dim,
        resolutions=res, sizes=sizes, dims=dims, n_real=n_real)


def spec_2d_triple(hs: HashGridSpec) -> LaneGatherSpec:
    """The xy | xz | yz instance list of the Mix3d2d encoder, one call."""
    assert hs.num_dim == 2
    seg = max(-(-s // LANES) for s in hs.level_sizes)
    seg = _pad_seg(seg, hs.n_features, 4)
    planes = ((0, 1), (0, 2), (1, 2))
    res, sizes, dims, n_real = _pad_instances(
        hs.resolutions * 3, hs.level_sizes * 3,
        [p for p in planes for _ in hs.resolutions], 4)
    return LaneGatherSpec(
        n_features=hs.n_features, seg=seg, n_corners=4, d_local=2,
        resolutions=res, sizes=sizes, dims=dims, n_real=n_real)


# ---------------------------------------------------------------------------
# Table packing (XLA; differentiable, so autodiff recovers g_params)
# ---------------------------------------------------------------------------

def pack_tables(params: jnp.ndarray, spec: LaneGatherSpec,
                offsets: Sequence[int]) -> jnp.ndarray:
    """params [total_rows, F] -> packed [n_inst * F * SEG, 128].

    ``offsets[i]`` is the first row of instance i inside ``params``.
    Packed row ``i * F * SEG + s * F + f``, lane ``l`` =
    ``params[offsets[i] + s * 128 + l, f]``."""
    F, SEG = spec.n_features, spec.seg
    blocks = []
    for i in range(spec.n_inst):
        t = jax.lax.dynamic_slice_in_dim(params, offsets[i], spec.sizes[i], 0)
        pad = SEG * LANES - spec.sizes[i]
        if pad:
            t = jnp.pad(t, ((0, pad), (0, 0)))
        # [SEG*128, F] -> [SEG, 128, F] -> [SEG, F, 128] -> [SEG*F, 128]
        blocks.append(jnp.transpose(t.reshape(SEG, LANES, F), (0, 2, 1))
                      .reshape(SEG * F, LANES))
    return jnp.concatenate(blocks, axis=0)


# ---------------------------------------------------------------------------
# Index / weight prep (XLA, shared semantics with ops/hashgrid.py)
# ---------------------------------------------------------------------------

def _instance_indices(x, res: int, size: int, d_local: int):
    """Corner rows for one instance: idx [C, N] i32, w [C, N], and
    dw [D, C, N] = d w / d xn_local (already scaled by (res-2), border
    corners zeroed in both w and dw)."""
    n = x.shape[0]
    pos = x * (res - 2) + 0.5
    pg = jnp.floor(pos)
    frac = pos - pg
    pgi = pg.astype(jnp.int32)
    use_hash = (res ** d_local) > size

    idxs, ws, dws = [], [], []
    for corner in range(1 << d_local):
        t = []          # per-dim weight factor
        dt = []         # its d/dfrac sign
        coords = []
        for d in range(d_local):
            if (corner >> d) & 1:
                t.append(frac[:, d])
                dt.append(jnp.ones((n,), x.dtype))
                coords.append(jnp.minimum(pgi[:, d] + 1, res - 1))
            else:
                t.append(1.0 - frac[:, d])
                dt.append(jnp.full((n,), -1.0, x.dtype))
                coords.append(pgi[:, d])
        coords = jnp.stack(coords, axis=-1)
        valid = jnp.all((coords > 0) & (coords < res - 1), axis=-1)
        w = functools.reduce(jnp.multiply, t)
        vf = valid.astype(x.dtype)
        ws.append(w * vf)
        for d in range(d_local):
            others = [t[d2] for d2 in range(d_local) if d2 != d]
            prod = functools.reduce(jnp.multiply, others) if others else 1.0
            dws.append(dt[d] * prod * (res - 2) * vf)

        if use_hash:
            h = jnp.zeros((n,), jnp.uint32)
            for d in range(d_local):
                h = h ^ (coords[:, d].astype(jnp.uint32)
                         * jnp.uint32(_PRIMES[d]))
            idx = (h % jnp.uint32(size)).astype(jnp.int32)
        else:
            stride = 1
            idx = jnp.zeros((n,), jnp.int32)
            for d in range(d_local):
                idx = idx + coords[:, d] * stride
                stride *= res
            idx = idx % size
        idxs.append(idx)
    C = 1 << d_local
    idx = jnp.stack(idxs)                                    # [C, N]
    w = jnp.stack(ws)                                        # [C, N]
    dw = jnp.stack(dws).reshape(C, d_local, n)               # [C, D, N]
    return idx, w, jnp.transpose(dw, (1, 0, 2))              # dw [D, C, N]


def _prep(x, spec: LaneGatherSpec, np_pad: int):
    """All instances' seg/lo/w/dw rows, padded to np_pad queries."""
    seg_r, lo_r, w_r = [], [], []
    dw_r = [[] for _ in range(spec.d_local)]
    for i in range(spec.n_inst):
        xi = x[:, spec.dims[i]]
        idx, w, dw = _instance_indices(xi, spec.resolutions[i],
                                       spec.sizes[i], spec.d_local)
        seg_r.append(idx >> 7)
        lo_r.append(idx & (LANES - 1))
        w_r.append(w)
        for d in range(spec.d_local):
            dw_r[d].append(dw[d])

    def cat(rows, dtype):
        a = jnp.concatenate(rows, axis=0).astype(dtype)     # [n_inst*C, N]
        return jnp.pad(a, ((0, 0), (0, np_pad - a.shape[1])))

    seg = cat(seg_r, jnp.int32)
    lo = cat(lo_r, jnp.int32)
    w = cat(w_r, jnp.float32)
    dws = [cat(dw_r[d], jnp.float32) for d in range(spec.d_local)]
    return seg, lo, w, dws


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _seg_reduce(A, F: int, SEG: int):
    """Rows s*F+f -> [F, 128] summed over s."""
    return A.reshape(SEG, F, LANES).sum(axis=0)


def _fwd_kernel(seg_ref, lo_ref, w_ref, t_ref, o_ref, *,
                C: int, F: int, SEG: int, LPB: int):
    R = F * SEG
    siota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) // F
    for lp in range(LPB):
        T = t_ref[lp * R:(lp + 1) * R, :]
        acc = jnp.zeros((F, LANES), jnp.float32)
        wn = jnp.zeros((1, LANES), jnp.float32)
        for c in range(C):
            r = lp * C + c
            lo = lo_ref[r, :][None, :]
            sg = seg_ref[r, :][None, :]
            w = w_ref[r, :][None, :]
            G = jnp.take_along_axis(
                T, jnp.broadcast_to(lo, (R, LANES)), axis=1)
            A = jnp.where(jnp.broadcast_to(sg, (R, LANES)) == siota, G, 0.0)
            acc = acc + w * _seg_reduce(A, F, SEG)
            wn = wn + w
        out = acc / jnp.maximum(wn, 1e-9)
        o_ref[lp * FP:lp * FP + F, :] = out
        if FP > F:
            o_ref[lp * FP + F:(lp + 1) * FP, :] = jnp.zeros(
                (FP - F, LANES), jnp.float32)


def _bwd_kernel(seg_ref, lo_ref, w_ref, *rest, C: int, F: int, SEG: int,
                LPB: int, D: int):
    dw_refs = rest[:D]
    g_ref, t_ref, gt_ref, gx_ref = rest[D:]
    qb = pl.program_id(1)

    @pl.when(qb == 0)
    def _init():
        gt_ref[:, :] = jnp.zeros(gt_ref.shape, gt_ref.dtype)

    R = F * SEG
    siota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) // F
    laneiota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    gx_rows = []
    for lp in range(LPB):
        T = t_ref[lp * R:(lp + 1) * R, :]
        # recompute the forward (gathers are cheap; HBM residuals are not)
        Vs, acc = [], jnp.zeros((F, LANES), jnp.float32)
        wn = jnp.zeros((1, LANES), jnp.float32)
        Ms = []
        for c in range(C):
            r = lp * C + c
            lo = lo_ref[r, :][None, :]
            sg = seg_ref[r, :][None, :]
            w = w_ref[r, :][None, :]
            G = jnp.take_along_axis(
                T, jnp.broadcast_to(lo, (R, LANES)), axis=1)
            M = jnp.broadcast_to(sg, (R, LANES)) == siota
            V = _seg_reduce(jnp.where(M, G, 0.0), F, SEG)
            Ms.append(M)
            Vs.append(V)
            acc = acc + w * V
            wn = wn + w
        W = jnp.maximum(wn, 1e-9)
        out = acc / W
        g = g_ref[lp * FP:lp * FP + F, :]
        inv_w = 1.0 / W

        gt_loc = jnp.zeros((R, LANES), jnp.float32)
        gx_lp = [jnp.zeros((1, LANES), jnp.float32) for _ in range(D)]
        for c in range(C):
            r = lp * C + c
            lo = lo_ref[r, :][None, :]
            w = w_ref[r, :][None, :]
            gV = g * (w * inv_w)                       # [F, 128]
            gVr = jnp.broadcast_to(gV[None], (SEG, F, LANES)
                                   ).reshape(SEG * F, LANES)  # rows s*F+f
            B = jnp.where(Ms[c], gVr, 0.0)             # [R, 128q]
            OH = (laneiota == jnp.broadcast_to(lo, (LANES, LANES))
                  ).astype(jnp.float32)                # [128l, 128q]
            gt_loc = gt_loc + jax.lax.dot_general(
                B, OH, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # [R, 128l]
            r_c = jnp.sum(g * (Vs[c] - out), axis=0,
                          keepdims=True) * inv_w       # [1, 128]
            for d in range(D):
                gx_lp[d] = gx_lp[d] + r_c * dw_refs[d][r, :][None, :]
        gt_ref[lp * R:(lp + 1) * R, :] += gt_loc
        gx_rows.extend(gx_lp)

    pad = RB - len(gx_rows)
    gx = jnp.concatenate(
        gx_rows + [jnp.zeros((pad, LANES), jnp.float32)] * (1 if pad else 0),
        axis=0)
    gx_ref[:, :] = gx


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp
# ---------------------------------------------------------------------------

def _interpret() -> bool:
    # compiled Mosaic path on real TPU (incl. the axon remote tunnel);
    # interpret on the CPU test mesh
    return jax.devices()[0].platform == "cpu"


def _fwd_call(spec: LaneGatherSpec, seg, lo, w, packed, np_pad: int):
    C, F, SEG, LPB = spec.n_corners, spec.n_features, spec.seg, spec.lpb
    nb, nq = spec.n_blocks, np_pad // LANES
    kern = functools.partial(_fwd_kernel, C=C, F=F, SEG=SEG, LPB=LPB)
    return pl.pallas_call(
        kern,
        grid=(nb, nq),
        in_specs=[
            pl.BlockSpec((RB, LANES), lambda lb, q: (lb, q)),
            pl.BlockSpec((RB, LANES), lambda lb, q: (lb, q)),
            pl.BlockSpec((RB, LANES), lambda lb, q: (lb, q)),
            pl.BlockSpec((LPB * F * SEG, LANES), lambda lb, q: (lb, 0)),
        ],
        out_specs=pl.BlockSpec((LPB * FP, LANES), lambda lb, q: (lb, q)),
        out_shape=jax.ShapeDtypeStruct((spec.n_inst * FP, np_pad),
                                       jnp.float32),
        interpret=_interpret(),
    )(seg, lo, w, packed)


def _bwd_call(spec: LaneGatherSpec, seg, lo, w, dws, g, packed,
              np_pad: int):
    C, F, SEG, LPB = spec.n_corners, spec.n_features, spec.seg, spec.lpb
    D = spec.d_local
    nb, nq = spec.n_blocks, np_pad // LANES
    kern = functools.partial(_bwd_kernel, C=C, F=F, SEG=SEG, LPB=LPB, D=D)
    row_spec = pl.BlockSpec((RB, LANES), lambda lb, q: (lb, q))
    gt, gx = pl.pallas_call(
        kern,
        grid=(nb, nq),
        in_specs=[row_spec, row_spec, row_spec]
        + [row_spec] * D
        + [pl.BlockSpec((LPB * FP, LANES), lambda lb, q: (lb, q)),
           pl.BlockSpec((LPB * F * SEG, LANES), lambda lb, q: (lb, 0))],
        out_specs=[
            pl.BlockSpec((LPB * F * SEG, LANES), lambda lb, q: (lb, 0)),
            pl.BlockSpec((RB, LANES), lambda lb, q: (lb, q)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((spec.rows_packed, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nb * RB, np_pad), jnp.float32),
        ],
        interpret=_interpret(),
    )(seg, lo, w, *dws, g, packed)
    return gt, gx


def _out_to_features(o, spec: LaneGatherSpec, n: int):
    """Kernel output [n_inst*FP, NP] -> [N, n_real*F] (pad dummies
    dropped)."""
    F = spec.n_features
    o = o.reshape(spec.n_inst, FP, -1)[:spec.n_real, :F, :n]  # [I, F, N]
    return jnp.transpose(o, (2, 0, 1)).reshape(n, spec.n_real * F)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lanegather_encode(packed: jnp.ndarray, x: jnp.ndarray,
                      spec: LaneGatherSpec) -> jnp.ndarray:
    """packed [rows_packed, 128] (see pack_tables), x [N, num_dim] in
    [0,1].  Returns [N, n_inst * F] level-instance features."""
    return _lg_fwd(packed, x, spec)[0]


def _lg_fwd(packed, x, spec: LaneGatherSpec):
    n = x.shape[0]
    np_pad = -(-n // LANES) * LANES
    seg, lo, w, _ = _prep(x, spec, np_pad)
    o = _fwd_call(spec, seg, lo, w, packed, np_pad)
    return _out_to_features(o, spec, n), (packed, x)


def _lg_bwd(spec: LaneGatherSpec, res, gout):
    packed, x = res
    n = x.shape[0]
    np_pad = -(-n // LANES) * LANES
    seg, lo, w, dws = _prep(x, spec, np_pad)
    F = spec.n_features
    g = jnp.zeros((spec.n_inst, FP, np_pad), jnp.float32)
    g = g.at[:spec.n_real, :F, :n].set(
        jnp.transpose(gout.reshape(n, spec.n_real, F), (1, 2, 0)))
    g = g.reshape(spec.n_inst * FP, np_pad)
    gt, gxp = _bwd_call(spec, seg, lo, w, dws, g, packed, np_pad)
    # gxp rows: block lb holds lpb instances x d_local dims
    D, LPB = spec.d_local, spec.lpb
    gxp = gxp.reshape(spec.n_blocks, RB, np_pad)[:, :LPB * D, :n]
    gxp = gxp.reshape(spec.n_inst, D, n)
    gx = jnp.zeros((n, x.shape[1]), x.dtype)
    for i in range(spec.n_real):
        for d in range(D):
            gx = gx.at[:, spec.dims[i][d]].add(gxp[i, d])
    return gt, gx


lanegather_encode.defvjp(_lg_fwd, _lg_bwd)


# ---------------------------------------------------------------------------
# Mix3d2d drop-in (matches ops/hashgrid.mix_grid_encode)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _mix_specs(mix: MixGridSpec):
    s3 = spec_from_hashgrid(mix.grid_3d)
    s2 = spec_2d_triple(mix.grid_2d)
    off3 = list(mix.grid_3d.level_offsets[:-1])
    r3, r2 = mix.grid_3d.total_rows, mix.grid_2d.total_rows
    off2 = [r3 + g * r2 + o for g in range(3)
            for o in mix.grid_2d.level_offsets[:-1]]
    # pad dummies alias the last real table (zero incoming grads)
    off3 += [off3[-1]] * (s3.n_inst - len(off3))
    off2 += [off2[-1]] * (s2.n_inst - len(off2))
    return s3, s2, tuple(off3), tuple(off2)


def mix_grid_encode_lanegather(params: jnp.ndarray, x: jnp.ndarray,
                               spec: MixGridSpec, binarize=None):
    """Drop-in for ops/hashgrid.mix_grid_encode on TPU."""
    if binarize is not None:
        params = binarize(params)
    s3, s2, off3, off2 = _mix_specs(spec)
    p3 = pack_tables(params, s3, off3)
    p2 = pack_tables(params, s2, off2)
    out3 = lanegather_encode(p3, x, s3)
    out2 = lanegather_encode(p2, x, s2)
    return jnp.concatenate([out3, out2], axis=-1)
