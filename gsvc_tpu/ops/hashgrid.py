"""Multi-resolution hash-grid encoder, pure JAX.

Re-implements the semantics of the reference's vendored CUDA gridencoder
(submodules/gridencoder.zip -> gridencoder.cu), as driven from
utils/encodings.py:485-709 (GridEncoder) and scene/gaussian_model.py:81-147
(Mix3d2dEncoding).  Key semantics preserved:

  * position mapping ``pos = x * (res - 2) + 0.5`` — inputs in [0, 1] land
    strictly inside the border ring;
  * corner coords clamped to ``res - 1``; any corner touching the border
    (coord 0 or res-1) contributes ZERO and the remaining corner weights
    are renormalized (``wn`` logic, gridencoder.cu);
  * per level: direct (row-major) indexing when ``res**dim`` fits the level
    table, else the instant-NGP xor-prime hash
    (primes 1, 2654435761, 805459861);
  * per-level table sizes ``min(2**log2_hashmap_size, res**dim)`` rounded
    up to a multiple of 8, concatenated into one flat [rows, F] parameter
    table (GridEncoder.__init__, utils/encodings.py:647-666).

The ``binary_vxl`` occupancy masking and ``min_level_id`` partial-level
paths of the CUDA kernel are never used by the video pipeline and are not
reproduced.

Gradients: embeddings receive grads through the gathers (XLA turns the
transpose into scatter-add); inputs receive grads through the interpolation
weights, matching ``dy_dx`` in the reference.

On TPU the gathers are small (tables are 2^13/2^15 rows x 4 features and
fit VMEM); profiling showed XLA handles this well without a custom kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static layout of one grid encoder (one num_dim, L levels)."""

    num_dim: int
    n_features: int
    resolutions: Tuple[int, ...]
    level_sizes: Tuple[int, ...]     # rows per level
    level_offsets: Tuple[int, ...]   # starting row per level (len L+1)

    @property
    def n_levels(self) -> int:
        return len(self.resolutions)

    @property
    def total_rows(self) -> int:
        return self.level_offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.n_features


def make_grid_spec(num_dim: int, n_features: int,
                   resolutions_list: Sequence[int],
                   log2_hashmap_size: int) -> HashGridSpec:
    max_params = 2 ** log2_hashmap_size
    sizes, offsets, off = [], [0], 0
    for res in resolutions_list:
        n = min(max_params, res ** num_dim)
        n = int(np.ceil(n / 8) * 8)
        sizes.append(n)
        off += n
        offsets.append(off)
    return HashGridSpec(num_dim=num_dim, n_features=n_features,
                        resolutions=tuple(int(r) for r in resolutions_list),
                        level_sizes=tuple(sizes),
                        level_offsets=tuple(offsets))


def init_grid_params(key, spec: HashGridSpec, std: float = 1e-4) -> jnp.ndarray:
    """U(-1e-4, 1e-4) init (GridEncoder.reset_parameters)."""
    return jax.random.uniform(key, (spec.total_rows, spec.n_features),
                              jnp.float32, -std, std)


def _level_indices(x, res: int, level_size: int, level_offset: int,
                   num_dim: int):
    """Corner (index, weight) pairs for one level.

    Returns (idx [N, C] int32 rows into the FLAT multi-level table,
    w [N, C] interpolation weights with border corners zeroed)."""
    pos = x * (res - 2) + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    pos_grid = pos_grid.astype(jnp.int32)

    use_hash = (res ** num_dim) > level_size
    n_corners = 1 << num_dim

    idxs, ws = [], []
    for corner in range(n_corners):
        w = jnp.ones((x.shape[0],), dtype=x.dtype)
        coords = []
        for d in range(num_dim):
            if (corner >> d) & 1:
                w = w * frac[:, d]
                coords.append(jnp.minimum(pos_grid[:, d] + 1, res - 1))
            else:
                w = w * (1.0 - frac[:, d])
                coords.append(pos_grid[:, d])
        coords = jnp.stack(coords, axis=-1)  # [N, D]
        # border cells are forced to zero contribution
        valid = jnp.all((coords > 0) & (coords < res - 1), axis=-1)

        if use_hash:
            h = jnp.zeros((x.shape[0],), dtype=jnp.uint32)
            for d in range(num_dim):
                h = h ^ (coords[:, d].astype(jnp.uint32) *
                         jnp.uint32(_PRIMES[d]))
            idx = (h % jnp.uint32(level_size)).astype(jnp.int32)
        else:
            stride = 1
            idx = jnp.zeros((x.shape[0],), dtype=jnp.int32)
            for d in range(num_dim):
                idx = idx + coords[:, d] * stride
                stride *= res
            idx = idx % level_size

        idxs.append(idx + level_offset)
        ws.append(jnp.where(valid, w, 0.0))
    return jnp.stack(idxs, axis=1), jnp.stack(ws, axis=1)


def hashgrid_encode(params: jnp.ndarray, x: jnp.ndarray,
                    spec: HashGridSpec, batched: bool = False) -> jnp.ndarray:
    """Encode positions through all levels.  x: [N, D] in [0,1].
    Returns [N, L * F].

    ``batched=True`` fuses all levels' corner lookups into ONE row gather
    of the flat table (L * 2^D rows per position); ``False`` (default)
    issues one gather per (level, corner) pair.  Measured on v5e at 16k
    positions the per-corner variant is ~40% faster end to end (42.7 vs
    58.8 ms fwd+bwd for the full mix grid): XLA lowers the many small
    sliced-table scatters better than one 2.4M-row scatter."""
    n = x.shape[0]
    c = 1 << spec.num_dim
    idx_all, w_all = [], []
    for lvl in range(spec.n_levels):
        idx, w = _level_indices(x, spec.resolutions[lvl],
                                spec.level_sizes[lvl],
                                spec.level_offsets[lvl], spec.num_dim)
        idx_all.append(idx)
        w_all.append(w)

    if batched:
        idx_cat = jnp.concatenate(idx_all, axis=1)     # [N, L*C]
        w_cat = jnp.concatenate(w_all, axis=1)         # [N, L*C]
        vals = jnp.take(params, idx_cat.reshape(-1), axis=0)
        vals = vals.reshape(n, spec.n_levels, c, spec.n_features)
        w_cat = w_cat.reshape(n, spec.n_levels, c)
        outs = jnp.sum(vals * w_cat[..., None], axis=2)   # [N, L, F]
        wn = jnp.sum(w_cat, axis=2, keepdims=True)        # [N, L, 1]
        outs = outs / jnp.maximum(wn, 1e-9)
        return outs.reshape(n, spec.n_levels * spec.n_features)

    outs = []
    for lvl in range(spec.n_levels):
        acc = jnp.zeros((n, spec.n_features), params.dtype)
        wn = jnp.zeros((n, 1), x.dtype)
        for corner in range(c):
            w = w_all[lvl][:, corner]
            vals = jnp.take(params, idx_all[lvl][:, corner], axis=0)
            acc = acc + w[:, None] * vals
            wn = wn + w[:, None]
        outs.append(acc / jnp.maximum(wn, 1e-9))
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# Mix3d2d: one 3D grid + three 2D grids over (xy, xz, yz)
# (reference: scene/gaussian_model.py:81-147)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MixGridSpec:
    grid_3d: HashGridSpec
    grid_2d: HashGridSpec   # shared layout for xy / xz / yz

    @property
    def output_dim(self) -> int:
        return self.grid_3d.output_dim + 3 * self.grid_2d.output_dim

    @property
    def total_rows(self) -> int:
        return self.grid_3d.total_rows + 3 * self.grid_2d.total_rows

    @property
    def n_features(self) -> int:
        return self.grid_3d.n_features

    def param_splits(self):
        """Row boundaries of (xyz, xy, xz, yz) inside the flat table —
        the order used for the hash bitstream
        (get_encoding_params, scene/gaussian_model.py:507-519)."""
        r3, r2 = self.grid_3d.total_rows, self.grid_2d.total_rows
        return [0, r3, r3 + r2, r3 + 2 * r2, r3 + 3 * r2]


def make_mix_grid_spec(n_features: int,
                       resolutions_list: Sequence[int],
                       log2_hashmap_size: int,
                       resolutions_list_2d: Sequence[int],
                       log2_hashmap_size_2d: int) -> MixGridSpec:
    return MixGridSpec(
        grid_3d=make_grid_spec(3, n_features, resolutions_list,
                               log2_hashmap_size),
        grid_2d=make_grid_spec(2, n_features, resolutions_list_2d,
                               log2_hashmap_size_2d),
    )


def init_mix_grid_params(key, spec: MixGridSpec, std: float = 1e-4):
    """One flat [rows, F] table holding xyz | xy | xz | yz blocks."""
    return jax.random.uniform(key, (spec.total_rows, spec.n_features),
                              jnp.float32, -std, std)


def mix_grid_encode(params: jnp.ndarray, x: jnp.ndarray,
                    spec: MixGridSpec, binarize=None) -> jnp.ndarray:
    """x: [N, 3] in [0,1].  Returns [N, output_dim].

    ``binarize``: optional fn applied to the parameter table before
    interpolation (STE binarization during training; identity after
    decode — GridEncoder.forward, utils/encodings.py:691-699).
    """
    if binarize is not None:
        params = binarize(params)
    s = spec.param_splits()
    p_xyz, p_xy, p_xz, p_yz = (params[s[0]:s[1]], params[s[1]:s[2]],
                               params[s[2]:s[3]], params[s[3]:s[4]])
    out = [
        hashgrid_encode(p_xyz, x, spec.grid_3d),
        hashgrid_encode(p_xy, x[:, (0, 1)], spec.grid_2d),
        hashgrid_encode(p_xz, x[:, (0, 2)], spec.grid_2d),
        hashgrid_encode(p_yz, x[:, (1, 2)], spec.grid_2d),
    ]
    return jnp.concatenate(out, axis=-1)
