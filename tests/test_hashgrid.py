"""Hash-grid encoder vs a straightforward NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from gsvc_tpu.ops.hashgrid import (
    make_grid_spec, make_mix_grid_spec, init_grid_params,
    init_mix_grid_params, hashgrid_encode, mix_grid_encode,
)
from gsvc_tpu.ops import ste_binary

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint64)


def numpy_grid_encode(params, x, spec):
    """Direct NumPy port of the CUDA kernel semantics (oracle)."""
    params = np.asarray(params)
    x = np.asarray(x)
    n = x.shape[0]
    d = spec.num_dim
    outs = []
    for lvl in range(spec.n_levels):
        res = spec.resolutions[lvl]
        size = spec.level_sizes[lvl]
        lo = spec.level_offsets[lvl]
        emb = params[lo:lo + size]
        out = np.zeros((n, spec.n_features), np.float32)
        for i in range(n):
            pos = x[i] * (res - 2) + 0.5
            pg = np.floor(pos).astype(np.int64)
            frac = pos - pg
            acc = np.zeros(spec.n_features, np.float32)
            wn = 0.0
            for corner in range(1 << d):
                w = 1.0
                coords = np.zeros(d, np.int64)
                for dd in range(d):
                    if (corner >> dd) & 1:
                        w *= frac[dd]
                        coords[dd] = min(pg[dd] + 1, res - 1)
                    else:
                        w *= 1 - frac[dd]
                        coords[dd] = pg[dd]
                if np.any(coords == 0) or np.any(coords == res - 1):
                    continue
                if res ** d > size:
                    h = np.uint64(0)
                    for dd in range(d):
                        h ^= np.uint64(coords[dd]) * _PRIMES[dd]
                    idx = int(h % np.uint64(2 ** 32) % np.uint64(size))
                else:
                    idx = 0
                    stride = 1
                    for dd in range(d):
                        idx += coords[dd] * stride
                        stride *= res
                    idx = idx % size
                acc += w * emb[idx]
                wn += w
            out[i] = acc / max(wn, 1e-9)
        outs.append(out)
    return np.concatenate(outs, axis=-1)


def test_matches_numpy_oracle_3d():
    spec = make_grid_spec(3, 2, (6, 10, 33), log2_hashmap_size=8)
    key = jax.random.PRNGKey(0)
    params = init_grid_params(key, spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    got = np.asarray(hashgrid_encode(params, x, spec))
    want = numpy_grid_encode(params, x, spec)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_matches_numpy_oracle_2d_hashed():
    # resolution 130 with log2=8 forces the hash path
    spec = make_grid_spec(2, 4, (16, 130), log2_hashmap_size=8)
    params = init_grid_params(jax.random.PRNGKey(2), spec)
    x = jax.random.uniform(jax.random.PRNGKey(3), (48, 2))
    got = np.asarray(hashgrid_encode(params, x, spec))
    want = numpy_grid_encode(params, x, spec)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_gradients_flow_to_params_and_inputs():
    spec = make_grid_spec(3, 2, (6, 18), log2_hashmap_size=6)
    params = init_grid_params(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=0.2,
                           maxval=0.8)

    def loss(p, xx):
        return jnp.sum(hashgrid_encode(p, xx, spec) ** 2)

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    assert float(jnp.sum(jnp.abs(gp))) > 0
    assert float(jnp.sum(jnp.abs(gx))) > 0

    # finite differences on a few embedding entries
    eps = 1e-3
    flat_idx = np.argsort(-np.abs(np.asarray(gp)).ravel())[:3]
    for fi in flat_idx:
        r, c = np.unravel_index(fi, gp.shape)
        pp = params.at[r, c].add(eps)
        pm = params.at[r, c].add(-eps)
        fd = (loss(pp, x) - loss(pm, x)) / (2 * eps)
        np.testing.assert_allclose(float(fd), float(gp[r, c]), rtol=2e-2)


def test_mix_grid_output_dim_and_binarize():
    spec = make_mix_grid_spec(
        n_features=4,
        resolutions_list=(18, 24, 33, 44, 59, 80, 108, 148, 201, 275, 376, 514),
        log2_hashmap_size=13,
        resolutions_list_2d=(130, 258, 514, 1026),
        log2_hashmap_size_2d=15)
    # reference layout: output = (12 + 4 + 4 + 4) levels * 4 features = 96
    assert spec.output_dim == (12 + 3 * 4) * 4
    params = init_mix_grid_params(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
    out = mix_grid_encode(params, x, spec, binarize=ste_binary)
    assert out.shape == (8, spec.output_dim)
    assert bool(jnp.all(jnp.isfinite(out)))
    # binarized embeddings -> outputs are convex-ish combos in [-1, 1]
    assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-5
