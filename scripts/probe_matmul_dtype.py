"""MXU rate of the compositing kernels' matmul shapes per input dtype.

The per-chunk triangular transmittance cumsum is a [128,128]@[128,1024]
f32 matmul and the backward adds three more of that class.  The MXU is
bf16-native; this probe measures what Mosaic's f32 lowering actually
costs vs bf16 and the error-compensated bf16x2 split, at the exact
kernel shapes, by looping K matmuls inside ONE kernel and differencing
K (pallas launch + tunnel overheads cancel).
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

C, P = 128, 1024


def make_k(K, kind):
    def kernel(t_ref, l_ref, o_ref):
        tri = t_ref[:]
        l0 = l_ref[:]

        def body(k, acc):
            l = l0 + 1e-6 * k          # defeat loop-invariant hoisting
            if kind == "f32":
                m = jax.lax.dot_general(
                    tri, l, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif kind == "f32_highest":
                m = jax.lax.dot_general(
                    tri, l, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            elif kind == "bf16":
                m = jax.lax.dot_general(
                    tri.astype(jnp.bfloat16), l.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:  # bf16x2
                th = tri.astype(jnp.bfloat16)
                lh = l.astype(jnp.bfloat16)
                ll = (l - lh.astype(jnp.float32)).astype(jnp.bfloat16)
                m = (jax.lax.dot_general(
                        th, lh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                     + jax.lax.dot_general(
                        th, ll, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
            return acc + m

        o_ref[:] = jax.lax.fori_loop(
            0, K, body, jnp.zeros((C, P), jnp.float32))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, P), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )


def main():
    rng = np.random.default_rng(0)
    tri = (np.tril(np.ones((C, C), np.float32), -1))
    l = rng.uniform(-4.6, 0, (C, P)).astype(np.float32)
    tri_j = jnp.asarray(tri)
    l_j = jnp.asarray(l)

    out = {}
    for kind in ("f32", "f32_highest", "bf16", "bf16x2"):
        def t(K):
            f = make_k(K, kind)
            r = f(tri_j, l_j)
            float(np.asarray(r[0, 0]))
            t0 = time.perf_counter()
            r = f(tri_j, l_j)
            float(np.asarray(r[0, 0]))
            return time.perf_counter() - t0

        K = 4096
        us = (t(K) - t(64)) / (K - 64) * 1e6
        out[kind + "_us"] = round(us, 3)
        # accuracy vs f64 reference
        ref = tri.astype(np.float64) @ l.astype(np.float64)
        f = make_k(1, kind)
        got = np.asarray(f(tri_j, l_j))
        out[kind + "_maxerr"] = float(np.abs(got - ref).max())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
