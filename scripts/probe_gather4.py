"""Marginal cost of the in-kernel lane dynamic_gather: loop K gathers
inside ONE kernel, difference K=small vs K=large, so pallas launch and
tunnel overheads cancel.  Also measures the masked segment-reduce and
the one-hot MXU scatter matmul at kernel-realistic shapes.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

R = 2048   # rows per gather (2D-grid worst case: F=8, SEG=256)


def make_k(K, body_kind):
    def kernel(d_ref, i_ref, o_ref):
        D = d_ref[:]
        base = i_ref[:]

        def body(k, acc):
            idx = (base + k) & 127
            if body_kind == "gather":
                G = jnp.take_along_axis(D, idx, axis=1)
                return acc + G
            elif body_kind == "maskred":
                G = jnp.take_along_axis(D, idx, axis=1)
                s_iota = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) % 256
                M = s_iota == (base[0:1] & 255)
                A = jnp.where(M, G, 0.0)
                return acc + A
            else:  # matmul: one-hot scatter shape [R,128]@[128,128]
                oh = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
                      == (base[:128] & 127)).astype(jnp.bfloat16)
                P = jax.lax.dot_general(
                    D.astype(jnp.bfloat16), oh,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc + P

        acc = jax.lax.fori_loop(0, K, body, jnp.zeros((R, 128), jnp.float32))
        o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def time_call(fn, d, i, reps=8):
    np.asarray(fn(d, i))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(d, i))
        ts.append(time.perf_counter() - t0)
    return min(ts)


if __name__ == "__main__":
    print(jax.devices())
    d = jnp.asarray(np.random.randn(R, 128), jnp.float32)
    i = jnp.asarray(np.random.randint(0, 128, (R, 128)), jnp.int32)
    for kind in ("gather", "maskred", "matmul"):
        t_small = time_call(make_k(8, kind), d, i)
        t_big = time_call(make_k(108, kind), d, i)
        per = (t_big - t_small) / 100
        print(f"{kind}: {per*1e6:.2f} us per op on [{R},128] "
              f"({R*128/per/1e9:.1f} G elem/s)")
