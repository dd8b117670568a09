"""Probe tpu.dynamic_gather (via take_along_axis, idx.shape == data.shape)
speed inside Pallas kernels, vs XLA row gathers.

Forms probed (all [S, 128] f32):
  A. S=8192 axis-0 gather      (the hash-level building block)
  B. S=16384 axis-0 gather     (2D-grid half-table chunk)
  C. S=8192 axis-0, bf16 table
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


def make_gather(S, dtype):
    def kernel(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, 128), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def bench(fn, t, i, S, iters=30):
    @functools.partial(jax.jit, static_argnums=3)
    def loop(t, i, one, n):
        def body(k, acc):
            out = fn(t, (i + k) % S)
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, 0.0)

    one = jnp.int32(1)
    np.asarray(loop(t, i, one, 1))
    t0 = time.perf_counter(); np.asarray(loop(t, i, one, 1)); t1 = time.perf_counter()
    np.asarray(loop(t, i, one, 1 + iters))
    t2 = time.perf_counter(); np.asarray(loop(t, i, one, 1 + iters)); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / iters


def probe(S, dtype, name):
    table = jnp.asarray(np.random.randn(S, 128), dtype)
    idx = jnp.asarray(np.random.randint(0, S, (S, 128)), jnp.int32)
    try:
        fn = make_gather(S, dtype)
        out = fn(table, idx)
        ref = jnp.take_along_axis(table, idx, axis=0)
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32))))
        dt = bench(fn, table, idx, S)
        looked = S * 128
        print(f"{name}: OK err={err:.2e}  {dt*1e6:.1f} us  "
              f"({looked/1e6:.2f}M lookups -> {looked/dt/1e9:.2f} G/s)")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__} {str(e)[:300]}")


if __name__ == "__main__":
    print(jax.devices())
    probe(8192, jnp.float32, "A S=8192 f32")
    probe(16384, jnp.float32, "B S=16384 f32")
    probe(8192, jnp.bfloat16, "C S=8192 bf16")
    # XLA row-gather baseline at the hash workload shape: 2.36M rows of 4
    t = jnp.asarray(np.random.randn(441568, 4), jnp.float32)
    i = jnp.asarray(np.random.randint(0, 441568, 2359296), jnp.int32)
    xla = lambda t, i: jnp.take(t, i, axis=0)
    dt = bench(xla, t, i, 441568, iters=10)
    print(f"XLA flat row take [2.36M x 4]: {dt*1e3:.2f} ms")
