"""Time the axis-1 (lane) dynamic_gather and a composed one-level
hash-table lookup block:

  primitive:  out[i,j] = data[i, idx[i,j]]     (vshuffle within 128 lanes)
  composed :  T [64*F, 128]  (level table, segment-major rows)
              seg/lo [B, 128] (query block indices)
              out [B*?, ...] per-feature gathered values

Decides whether the two-level lane-shuffle hash gather kernel is viable.
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


def bench_jit(loop, iters=30):
    np.asarray(loop(1))
    t0 = time.perf_counter(); np.asarray(loop(1)); t1 = time.perf_counter()
    np.asarray(loop(1 + iters))
    t2 = time.perf_counter(); np.asarray(loop(1 + iters)); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / iters


def probe_primitive(R):
    def kernel(d_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(d_ref[:], i_ref[:], axis=1)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    data = jnp.asarray(np.random.randn(R, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 128, (R, 128)), jnp.int32)
    try:
        out = fn(data, idx)
        ref = jnp.take_along_axis(data, idx, axis=1)
        assert float(jnp.max(jnp.abs(out - ref))) == 0.0

        @functools.partial(jax.jit, static_argnums=0)
        def loop(n):
            def body(k, acc):
                out = fn(data, (idx + k) % 128)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, n, body, 0.0)

        dt = bench_jit(loop)
        print(f"lane-gather [{R},128]: {dt*1e6:.1f} us "
              f"({R*128/dt/1e9:.2f} G lookups/s)")
    except Exception as e:
        print(f"lane-gather [{R},128]: FAIL {str(e).splitlines()[0][:140]}")


def probe_level_block(NB=128, SEG=64, F=4):
    """One 3D hash level: table [SEG*F, 128]; NB blocks of 128 queries.

    Per block b: out[f, q] = T[seg[b,q]*F + f, lo[b,q]]
    via lane-gather of the whole [SEG*F, 128] by lo (broadcast rows),
    then masked segment reduction.
    """
    def kernel(t_ref, seg_ref, lo_ref, o_ref):
        b = pl.program_id(0)
        T = t_ref[:]                          # [SEG*F, 128]
        lo = lo_ref[0]                        # [1, 128] block -> [128]
        seg = seg_ref[0]                      # [128]
        G = jnp.take_along_axis(
            T, jnp.broadcast_to(lo[None, :], (SEG * F, 128)), axis=1)
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (SEG * F, 128), 0) // F
        M = (s_iota == jnp.broadcast_to(seg[None, :], (SEG * F, 128)))
        A = jnp.where(M, G, 0.0).reshape(F, SEG, 128).sum(axis=1)
        o_ref[:] = A                          # [F, 128]

    fn = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((SEG * F, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, 128), lambda b: (b * F, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB * F, 128), jnp.float32),
    )
    # NOTE: table rows are (seg, f) interleaved: row seg*F + f
    Tnp = np.random.randn(SEG * F, 128).astype(np.float32)
    seg = np.random.randint(0, SEG, (NB, 128)).astype(np.int32)
    lo = np.random.randint(0, 128, (NB, 128)).astype(np.int32)
    T, segj, loj = map(jnp.asarray, (Tnp, seg, lo))
    try:
        out = np.asarray(fn(T, segj, loj))
        # oracle
        ref = np.empty((NB * F, 128), np.float32)
        for b in range(4):   # spot-check a few blocks
            for f in range(F):
                ref_row = Tnp[seg[b] * F + f, lo[b]]
                err = np.max(np.abs(out[b * F + f] - ref_row))
                assert err == 0.0, (b, f, err)
        print("level-block correctness OK")

        @functools.partial(jax.jit, static_argnums=0)
        def loop(n):
            def body(k, acc):
                out = fn(T, (segj + k) % SEG, (loj + k) % 128)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, n, body, 0.0)

        dt = bench_jit(loop, iters=20)
        nlook = NB * 128 * F
        print(f"level-block [{NB}x128 q, SEG={SEG}, F={F}]: {dt*1e6:.1f} us"
              f" ({nlook/1e6:.2f}M feat-lookups -> {nlook/dt/1e9:.2f} G/s)")
    except Exception as e:
        print(f"level-block: FAIL {str(e).splitlines()[0][:200]}")


if __name__ == "__main__":
    print(jax.devices())
    probe_primitive(8)
    probe_primitive(256)
    probe_primitive(1024)
    probe_level_block()
