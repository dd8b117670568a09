"""Find the supported shape envelope of tpu.dynamic_gather on v5e."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def try_shape(S, L, axis, dtype=jnp.float32):
    def kernel(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=axis)

    table = jnp.asarray(np.random.randn(S, L), dtype)
    hi = S if axis == 0 else L
    idx = jnp.asarray(np.random.randint(0, hi, (S, L)), jnp.int32)
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, L), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = fn(table, idx)
        ref = jnp.take_along_axis(table, idx, axis=axis)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"S={S} L={L} axis={axis} {dtype.__name__}: OK err={err:.1e}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"S={S} L={L} axis={axis} {dtype.__name__}: FAIL {msg}")
        return False


if __name__ == "__main__":
    print(jax.devices())
    for S in (8, 32, 128, 512, 2048):
        if not try_shape(S, 128, 0):
            break
    try_shape(8, 128, 1)
    try_shape(32, 128, 1)
    try_shape(256, 128, 1)
