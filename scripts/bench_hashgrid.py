"""Kernel-vs-XLA microbench for the hash-context encode (fwd and
fwd+bwd) at the entropy-step shape: N = 18432 queries (16k window +
slack), both grid_feature_dim 4 (bench config) and 8 (flagship)."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from gsvc_tpu.config import ModelConfig
from gsvc_tpu.ops.hashgrid import (
    init_mix_grid_params, make_mix_grid_spec, mix_grid_encode,
)
from gsvc_tpu.ops.pallas_hashgrid import mix_grid_encode_lanegather
from gsvc_tpu.ops.quant import ste_binary


def timed(loop_fn, iters=12):
    np.asarray(loop_fn(1))
    t0 = time.perf_counter(); np.asarray(loop_fn(1)); t1 = time.perf_counter()
    np.asarray(loop_fn(1 + iters))
    t2 = time.perf_counter(); np.asarray(loop_fn(1 + iters))
    t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / iters


def run(F, N=18432):
    mc = ModelConfig()
    spec = make_mix_grid_spec(F, mc.resolutions_list, mc.log2,
                              mc.resolutions_list_2D, mc.log2_2D)
    params = init_mix_grid_params(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))

    for name, fn in (("xla", mix_grid_encode),
                     ("lane", mix_grid_encode_lanegather)):
        enc = lambda p, xx: fn(p, xx, spec, binarize=ste_binary)

        @functools.partial(jax.jit, static_argnums=0)
        def fwd_loop(n, p=params, x0=x):
            def body(k, acc):
                out = enc(p, x0 + 1e-6 * k)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, n, body, 0.0)

        @functools.partial(jax.jit, static_argnums=0)
        def fb_loop(n, p=params, x0=x):
            def body(k, carry):
                def loss(pp, xx):
                    return jnp.sum(enc(pp, xx) ** 2)
                gp, gx = jax.grad(loss, argnums=(0, 1))(p, x0 + 1e-6 * k)
                return carry + jnp.sum(gp) + jnp.sum(gx)
            return jax.lax.fori_loop(0, n, body, 0.0)

        tf = timed(fwd_loop)
        tb = timed(fb_loop)
        print(f"F={F} {name}: fwd {tf*1e3:.2f} ms  fwd+bwd {tb*1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    print(jax.devices())
    for F in (int(a) for a in (sys.argv[1:] or ["4", "8"])):
        run(F)
