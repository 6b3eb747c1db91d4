import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def timeit(name, fn, *args, reps=8):
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic(); out = fn(*args); jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    print(f"{name}: {best*1e3:.3f} ms", flush=True)

R, N = 31744, 2064
table = jnp.asarray(np.random.default_rng(1).normal(size=(N,)).astype(np.float32))
idx_np = jnp.asarray(np.random.default_rng(0).integers(0, N, R).astype(np.int32))
idx_dev = (jax.lax.iota(jnp.int32, R) * 7919) % N
take = jax.jit(lambda t, i: jnp.take(t, i))
timeit("take idx from numpy", take, table, idx_np)
timeit("take idx device-made", take, table, idx_dev)
timeit("take small idx(8064)", jax.jit(lambda t, i: jnp.take(t, i)), table, idx_np[:8064])
# one-hot matmul gather alternative
def onehot_gather(t, i):
    oh = (i[:, None] == jax.lax.iota(jnp.int32, N)[None, :]).astype(jnp.float32)
    return oh @ t[:, None]
timeit("one-hot gather", jax.jit(onehot_gather), table, idx_np)
# take_along_axis formulation
timeit("mul-add on idx buffer", jax.jit(lambda i: i * 2 + 1), idx_np)
