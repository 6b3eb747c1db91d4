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

R = 31744
idx = jnp.asarray(np.random.default_rng(0).integers(0, 2064, R).astype(np.int32))
table = jnp.asarray(np.random.default_rng(1).normal(size=(2064,)).astype(np.float32))

# closure constant vs arg
timeit("take closure-const table", jax.jit(lambda i: jnp.take(table, i)), idx)
timeit("take arg table", jax.jit(lambda t, i: jnp.take(t, i)), table, idx)
# small closure constant
small = jnp.ones((8,))
timeit("add closure-const small", jax.jit(lambda x: x + small[0]), idx.astype(jnp.float32))
# elementwise with arg only
timeit("pure elementwise args", jax.jit(lambda t, i: (t[:R//2048*64].sum() + i.astype(jnp.float32)).sum()), table, idx)
