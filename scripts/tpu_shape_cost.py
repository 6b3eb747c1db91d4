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

f = jax.jit(lambda x: x * 2.0 + 1.0)
for shape in [(31744,), (8064,), (16128,), (31744, 1), (248, 128), (31744, 3)]:
    x = jnp.ones(shape)
    timeit(f"mul-add {shape}", f, x)
g1 = jax.jit(lambda x: jnp.sum(x, axis=-1))   # 2D in, 1D out
x2 = jnp.ones((31744, 3))
timeit("2D in -> 1D out (31744,)", g1, x2)
g2 = jax.jit(lambda x: jnp.sum(x, axis=-1, keepdims=True))
timeit("2D in -> 2D out (31744,1)", g2, x2)
