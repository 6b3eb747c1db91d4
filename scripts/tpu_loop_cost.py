import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

def timeit(name, fn, *args, reps=8):
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic(); out = fn(*args); jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    print(f"{name}: {best*1e3:.3f} ms", flush=True)

x = jnp.ones((256, 512))

@jax.jit
def with_fori(x):
    return jax.lax.fori_loop(0, 48, lambda i, c: c * 1.0001 + 0.001, x)

@jax.jit
def with_while(x):
    def cond(s):
        i, c = s
        return (i < 48) & (jnp.sum(c[0, :8]) > -1e9)  # data-dependent
    def body(s):
        i, c = s
        return i + 1, c * 1.0001 + 0.001
    return jax.lax.while_loop(cond, body, (0, x))[1]

@jax.jit
def no_loop(x):
    c = x
    for _ in range(48):
        c = c * 1.0001 + 0.001
    return c

timeit("no loop 48 unrolled", no_loop, x)
timeit("fori 48", with_fori, x)
timeit("while 48 (data-dep cond)", with_while, x)

# nested: while containing a pallas call per iteration
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def pk(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 1.0001 + 0.001
def pcall(c):
    return pl.pallas_call(pk,
        in_specs=[pl.BlockSpec((256,512), lambda: (0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256,512), lambda: (0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256,512), jnp.float32))(c)

@jax.jit
def while_pallas(x):
    def cond(s):
        i, c = s
        return (i < 48) & (jnp.sum(c[0, :8]) > -1e9)
    def body(s):
        i, c = s
        return i + 1, pcall(c)
    return jax.lax.while_loop(cond, body, (0, x))[1]

timeit("while 48 x pallas body", while_pallas, x)
