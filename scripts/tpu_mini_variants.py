import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(name, fn, *args, reps=8):
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic(); out = fn(*args); jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    print(f"{name}: {best*1e3:.3f} ms", flush=True)

def make(grid, in_shape, block_shape, fori_n, index_map=None):
    index_map = index_map or (lambda i: tuple(0 for _ in block_shape))
    def kern(x_ref, o_ref):
        def body(b, c):
            o_ref[:] += x_ref[0] if len(block_shape) == 3 else x_ref[:block_shape[0]//2]
            return c
        o_ref[:] = jnp.zeros_like(o_ref)
        jax.lax.fori_loop(0, fori_n, body, 0)
    x = jnp.ones(in_shape)
    return jax.jit(lambda x_: pl.pallas_call(kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec(block_shape, index_map, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256,512), lambda i: (0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256,512), jnp.float32))(x_)), x

# grid=1, big VMEM-resident input
f, x = make(1, (16,256,512), (16,256,512), 16)
timeit("grid1 8MB const-block fori16", f, x)
# grid=126, big const block
f, x = make(126, (16,256,512), (16,256,512), 16)
timeit("grid126 8MB const-block fori16", f, x)
# grid=126, small const block
f, x = make(126, (1,256,512), (1,256,512), 16)
timeit("grid126 0.5MB const-block fori16", f, x)
# grid=126, fori 1
f, x = make(126, (16,256,512), (16,256,512), 1)
timeit("grid126 8MB const-block fori1", f, x)
