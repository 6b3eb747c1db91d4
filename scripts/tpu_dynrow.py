import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
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

def mk(dynamic):
    def kern(lights_ref, x_ref, o_ref):
        acc = jnp.zeros_like(o_ref)
        if dynamic:
            def body(l, acc):
                row = lights_ref[l]  # dynamic (8,) read
                return acc + x_ref[:] * row[0] + row[1]
            acc = jax.lax.fori_loop(0, 8, body, acc)
        else:
            for l in range(8):
                row = lights_ref[l]
                acc = acc + x_ref[:] * row[0] + row[1]
        o_ref[:] = acc
    return jax.jit(lambda lt, x: pl.pallas_call(kern,
        grid=(128,),
        in_specs=[pl.BlockSpec((8, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((256, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128*256, 128), jnp.float32))(lt, x))

lt = jnp.ones((8, 8)); x = jnp.ones((128*256, 128))
timeit("static unrolled lights", mk(False), lt, x)
timeit("dynamic fori lights", mk(True), lt, x)
