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
from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.pallas_kernels import pallas_cast_triangles
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.vecmath import normalized
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

def timeit(name, fn, *args, reps=8):
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic(); out = fn(*args); jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    print(f"{name}: {best*1e3:.3f} ms", flush=True)

cfg = RenderConfig(width=240, height=135, scene_backface_culling=True)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)

# (a) touch all scene arrays
timeit("sum all ds leaves", jax.jit(lambda d_: sum(jnp.sum(l) for l in jax.tree.leaves(d_))), ds)

o256 = jnp.zeros((256,3)); d256 = jnp.tile(jnp.asarray([[0.,0.,1.]]), (256,1))
timeit("pallas cast R=256", jax.jit(lambda o,d: pallas_cast_triangles(
    ds.tri_woop, ds.tri_nsq, ds.tri_valid_f, ds.tri_httr_f, ds.tri_normal3, ds.tri_aabb, o, d)), o256, d256)

# (c) tiny scene
s2 = Scene()
from hslu_i.ba_raytracing.f2501_raytracer_tpu import SphereData, TriangleData
s2.add_triangle(TriangleData.new((0,0,3),(1,0,3),(0,1,3),(1,0,0)))
ds2 = build_device_scene(s2, cfg)
timeit("pallas cast R=256 T=128", jax.jit(lambda o,d: pallas_cast_triangles(
    ds2.tri_woop, ds2.tri_nsq, ds2.tri_valid_f, ds2.tri_httr_f, ds2.tri_normal3, ds2.tri_aabb, o, d)), o256, d256)

# (d) pure pallas minimal kernel with a fori loop of 16 iterations over VMEM
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def mini_kernel(x_ref, o_ref):
    def body(b, c):
        o_ref[:] += x_ref[b]
        return c
    o_ref[:] = jnp.zeros_like(o_ref)
    jax.lax.fori_loop(0, 16, body, 0)
x = jnp.ones((16, 256, 512))
mini = jax.jit(lambda x_: pl.pallas_call(mini_kernel,
    grid=(126,),
    in_specs=[pl.BlockSpec((16, 256, 512), lambda i: (0,0,0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((256, 512), lambda i: (0,0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((256, 512), jnp.float32))(x_))
timeit("mini pallas grid126 fori16", mini, x)
