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
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import pixel_scene_coords
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

W, H = 240, 135
cfg = RenderConfig(width=W, height=H, scene_backface_culling=True)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
px, py = np.meshgrid(np.arange(W), np.arange(H))
coords = pixel_scene_coords(cfg, px.reshape(-1), py.reshape(-1))
dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)
R = 32256
o = jnp.asarray(coords[:R]); d = normalized(jnp.asarray(dirs[:R]))

# trivial fn taking the whole ds pytree
timeit("trivial with ds arg", jax.jit(lambda ds_, x: x + ds_.tri_nsq[0,0]), ds, jnp.ones((8,128)))
# trivial fn taking many small args
leaves = jax.tree.leaves(ds)
timeit(f"trivial {len(leaves)} leaf args", jax.jit(lambda *ls: ls[0][0,0]+0), *leaves)

# cast with scene CLOSED OVER (constant-baked)
closed = jax.jit(lambda o_, d_: pallas_cast_triangles(
    ds.tri_woop, ds.tri_nsq, ds.tri_valid_f, ds.tri_httr_f, ds.tri_normal3, ds.tri_aabb, o_, d_))
timeit("pallas cast closed-over scene", closed, o, d)
# cast with args
timeit("pallas cast scene-as-args", jax.jit(lambda w,n,v,h,t3,a,o_,d_: pallas_cast_triangles(w,n,v,h,t3,a,o_,d_)),
       ds.tri_woop, ds.tri_nsq, ds.tri_valid_f, ds.tri_httr_f, ds.tri_normal3, ds.tri_aabb, o, d)
