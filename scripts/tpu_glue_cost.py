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
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect import _sphere_nearest, _sphere_occlusion
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
px, py = np.meshgrid(np.arange(240), np.arange(135))
coords = pixel_scene_coords(cfg, px.reshape(-1), py.reshape(-1))
dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)
R = 31744
o = jnp.asarray(coords[:R]); d = normalized(jnp.asarray(dirs[:R]))
idx = jnp.asarray(np.random.default_rng(0).integers(0, ds.mat_color.shape[0], R).astype(np.int32))

timeit("sphere_nearest", jax.jit(lambda o_, d_: _sphere_nearest(ds, o_, d_, False)), o, d)
timeit("sphere_occlusion", jax.jit(lambda o_, d_: _sphere_occlusion(ds, o_, d_, jnp.full((R,),2.0), False)), o, d)
timeit("one take (N,) by (R,)", jax.jit(lambda i: jnp.take(ds.mat_metallic, i)), idx)
timeit("take (N,3) by (R,)", jax.jit(lambda i: jnp.take(ds.mat_color, i, axis=0)), idx)
def gather8(i):
    return (jnp.take(ds.mat_color, i, axis=0), jnp.take(ds.mat_metallic, i),
            jnp.take(ds.mat_shininess, i), jnp.take(ds.mat_ior, i),
            jnp.take(ds.mat_opacity, i), jnp.take(ds.mat_has_trans, i),
            jnp.take(ds.mat_boost, i), jnp.take(ds.obj_normal, i, axis=0),
            jnp.take(ds.sph_center, jnp.minimum(i, 15), axis=0))
timeit("gather x9", jax.jit(gather8), idx)
