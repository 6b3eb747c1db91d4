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

def timeit(name, fn, *args, reps=8, **kw):
    out = fn(*args, **kw); jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic(); out = fn(*args, **kw); jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    print(f"{name}: {best*1e3:.3f} ms", flush=True)
    return out

cfg = RenderConfig(width=240, height=135, scene_backface_culling=True)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
px, py = np.meshgrid(np.arange(240), np.arange(135))
coords = pixel_scene_coords(cfg, px.reshape(-1), py.reshape(-1))
dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)
R = 31744  # multiple of 1024 and 256
o = jnp.asarray(coords[:R]); d = normalized(jnp.asarray(dirs[:R]))

args = (ds.tri_woop, ds.tri_nsq, ds.tri_valid_f, ds.tri_httr_f, ds.tri_normal3, ds.tri_aabb, o, d)
for aabb in (True, False):
    for rt in (256, 1024):
        h = timeit(f"cast aabb={aabb} rt={rt}", pallas_cast_triangles, *args,
                   use_aabb=aabb, ray_tile=rt)
print("hits:", int(jnp.isfinite(h[0]).sum()), flush=True)
