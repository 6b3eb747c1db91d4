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
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect import cast_rays, occlude_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.vecmath import normalized
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

def timeit(name, fn, *args, reps=10, **kw):
    out = fn(*args, **kw); jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic(); out = fn(*args, **kw); jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    print(f"{name}: {best*1e3:.2f} ms", flush=True)
    return out

W, H = 240, 135
cfg = RenderConfig(width=W, height=H, reflections=True, refractions=True,
                   scene_backface_culling=True, tile_rays=32768, max_nodes=48, weight_cutoff=1e-3)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
print("tris:", ds.n_triangles, flush=True)
px, py = np.meshgrid(np.arange(W), np.arange(H))
coords = pixel_scene_coords(cfg, px.reshape(-1), py.reshape(-1))
dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)
R = 32256  # multiple of 256
o = jnp.asarray(coords[:R]); d = normalized(jnp.asarray(dirs[:R]))

hx = timeit("cast xla", cast_rays, ds, o, d, False, False)
hp = timeit("cast pallas", cast_rays, ds, o, d, False, True)
m = np.asarray(hx.valid)
print("cast match:", (np.asarray(hp.valid)==m).all(),
      np.allclose(np.asarray(hp.t)[m], np.asarray(hx.t)[m], rtol=1e-6),
      (np.asarray(hp.obj_idx)[m]==np.asarray(hx.obj_idx)[m]).mean(), flush=True)

md = jnp.full((R,), 2.0)
ox = timeit("occl xla", occlude_rays, ds, o, d, md, False, False)
opal = timeit("occl pallas", occlude_rays, ds, o, d, md, False, True)
print("occl match:", (np.asarray(opal[0])==np.asarray(ox[0])).all(),
      np.allclose(np.asarray(opal[1]), np.asarray(ox[1]), atol=1e-5),
      np.allclose(np.asarray(opal[2]), np.asarray(ox[2]), atol=1e-4), flush=True)

cfgp = RenderConfig(**{**cfg.__dict__, "use_pallas": True})
timeit("trace 32k xla", trace_rays, ds, cfg, o, jnp.asarray(dirs[:R]), reps=3)
timeit("trace 32k pallas", trace_rays, ds, cfgp, o, jnp.asarray(dirs[:R]), reps=3)
