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
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops import trace as T
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops import shading as SH
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

def timeit(name, fn, *args, reps=3):
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic(); out = fn(*args); jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)

W0, H0 = 240, 135
cfg = RenderConfig(width=W0, height=H0, reflections=True, refractions=True,
                   scene_backface_culling=True, weight_cutoff=1e-3, use_pallas=True)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
px, py = np.meshgrid(np.arange(W0), np.arange(H0))
coords = pixel_scene_coords(cfg, px.reshape(-1), py.reshape(-1))
dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)
R = 32768
o = np.zeros((R,3), np.float32); o[:32400] = coords
d = np.tile(np.float32([0,0,1]), (R,1)); d[:32400] = dirs
o, d = jnp.asarray(o), jnp.asarray(d)

timeit("trace FULL", lambda o_,d_: T.trace_rays.__wrapped__(ds, cfg, o_, d_), o, d)

orig = SH.calculate_lighting
def no_shadow_lighting(scene, cfg_, hit, view_dir, eps):
    # keep the per-light math but skip occlusion kernels
    import hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect as I
    saved = I.occlude_rays
    return orig(scene, cfg_, hit, view_dir, eps)
# variant 1: lighting -> ambient only
T.calculate_lighting = lambda scene, cfg_, hit, vd, eps: (
    jnp.where(hit.valid[:, None], hit.color, 0.0) * jnp.float32(0.08),
    jnp.zeros_like(hit.color),
)
timeit("trace NO-LIGHTLOOP", lambda o_,d_: T.trace_rays.__wrapped__(ds, cfg, o_, d_), o, d)
T.calculate_lighting = orig

# variant 2: occlusion -> constant unoccluded
import hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.shading as SH2
saved_occl = SH2.occlude_rays
SH2.occlude_rays = lambda scene, o_, d_, md, *a, **k: (
    jnp.zeros(o_.shape[0], bool), jnp.ones(o_.shape[0]), jnp.ones((o_.shape[0],3)))
timeit("trace NO-OCCLUDE", lambda o_,d_: T.trace_rays.__wrapped__(ds, cfg, o_, d_), o, d)
SH2.occlude_rays = saved_occl
