import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
import jax.numpy as jnp
import numpy as np
from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import pixel_scene_coords
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

cfg = RenderConfig(width=240, height=135, reflections=True, refractions=True,
                   scene_backface_culling=True, weight_cutoff=1e-3, use_pallas=True,
                   max_nodes=48)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
px, py = np.meshgrid(np.arange(240), np.arange(135))
coords = pixel_scene_coords(cfg, px.reshape(-1), py.reshape(-1))
dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)
R = 32768
o = np.zeros((R,3), np.float32); o[:32400] = coords
d = np.tile(np.float32([0,0,1]), (R,1)); d[:32400] = dirs
o, d = jnp.asarray(o), jnp.asarray(d)

out = trace_rays(ds, cfg, o, d); jax.block_until_ready(out)
t0=time.monotonic(); out = trace_rays(ds, cfg, o, d); jax.block_until_ready(out)
print("frame:", (time.monotonic()-t0)*1e3, "ms", flush=True)

with jax.profiler.trace("/tmp/jaxprof"):
    out = trace_rays(ds, cfg, o, d)
    jax.block_until_ready(out)
print("profiled", flush=True)
