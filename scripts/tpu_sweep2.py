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
import dataclasses
from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import pixel_scene_coords
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W0, H0 = 1920, 1080
base = RenderConfig(width=W0, height=H0, reflections=True, refractions=True,
                    scene_backface_culling=True, weight_cutoff=1e-3, use_pallas=True,
                    max_nodes=48, loop_chunk=128, compaction_ratio=64, tile_rays=131072)
scene0 = build("semesterbild", base)
scene0 = Scene.backface_culling(scene0, np.array([0.0, 0.0, 1.0]))
px, py = np.meshgrid(np.arange(W0), np.arange(H0))
coords = pixel_scene_coords(base, px.reshape(-1), py.reshape(-1))
dirs = (coords - np.asarray(base.camera.render_ray_focus, np.float32)).astype(np.float32)
R = 131072
sl = slice(4*R, 5*R)
o, d = jnp.asarray(coords[sl]), jnp.asarray(dirs[sl])

for tb in (512, 256, 128):
    cfg = dataclasses.replace(base, triangle_block=tb)
    ds = build_device_scene(scene0, cfg)
    out = trace_rays(ds, cfg, o, d); jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0=time.monotonic(); out = trace_rays(ds, cfg, o, d); jax.block_until_ready(out)
        best = min(best, time.monotonic()-t0)
    print(f"tile(131k) tri_block={tb}: {best*1e3:.1f} ms", flush=True)
