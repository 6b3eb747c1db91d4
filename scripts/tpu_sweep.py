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
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays_tiled
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W0, H0 = 1920, 1080
base = RenderConfig(width=W0, height=H0, reflections=True, refractions=True,
                    scene_backface_culling=True, weight_cutoff=1e-3, use_pallas=True,
                    max_nodes=48, loop_chunk=128)
scene0 = build("semesterbild", base)
scene0 = Scene.backface_culling(scene0, np.array([0.0, 0.0, 1.0]))

px, py = np.meshgrid(np.arange(W0), np.arange(H0))
coords = pixel_scene_coords(base, px.reshape(-1), py.reshape(-1))
dirs = (coords - np.asarray(base.camera.render_ray_focus, np.float32)).astype(np.float32)
n_pix = W0*H0

def frame_time(cfg, reps=2):
    ds = build_device_scene(scene0, cfg)
    tile = cfg.tile_rays
    n_tiles = (n_pix + tile - 1)//tile
    pad = n_tiles*tile - n_pix
    o = np.concatenate([coords, np.zeros((pad,3),np.float32)]).reshape(n_tiles, tile, 3)
    d = np.concatenate([dirs, np.tile(np.float32([0,0,1]),(pad,1))]).reshape(n_tiles, tile, 3)
    o, d = jnp.asarray(o), jnp.asarray(d)
    out = trace_rays_tiled(ds, cfg, o, d); jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0=time.monotonic(); out = trace_rays_tiled(ds, cfg, o, d); jax.block_until_ready(out)
        best = min(best, time.monotonic()-t0)
    return best*1e3

for tb, ratio, tile in [(512, 64, 131072), (128, 64, 131072), (128, 32, 131072), (128, 128, 131072)]:
    cfg = dataclasses.replace(base, triangle_block=tb, compaction_ratio=ratio, tile_rays=tile)
    ms = frame_time(cfg)
    print(f"tri_block={tb} ratio={ratio} tile={tile}: {ms:.0f} ms", flush=True)
