"""Back-to-back 1080p realistic bench across pool/tile knobs in ONE relay
session (cross-session variance is 3-4x; within-session comparisons are
stable). Prints ms/frame per variant."""
import os, sys, time

import numpy as np

VARIANTS = [
    # dict of RenderConfig overrides
    dict(tile_rays=262144, compaction_ratio=64, triangle_block=64),
    dict(tile_rays=262144, compaction_ratio=64, triangle_block=64,
         loop_chunk=64),
    dict(tile_rays=262144, compaction_ratio=64, triangle_block=64,
         loop_chunk=48),
]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import (
    pixel_scene_coords,
    tile_major_order,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays_tiled
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W0, H0 = (int(v) for v in __import__('os').environ.get('SWEEP_RES', '1920x1080').split('x'))
n_pix = W0 * H0
px, py = np.meshgrid(np.arange(W0), np.arange(H0))
order = tile_major_order(W0, H0)
px, py = px.reshape(-1)[order], py.reshape(-1)[order]

for over in VARIANTS:
    cfg = RenderConfig(
        width=W0, height=H0, reflections=True, refractions=True,
        light_reflections=True, scene_backface_culling=True,
        max_nodes=48, weight_cutoff=1e-3, loop_chunk=128, **over,
    )
    tile = cfg.tile_rays
    scene = build("semesterbild", cfg)
    scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
    ds = build_device_scene(scene, cfg)
    coords = pixel_scene_coords(cfg, px, py)
    dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(
        np.float32
    )
    n_tiles = (n_pix + tile - 1) // tile
    pad = n_tiles * tile - n_pix
    if pad:
        coords = np.concatenate([coords, np.zeros((pad, 3), np.float32)])
        dirs = np.concatenate([dirs, np.tile(np.float32([0, 0, 1]), (pad, 1))])
    o_t = jnp.asarray(coords.reshape(n_tiles, tile, 3))
    d_t = jnp.asarray(dirs.reshape(n_tiles, tile, 3))

    def frame():
        outs = trace_rays_tiled(ds, cfg, o_t, d_t)
        jax.block_until_ready(outs)
        np.asarray(outs[0])[0, 0]
        return outs

    t0 = time.monotonic()
    out = frame()
    comp = time.monotonic() - t0
    ts = []
    for _ in range(4):
        t0 = time.monotonic()
        frame()
        ts.append((time.monotonic() - t0) * 1e3)
    chk = float(np.asarray(out[0]).sum())
    print(
        f"{str(over):70s}: {min(ts):8.1f} ms "
        f"(all {[f'{t:.0f}' for t in ts]}) compile {comp:.0f}s checksum {chk:.1f}",
        flush=True,
    )
