"""All five BASELINE configs at 240x135 in ONE relay session (round-2
kernels). Prints ms/frame per config."""
import os, sys, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import (
    antialiasing_offsets,
    pixel_scene_coords,
    tile_major_order,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays_tiled
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

CONFIGS = {
    "default": dict(),
    "anti_aliasing": dict(
        anti_aliasing_rotation_scale=True, anti_aliasing_randomness=True
    ),
    "soft_shadows": dict(soft_shadows=True),
    "realistic": dict(reflections=True, light_reflections=True, refractions=True),
    "extreme": dict(
        reflections=True, light_reflections=True, refractions=True,
        extreme_quality=True, high_quality_model=True,
    ),
}

W0, H0 = 240, 135
for name, feats in CONFIGS.items():
    cfg = RenderConfig(
        width=W0, height=H0, scene_backface_culling=True,
        tile_rays=262144, max_nodes=48, weight_cutoff=1e-3,
        compaction_ratio=64, loop_chunk=128, **feats,
    )
    scene = build("semesterbild", cfg)
    scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
    ds = build_device_scene(scene, cfg)
    n_pix = W0 * H0
    px, py = np.meshgrid(np.arange(W0), np.arange(H0))
    order = tile_major_order(W0, H0)
    px, py = px.reshape(-1)[order], py.reshape(-1)[order]
    coords = pixel_scene_coords(cfg, px, py)
    dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(
        np.float32
    )
    aa = cfg.total_aa_rays if cfg.anti_aliasing else 1
    if cfg.anti_aliasing:
        offs = antialiasing_offsets(cfg, cfg.aa_packet_lanes)
        coords = (coords[:, None, :] + offs[None, :, :]).reshape(-1, 3)
        dirs = np.broadcast_to(dirs[:, None, :], (n_pix, aa, 3)).reshape(-1, 3)
        coords = np.ascontiguousarray(coords, np.float32)
        dirs = np.ascontiguousarray(dirs, np.float32)
    n_rays = n_pix * aa
    tile = min(cfg.tile_rays, max(1024, (n_rays + 1023) // 1024 * 1024))
    n_tiles = (n_rays + tile - 1) // tile
    pad = n_tiles * tile - n_rays
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
    frame()
    comp = time.monotonic() - t0
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        frame()
        ts.append((time.monotonic() - t0) * 1e3)
    print(
        f"{name:14s}: {min(ts):9.1f} ms (all {[f'{t:.0f}' for t in ts]}) "
        f"aa={aa} lights={int(ds.light_pos.shape[0])} "
        f"tris={ds.n_triangles} compile {comp:.0f}s",
        flush=True,
    )
