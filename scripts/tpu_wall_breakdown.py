"""Where does the 1080p wall time go? Split each frame into
(dispatch+device) vs (full output fetch) vs (1-element fetch), in ONE
process (sessions vary 3-4x; only same-session comparisons are valid).

Usage: python scripts/tpu_wall_breakdown.py [WxH] [repeats]
"""

import os
import sys
import time

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
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import (
    pixel_scene_coords,
    tile_major_order,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays_tiled
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    width, height = (int(v) for v in wh.split("x"))
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    cfg = RenderConfig(
        width=width, height=height, scene_backface_culling=True,
        reflections=True, light_reflections=True, refractions=True,
        tile_rays=262144, max_nodes=48, weight_cutoff=1e-3,
        compaction_ratio=64, loop_chunk=128,
        triangle_block=64 if width * height >= 10**6 else 512,
    )
    scene = build("semesterbild", cfg)
    scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
    dscene = build_device_scene(scene, cfg)

    n_pix = width * height
    px, py = np.meshgrid(np.arange(width), np.arange(height))
    order = tile_major_order(width, height)
    px, py = px.reshape(-1)[order], py.reshape(-1)[order]
    coords = pixel_scene_coords(cfg, px, py)
    dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(
        np.float32
    )
    tile = cfg.tile_rays
    n_tiles = (n_pix + tile - 1) // tile
    pad = n_tiles * tile - n_pix
    if pad:
        coords = np.concatenate([coords, np.zeros((pad, 3), np.float32)])
        dirs = np.concatenate([dirs, np.tile(np.float32([0, 0, 1]), (pad, 1))])
    o_tiles = jnp.asarray(coords.reshape(n_tiles, tile, 3))
    d_tiles = jnp.asarray(dirs.reshape(n_tiles, tile, 3))

    t0 = time.monotonic()
    c, v = trace_rays_tiled(dscene, cfg, o_tiles, d_tiles)
    jax.block_until_ready((c, v))
    float(c[0, 0, 0])  # relay: only a value fetch proves completion
    print(f"compile+first: {time.monotonic() - t0:.1f}s", flush=True)

    nbytes = c.size * 4 + v.size
    for r in range(repeats):
        t0 = time.monotonic()
        c, v = trace_rays_tiled(dscene, cfg, o_tiles, d_tiles)
        jax.block_until_ready((c, v))
        t1 = time.monotonic()
        tiny = float(c[0, 0, 0])  # 4-byte dependent fetch
        t2 = time.monotonic()
        cn = np.asarray(c)  # full fetch (what bench.py + renderer do)
        vn = np.asarray(v)
        t3 = time.monotonic()
        print(
            f"repeat {r}: block={1e3*(t1-t0):.0f}ms tiny_fetch={1e3*(t2-t1):.0f}ms "
            f"full_fetch={1e3*(t3-t2):.0f}ms ({nbytes/1e6:.1f} MB -> "
            f"{nbytes/1e6/max(t3-t2,1e-9):.0f} MB/s) total={1e3*(t3-t0):.0f}ms",
            flush=True,
        )
        del cn, vn


if __name__ == "__main__":
    main()
